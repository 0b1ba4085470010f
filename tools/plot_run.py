"""Render a TrajectoryLog npz into the reference's README evidence
figures (VERDICT r4 #7; reference docs/position_err.png,
docs/angle_err.png, qm_visualization.cpp:90-189):

  <out>_position_err.png — EE position error (mm) over the traverse,
      with base displacement on a stacked (shared-time) axis and the
      3.5 mm gate line;
  <out>_angle_err.png    — EE orientation error (deg), same layout,
      2.6 deg gate;
  <out>_track.png        — top-down base / EE / foothold track.

Usage: python tools/plot_run.py RUN.npz [--out docs/runs/NAME]
The npz comes from utils.viz.export_trajectory of an experiment's log
(accuracy_r05.py saves it for runs with a save= key).
"""
import os
import sys

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

BLUE = "#2f6fde"     # primary series
ORANGE = "#e07b39"   # secondary series
GRAY = "#6b7280"     # context / gate lines
INK = "#1f2430"

plt.rcParams.update({
    "figure.dpi": 130, "font.size": 9, "axes.edgecolor": GRAY,
    "axes.labelcolor": INK, "text.color": INK, "xtick.color": INK,
    "ytick.color": INK, "axes.grid": True, "grid.color": "#e5e7eb",
    "grid.linewidth": 0.6, "axes.axisbelow": True,
    "axes.spines.top": False, "axes.spines.right": False,
})


def load(path):
    d = dict(np.load(path))
    t = d["t"] - d["t"][0]
    return t, d


def _err_figure(t, err, disp, gate, ylabel, gate_label, out, title):
    fig, (ax, axd) = plt.subplots(
        2, 1, sharex=True, figsize=(6.4, 4.2),
        gridspec_kw={"height_ratios": [2.2, 1.0], "hspace": 0.12})
    ax.plot(t, err, color=BLUE, lw=1.4)
    ax.axhline(gate, color=GRAY, lw=1.0, ls="--")
    ax.text(t[-1], gate, f"  {gate_label}", color=GRAY, va="bottom",
            ha="right", fontsize=8)
    ax.set_ylabel(ylabel)
    ax.set_title(title, fontsize=10, loc="left")
    ax.set_ylim(0, max(gate * 1.4, float(np.nanmax(err)) * 1.08))
    axd.plot(t, disp, color=ORANGE, lw=1.4)
    axd.set_ylabel("base\ndisplacement [m]")
    axd.set_xlabel("time [s]")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    print("wrote", out)


def main():
    path = sys.argv[1]
    out = path[:-4] if path.endswith(".npz") else path
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    t, d = load(path)
    base = d["base_pose"]          # (T, 6)
    disp = np.abs(base[:, 0] - base[0, 0])
    pos_mm = 1e3 * d["ee_pos_err"]
    ori_deg = np.degrees(d["ee_ori_err"])
    _err_figure(t, pos_mm, disp, 3.5, "EE position error [mm]",
                "3.5 mm gate", f"{out}_position_err.png",
                "End-effector position error during base traverse")
    _err_figure(t, ori_deg, disp, 2.6, "EE orientation error [deg]",
                "2.6\N{DEGREE SIGN} gate", f"{out}_angle_err.png",
                "End-effector orientation error during base traverse")

    fig, ax = plt.subplots(figsize=(6.0, 4.0))
    feet = d["feet_pos"]           # (T, 4, 3)
    for f in range(4):
        ax.plot(feet[:, f, 0], feet[:, f, 1], color=GRAY, lw=0.7,
                alpha=0.6)
    ax.plot(base[:, 0], base[:, 1], color=BLUE, lw=1.6, label="base")
    ee = d["ee_pos"]
    ax.plot(ee[:, 0], ee[:, 1], color=ORANGE, lw=1.6, label="EE")
    ax.plot(ee[0, 0], ee[0, 1], "o", color=ORANGE, ms=5)
    ax.plot([], [], color=GRAY, lw=0.7, label="footholds")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title("Top-down track: base walks, EE holds", fontsize=10,
                 loc="left")
    ax.axis("equal")
    ax.legend(frameon=False, fontsize=8)
    fig.savefig(f"{out}_track.png", bbox_inches="tight")
    plt.close(fig)
    print("wrote", f"{out}_track.png")


if __name__ == "__main__":
    main()
