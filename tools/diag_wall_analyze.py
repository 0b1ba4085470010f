"""Analyze a saved traverse TrajectoryLog around the ~0.3 m fall.

Prints the per-cycle story near the failure: displacement, EE error,
base height/pitch/roll, MPC cost/alpha/defect, torque saturation
fraction, contact-force anomalies — to identify the wall mechanism
(round-5: the kinematic reach wall is at ~0.375 m with sub-mm error at
0.30, so the observed falls at ~0.29-0.31 m are dynamic).

Usage: python tools/diag_wall_analyze.py docs/runs/diag_wall.npz
"""
import sys

import numpy as np


def main():
    d = dict(np.load(sys.argv[1]))
    t = d["t"] - d["t"][0]
    base = d["base_pose"]                     # (T,6) pos + zyx
    disp = np.abs(base[:, 0] - base[0, 0])
    err = 1e3 * d["ee_pos_err"]
    ori = np.degrees(d["ee_ori_err"])
    tau = d["torques"]                        # (T,18)
    limits = np.asarray([44.4] * 12 + [30.5, 30.5, 30.5, 6.8, 6.8, 6.8])
    try:
        import json
        import os
        spec = json.load(open(os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "qm_control_tpu", "models", "aliengo_j2n6s300.json")))
        limits = np.asarray(spec.get("joint_effort", limits))[:18]
    except Exception:
        pass
    sat = np.abs(tau) / limits[None, :]
    fz = d["forces"].reshape(-1, 4, 3)[:, :, 2]
    cost = d["mpc_cost"]
    alpha = d["mpc_alpha"]
    defect = d["mpc_defect"]
    # find failure: first cycle with err > 50 mm (or end)
    bad = np.where(err > 50)[0]
    i_fail = int(bad[0]) if len(bad) else len(t) - 1
    print(f"cycles={len(t)}  failure at cycle {i_fail} "
          f"(t={t[i_fail]:.2f}s, disp={disp[i_fail]:.3f} m)")
    lo = max(0, i_fail - 30)
    hi = min(len(t), i_fail + 10)
    print(" t      disp    err_mm ori_dg  z      pitch  roll   cost"
          "     alpha defect   sat_leg sat_arm  min_fz max_fz")
    for i in range(lo, hi, 2):
        print(f"{t[i]:6.2f} {disp[i]:6.3f} {err[i]:8.1f} {ori[i]:6.2f} "
              f"{base[i, 2]:6.3f} {np.degrees(base[i, 4]):6.1f} "
              f"{np.degrees(base[i, 5]):6.1f} {cost[i]:8.2f} "
              f"{alpha[i]:5.2f} {defect[i]:7.1e} "
              f"{sat[i, :12].max():7.2f} {sat[i, 12:].max():7.2f} "
              f"{fz[i].min():7.1f} {fz[i].max():7.1f}")
    # arm angle trajectory near failure
    xd = d["x_des"]
    print("x_des arm joints at fail-5..fail:",
          np.round(xd[max(0, i_fail - 5):i_fail + 1, 24:30], 2))


if __name__ == "__main__":
    main()
