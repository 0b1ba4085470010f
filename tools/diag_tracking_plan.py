"""Plan-space probe for the ee_tracking 24 mm ceiling (VERDICT r3 #4).

The closed-loop ee_tracking error is plan-limited (plan 24.6 mm,
execution 0.86 mm, ACCURACY_r04.json), so a closed-PLAN loop — the
state follows the MPC plan exactly, no WBC/plant — isolates what caps
it. Sweeps EE weight profiles x preview to answer: is the lag a
mu_ee/R-weight tradeoff (tuned weights cut it) or a preview/feasibility
limit (they don't)?

Runs on whatever backend is attached (TPU preferred: ~40 solves/run).
Usage: python tools/diag_tracking_plan.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses  # noqa: E402
import json  # noqa: E402
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qm_control_tpu.experiments import (_default_cfg,  # noqa: E402
                                        _standing_setup)
from qm_control_tpu.ocp.reference import target_from_knots  # noqa: E402
from qm_control_tpu.ocp.costs import ee_pose  # noqa: E402
from qm_control_tpu.mpc.mpc import MpcSolver, evaluate_policy  # noqa: E402
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule  # noqa: E402


def run(mu_p, mu_o, preview, period=4.0, amplitude=0.1, duration=4.0):
    cfg = _default_cfg()
    cfg = cfg.with_(cost=dataclasses.replace(
        cfg.cost, ee_mu_position=mu_p, ee_mu_orientation=mu_o,
        final_ee_mu_position=mu_p, final_ee_mu_orientation=mu_o))
    model, info, q0, s = _standing_setup(cfg)
    ms = GaitSchedule(GAIT_LIBRARY["stance"]).mode_schedule(0.0,
                                                           duration + 5)

    def ref_state(t):
        s_t = s.copy()
        s_t[31] = s[31] + amplitude * np.sin(2 * np.pi * t / period)
        s_t[32] = s[32] + 0.5 * amplitude * (1 - np.cos(2 * np.pi * t
                                                        / period))
        return s_t

    solver = MpcSolver(model, info, cfg)
    x = np.zeros(30, dtype=np.float32)
    x[6:30] = np.asarray(q0)
    horizon = cfg.mpc.time_horizon
    T = 1.0 / cfg.mpc.mpc_frequency
    t, errs = 0.0, []
    while t < duration:
        if preview:
            knot_ts = [t + a * (horizon + 0.3) / 7 for a in range(8)]
            target = target_from_knots(knot_ts,
                                       [ref_state(tt) for tt in knot_ts])
        else:
            s_t = ref_state(t)
            target = target_from_knots([t, t + 0.5, duration + 5],
                                       [s_t, s_t, s_t])
        policy = solver.solve(t, jnp.asarray(x), target, ms)
        x_next, _, _ = evaluate_policy(policy, t + T)
        x = np.asarray(x_next)
        t += T
        if t > 1.0:
            p, _ = ee_pose(model, jnp.asarray(x[6:30]))
            errs.append(float(np.linalg.norm(
                np.asarray(p) - ref_state(t)[30:33])))
    return {"mu": f"{mu_p:g}/{mu_o:g}", "preview": preview,
            "period_s": period,
            "plan_err_max_mm": round(1e3 * float(np.max(errs)), 2),
            "plan_err_mean_mm": round(1e3 * float(np.mean(errs)), 2)}


def main():
    for mu_p, mu_o, preview in ((2000.0, 1000.0, True),
                                (2000.0, 1000.0, False),
                                (12000.0, 600.0, True),
                                (50000.0, 2000.0, True)):
        print(json.dumps(run(mu_p, mu_o, preview)), flush=True)


if __name__ == "__main__":
    main()
