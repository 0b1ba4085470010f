"""Diagnostic: does the converged trot MPC plan really sway the EE?

Round-2 claimed the optimal plan sways the base +-25 mm and the arm cannot
compensate (capped by velocity limits), so total EE error is planning-
dominated. This contradicts the reference's published <=3.5 mm plot AND
the cost arithmetic (effective R_arm = 1000 * 1e-3 = 1.0 vs EE mu = 2000:
arm compensation is ~cheap). This script measures, with no reframing:

  A. closed-loop trot-in-place: base sway, measured EE error, planned arm
     velocities (is the plan even using the arm?)
  B. a CONVERGED solve (20 SQP iterations) from a mid-trot state: planned
     EE error across the WHOLE horizon + planned base sway + planned arm
     joint velocities.

If B's horizon-wide planned EE error is small (~mm) the round-2 story is
wrong and the gap is execution/evaluation; if it is ~25 mm the cost or
dynamics diverge from the reference.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from qm_control_tpu.config import MpcConfig, QmConfig
import dataclasses
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models import kinematics as K
from qm_control_tpu.models import load_model
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.ocp.reference import target_from_knots
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant)
from qm_control_tpu.runtime.loop import ControlLoop, LoopConfig
from qm_control_tpu.solver.sqp import SqpSettings
from qm_control_tpu.mpc.mpc import MpcSolver


def fk_ee(model, x30):
    q = C.state_to_q(jnp.asarray(x30, jnp.float32))
    cache = K.fk(model, q)
    p, _ = K.frame_pose(model, cache, "j2n6s300_end_effector")
    return np.asarray(p)


def main():
    cfg = QmConfig().with_(mpc=MpcConfig(time_horizon=1.0, dt=0.015,
                                         num_iterations=1))
    cfg = cfg.with_(wbc=dataclasses.replace(cfg.wbc, arm_settling_time=0.0))
    model = load_model()
    info = C.make_centroidal_info(model)
    q0 = jnp.asarray(default_q(base_pos=(0, 0, 0.38)), dtype=jnp.float32)
    s = np.zeros(37)
    s[6:30] = np.asarray(q0)
    s[8] = 0.4
    s[30:33] = [0.52, 0.09, 0.78]
    s[33:37] = [0.5, -0.5, 0.5, -0.5]

    loop = ControlLoop(model, info, cfg, LoopConfig())
    target = target_from_knots([0.0, 20.0], [s, s])
    gs = GaitSchedule(GAIT_LIBRARY["stance"])
    gs.insert_template(GAIT_LIBRARY["trot"], 0.5)
    ms = gs.mode_schedule(0.0, 20.0)
    carry = loop.init_carry(q0)
    carry = loop.warmup(carry, target, ms, num_solves=25)
    carry, _ = loop.run(carry, target, ms, num_cycles=50)
    # re-anchor the hold target at the settled EE pose
    rbd0 = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
    s = s.copy()
    s[30:37] = np.asarray(rbd0[48:55])
    target = target_from_knots([float(carry.t), 20.0], [s, s])
    print(f"settled EE hold target: {s[30:33]}")

    # --- A: closed-loop trot-in-place, 2 s ---
    base_xy, ee_err, arm_vel_plan, x_obs_hist = [], [], [], []
    t_hist = []
    for i in range(200):
        carry, m = loop.run(carry, target, ms, num_cycles=1)
        base_xy.append(np.asarray(m.base_pose)[0][:2])
        ee_err.append(float(np.asarray(m.ee_pos_err)[0]))
        t_hist.append(float(carry.t))
        rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
        x_obs_hist.append(np.asarray(observation_from_rbd(
            model, info, rbd, carry.last_yaw)))
    base_xy = np.array(base_xy)
    ee_err = np.array(ee_err)
    ref_xy = base_xy[0]
    sway = base_xy - np.mean(base_xy[50:], axis=0)
    print("\n=== A. closed-loop trot-in-place (after settle) ===")
    print(f"base sway x: +-{1e3*np.abs(sway[50:,0]).max():.1f} mm, "
          f"y: +-{1e3*np.abs(sway[50:,1]).max():.1f} mm")
    print(f"measured EE err: max {1e3*ee_err[50:].max():.2f} mm, "
          f"mean {1e3*ee_err[50:].mean():.2f} mm")

    # --- B: converged solve from a mid-trot state ---
    worst_i = 50 + int(np.argmax(ee_err[50:]))
    x_mid = x_obs_hist[worst_i]
    t_mid = t_hist[worst_i]
    print(f"\n=== B. converged solve from worst closed-loop state "
          f"(t={t_mid:.2f}, ee_err={1e3*ee_err[worst_i]:.2f} mm) ===")
    for iters in (1, 20):
        solver = MpcSolver(model, info, cfg,
                           settings=SqpSettings(num_iterations=iters))
        pol = solver.solve(t_mid, x_mid, target, ms)
        X = np.asarray(pol.X)
        U = np.asarray(pol.U)
        ee_plan = np.array([fk_ee(model, X[k]) for k in range(X.shape[0])])
        perr = np.linalg.norm(ee_plan - s[30:33][None], axis=1)
        bx = X[:, 6] - np.mean(X[:, 6])
        by = X[:, 7] - np.mean(X[:, 7])
        av = np.abs(U[:, 24:30])
        print(f"  iters={iters}: planned EE err over horizon: "
              f"node0 {1e3*perr[0]:.2f} mm, max {1e3*perr.max():.2f} mm, "
              f"mean {1e3*perr.mean():.2f} mm")
        print(f"    planned base sway over horizon: x +-{1e3*np.abs(bx).max():.1f} mm, "
              f"y +-{1e3*np.abs(by).max():.1f} mm")
        print(f"    planned |arm vel| max {av.max():.3f} rad/s "
              f"(limits 0.628/0.837); mean {av.mean():.3f}")
        print(f"    solver cost: {float(pol.cost):.4f}")


if __name__ == "__main__":
    main()
