"""Diagnostic: WHAT stops the converged MPC plan from canceling base sway
with the arm? (round-3 accuracy hunt, after sweep_accuracy showed
r_arm x0.1 does NOT reduce planned EE error.)

From a mid-trot state, runs converged (20-iter) solves under ablations
that each remove one candidate blocker, and reports the planned EE
position/orientation error over the horizon:

  base       : reference weights
  r_arm_0    : arm velocity R -> 1e-3 (free arm motion)
  no_vel_lim : arm velocity-limit barrier off
  no_pos_lim : arm position-limit barrier off
  no_ori     : EE orientation penalty off (pos-only hold)
  q_arm_0    : arm joint-position Q -> 0 (joint3 pull off)
  all_free   : all of the above at once
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax.numpy as jnp
import numpy as np

from qm_control_tpu.config import MpcConfig, QmConfig
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models import kinematics as K
from qm_control_tpu.models import load_model
from qm_control_tpu.models.rotations import R_to_quat, quat_distance
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.mpc.mpc import MpcSolver
from qm_control_tpu.ocp.reference import target_from_knots
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant)
from qm_control_tpu.runtime.loop import ControlLoop, LoopConfig
from qm_control_tpu.solver.sqp import SqpSettings


def fk_ee(model, x30):
    q = C.state_to_q(jnp.asarray(x30, jnp.float32))
    cache = K.fk(model, q)
    p, R = K.frame_pose(model, cache, "j2n6s300_end_effector")
    return np.asarray(p), np.asarray(R_to_quat(R))  # wxyz


def main():
    cfg0 = QmConfig().with_(mpc=MpcConfig(time_horizon=1.0, dt=0.015,
                                          num_iterations=1))
    cfg0 = cfg0.with_(wbc=dataclasses.replace(cfg0.wbc,
                                              arm_settling_time=0.0))
    model = load_model()
    info = C.make_centroidal_info(model)
    q0 = jnp.asarray(default_q(base_pos=(0, 0, 0.38)), dtype=jnp.float32)
    s = np.zeros(37)
    s[6:30] = np.asarray(q0)
    s[8] = 0.4
    s[30:33] = [0.52, 0.09, 0.78]
    s[33:37] = [0.5, -0.5, 0.5, -0.5]

    # drive the closed loop to a settled mid-trot state (as diag_trot_plan)
    loop = ControlLoop(model, info, cfg0, LoopConfig())
    target = target_from_knots([0.0, 20.0], [s, s])
    gs = GaitSchedule(GAIT_LIBRARY["stance"])
    gs.insert_template(GAIT_LIBRARY["trot"], 0.5)
    ms = gs.mode_schedule(0.0, 20.0)
    carry = loop.init_carry(q0)
    carry = loop.warmup(carry, target, ms, num_solves=25)
    carry, _ = loop.run(carry, target, ms, num_cycles=50)
    rbd0 = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
    s = s.copy()
    s[30:37] = np.asarray(rbd0[48:55])
    target = target_from_knots([float(carry.t), 20.0], [s, s])
    carry, m = loop.run(carry, target, ms, num_cycles=155)
    errs = np.asarray(m.ee_pos_err)
    worst = int(np.argmax(errs[55:])) + 55
    # grab the observation at a worst-error cycle by re-running to it
    # (cheap: metrics are per-cycle; x_des[0] at cycle start ~ measured)
    rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
    x_mid = np.asarray(observation_from_rbd(model, info, rbd,
                                            carry.last_yaw))
    t_mid = float(carry.t)
    print(f"mid-trot state at t={t_mid:.2f}; closed-loop worst "
          f"{1e3*errs[55:].max():.2f} mm")

    q_ref = np.array([s[36], s[33], s[34], s[35]])  # wxyz

    def report(name, cfg):
        solver = MpcSolver(model, info, cfg,
                           settings=SqpSettings(num_iterations=20))
        pol = solver.solve(t_mid, jnp.asarray(x_mid, jnp.float32), target,
                           ms)
        X = np.asarray(pol.X)
        U = np.asarray(pol.U)
        perr, oerr = [], []
        for k in range(X.shape[0]):
            p, quat = fk_ee(model, X[k])
            perr.append(np.linalg.norm(p - s[30:33]))
            oerr.append(np.linalg.norm(np.asarray(
                quat_distance(jnp.asarray(quat), jnp.asarray(q_ref)))))
        perr, oerr = np.array(perr), np.array(oerr)
        av = np.abs(U[:, 24:30])
        print(f"{name:12s}: EE pos tail(10:) mean {1e3*perr[10:].mean():6.2f} "
              f"max {1e3*perr[10:].max():6.2f} mm | ori mean "
              f"{np.degrees(oerr[10:].mean()):5.2f} deg | arm vel "
              f"max {av.max():.3f} mean {av.mean():.3f} rad/s | cost "
              f"{float(pol.cost):.4f}")

    base = cfg0
    report("base", base)

    r = list(base.cost.r_diag)
    r[24:30] = [1.0] * 6   # effective 1e-3 after scaling
    report("r_arm_0", base.with_(cost=dataclasses.replace(
        base.cost, r_diag=tuple(r))))

    jl = base.joint_limits
    report("no_vel_lim", base.with_(joint_limits=dataclasses.replace(
        jl, velocity_mu=0.0)))
    report("no_pos_lim", base.with_(joint_limits=dataclasses.replace(
        jl, position_mu=0.0)))

    report("no_ori", base.with_(cost=dataclasses.replace(
        base.cost, ee_mu_orientation=0.0, final_ee_mu_orientation=0.0)))

    qd = list(base.cost.q_diag)
    qd[24:30] = [0.0] * 6
    report("q_arm_0", base.with_(cost=dataclasses.replace(
        base.cost, q_diag=tuple(qd))))

    allf = base.with_(
        cost=dataclasses.replace(base.cost, r_diag=tuple(r),
                                 q_diag=tuple(qd), ee_mu_orientation=0.0,
                                 final_ee_mu_orientation=0.0),
        joint_limits=dataclasses.replace(jl, velocity_mu=0.0,
                                         position_mu=0.0))
    report("all_free", allf)


if __name__ == "__main__":
    main()
