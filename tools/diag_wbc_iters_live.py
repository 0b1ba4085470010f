"""How many IP iterations does the cascade need on LIVE mid-gait stacks?

Runs a short 1 kHz trot closed loop (reference weights), reconstructs
the exact WBC inputs at each cycle's last tick (measured q/v from the
plant, desireds from the executed policy), and sweeps qp_iters cold and
warm against a 40-iteration anchor on per-level objectives.

The deployed 20 was calibrated with round-3 numerics ("last ~0.7 Nm
arrives between iterations 15 and 20", wbc/hoqp.py docstring); this
re-measures with the round-4/5 solver.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qm_tpu_jax_cache")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import qm_control_tpu  # noqa: F401
from qm_control_tpu.experiments import _default_cfg, _loop_cfg, _standing_setup
from qm_control_tpu.gaits.gait import contact_flags_from_mode
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.kernels import hoqp_fused as HF
from qm_control_tpu.mpc.mpc import evaluate_policy
from qm_control_tpu.ocp.reference import target_from_knots
from qm_control_tpu.runtime.estimator import (rbd_state_from_plant,
                                              rbd_to_qv)
from qm_control_tpu.runtime.loop import ControlLoop
from qm_control_tpu.wbc import tasks as T


def collect_stacks(n_cycles=60):
    cfg = _default_cfg()
    model, info, q0, s = _standing_setup(cfg)
    loop = ControlLoop(model, info, cfg, _loop_cfg(1000.0))
    target = target_from_knots([0.0, 9.0], [s, s])
    gs = GaitSchedule(GAIT_LIBRARY["stance"])
    gs.insert_template(GAIT_LIBRARY["trot"], 0.3)
    ms = gs.mode_schedule(0.0, 9.0)
    carry = loop.init_carry(q0)
    carry = loop.warmup(carry, target, ms, num_solves=15)
    tau_max = jnp.asarray(model.joint_effort, dtype=jnp.float32)
    gains = loop.gains
    stacks = []
    u_prev = jnp.zeros(30, dtype=jnp.float32)
    for i in range(n_cycles):
        carry, m = loop.run(carry, target, ms, num_cycles=1)
        rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
        q_meas, v_meas = rbd_to_qv(rbd)
        exec_policy = jax.tree_util.tree_map(lambda a: a[0], carry.policy)
        x_des, u_des, mode = evaluate_policy(exec_policy, carry.t)
        flags = contact_flags_from_mode(mode).astype(jnp.float32)
        if i >= 10 and i % 2 == 0:   # past the gait start transient
            m_, d_ = T.compute_wbc_data(
                model, info, x_des, u_des, u_prev, q_meas, v_meas, flags,
                jnp.asarray(1e-3, jnp.float32))
            t0 = (T.floating_base_eom_task(m_)
                  + T.torque_limits_task(m_, tau_max)
                  + T.no_contact_motion_task(m_)
                  + T.friction_cone_task(m_, gains.friction_coefficient))
            t1 = (T.base_height_task(m_, d_, gains.base_height_kp,
                                     gains.base_height_kd)
                  + T.base_angular_task(m_, d_, gains.kp_base_angular,
                                        gains.kd_base_angular)
                  + T.ee_linear_task(m_, d_, gains.kp_ee_linear,
                                     gains.kd_ee_linear)
                  + T.ee_angular_task(m_, d_, gains.kp_ee_angular,
                                      gains.kd_ee_angular)
                  + T.swing_leg_task(m_, d_, gains.kp_swing, gains.kd_swing
                                     ).scaled(gains.swing_task_weight))
            t2 = (T.contact_force_task(m_, u_des)
                  + T.base_linear_task(m_, d_, gains.kp_base_linear,
                                       gains.kd_base_linear))
            stacks.append((m_, (t0, t1, t2)))
        u_prev = u_des
    return stacks


def objectives(st, x):
    t0, t1, t2 = st
    viol = float(jnp.max(jnp.maximum(t0.D @ x - t0.f, 0.0)))
    return np.asarray([float(jnp.linalg.norm(t.A @ x - t.b))
                       for t in (t0, t1, t2)] + [viol])


def main():
    from functools import partial
    from qm_control_tpu.kernels.cascade_exact import cascade_exact
    stacks = collect_stacks()
    print(f"collected {len(stacks)} live stacks", flush=True)
    ks = (6, 8, 10, 12, 16, 20)
    solver = {k: jax.jit(partial(cascade_exact, qp_iters=k)) for k in ks}
    solver[40] = jax.jit(partial(cascade_exact, qp_iters=40))
    warm_solver = {k: jax.jit(partial(cascade_exact, qp_iters=k))
                   for k in ks}
    warm_gen = jax.jit(partial(cascade_exact, qp_iters=20,
                               return_warm=True))
    worst_cold = {k: np.zeros(4) for k in ks}
    worst_warm = {k: np.zeros(4) for k in ks}
    anchor_scale = np.zeros(4)
    prev_warm = None
    for m_, st in stacks:
        o40 = objectives(st, solver[40](*st))
        anchor_scale = np.maximum(anchor_scale, o40)
        for k in ks:
            worst_cold[k] = np.maximum(
                worst_cold[k], objectives(st, solver[k](*st)) - o40)
            if prev_warm is not None:
                xw = warm_solver[k](*st, warm=prev_warm)
                worst_warm[k] = np.maximum(worst_warm[k],
                                           objectives(st, xw) - o40)
        _, prev_warm = warm_gen(*st)
    print("anchor objective scale:", anchor_scale)
    for k in ks:
        print(f"k={k:2d}: worst dobj cold {worst_cold[k]}   "
              f"warm {worst_warm[k]}", flush=True)


if __name__ == "__main__":
    main()
