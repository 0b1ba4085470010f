"""Hierarchical whole-body controllers.

Replicates the reference's HierarchicalWbc / HierarchicalMpcWbc priority
stacks (qm_wbc/src/HierarchicalWbc.cpp:18-44, HierarchicalMpcWbc.cpp:18-34):

  T0 (hard):   floating-base EoM + torque limits + stance no-motion +
               friction cone
  T1 (track):  base height + base angular + EE linear + EE angular +
               100 x swing leg       [first 10 s: arm-joint nominal
               tracking instead — the arm-settling staging behavior]
  T2 (slack):  contact-force tracking + base linear

The arm-settling switch is a jnp.where blend over the two T1 solutions
(branch-free: both stacks share T0/T2 and the cascade is solved for a
blended T1 task — task matrices have identical shapes (12 rows), so the
time gate is a row-level mask).

Everything is a pure function of (q, v, desired, contacts, gains); wrap in
jax.jit / vmap at the call site.
"""
from typing import NamedTuple

import jax.numpy as jnp

from ..config import WbcGains
from ..models import centroidal as C
from ..models.spec import RobotModel
from .hoqp import hoqp_solve
from .tasks import (WbcData, WbcDesired, arm_joint_tracking_task,
                    base_angular_task, base_height_task, base_linear_task,
                    base_xy_accel_task, compute_desired, compute_measured,
                    contact_force_task, ee_angular_task, ee_linear_task,
                    floating_base_eom_task, friction_cone_task,
                    no_contact_motion_task, recover_torques, swing_leg_task,
                    torque_limits_task)

ARM_SETTLING_TIME = 10.0     # reference HierarchicalWbc.cpp:32


class WbcResult(NamedTuple):
    x_opt: jnp.ndarray      # (36,) [v_dot(24); F(12)]
    torques: jnp.ndarray    # (18,) actuated joint torques
    vdot: jnp.ndarray       # (24,)
    forces: jnp.ndarray     # (12,)


def _blend_tasks(t_a, t_b, w_b):
    """Row-shape-identical blend: (1-w) * A + w * B on (A,b); D,f empty."""
    from .tasks import Task
    return Task((1.0 - w_b) * t_a.A + w_b * t_b.A,
                (1.0 - w_b) * t_a.b + w_b * t_b.b,
                t_a.D, t_a.f)


def hierarchical_wbc_update(model: RobotModel, info: C.CentroidalInfo,
                            gains: WbcGains, tau_max,
                            state_des, input_des, input_last,
                            q, v, contact_flags, period, time,
                            ee_wrench=None,
                            fused_cascade: bool = False) -> WbcResult:
    """One WBC solve. Mirrors HierarchicalWbc::update (reference :18-44).

    ee_wrench: optional measured world-frame wrench [f(3); tau(3)] applied
    at the arm EE (force-sensor input); enters the EoM, torque limits and
    torque recovery (BASELINE config #4; reference WbcBase.cpp:338-383
    task structure).

    fused_cascade: solve the cascade with the single Pallas kernel
    (kernels.hoqp_fused) instead of the XLA op-per-op cascade — the
    B=1 real-time path; the vmapped batch path keeps the XLA cascade."""
    from .tasks import compute_wbc_data
    m, d = compute_wbc_data(model, info, state_des, input_des, input_last,
                            q, v, contact_flags, period)

    t0 = (floating_base_eom_task(m, ee_wrench)
          + torque_limits_task(m, tau_max, ee_wrench)
          + no_contact_motion_task(m)
          + friction_cone_task(m, gains.friction_coefficient))

    t1_run = (base_height_task(m, d, gains.base_height_kp,
                               gains.base_height_kd)
              + base_angular_task(m, d, gains.kp_base_angular,
                                  gains.kd_base_angular)
              + ee_linear_task(m, d, gains.kp_ee_linear, gains.kd_ee_linear)
              + ee_angular_task(m, d, gains.kp_ee_angular,
                                gains.kd_ee_angular)
              + swing_leg_task(m, d, gains.kp_swing,
                               gains.kd_swing).scaled(gains.swing_task_weight))

    # first-10-s arm settling: T1 is arm-joint nominal tracking only
    # (reference :32-43). Solve with a mask-blended T1: the init stack's
    # rows are padded to the run stack's shape with zero rows.
    t1_init = arm_joint_tracking_task(m, d, gains.kp_arm_joints,
                                      gains.kd_arm_joints)
    from .tasks import Task
    pad = t1_run.A.shape[0] - t1_init.A.shape[0]
    t1_init_padded = Task(
        jnp.concatenate([t1_init.A,
                         jnp.zeros((pad, t1_init.A.shape[1]),
                                   dtype=t1_init.A.dtype)], axis=0),
        jnp.concatenate([t1_init.b,
                         jnp.zeros(pad, dtype=t1_init.b.dtype)]),
        t1_run.D, t1_run.f)
    w_run = jnp.where(jnp.asarray(time) < gains.arm_settling_time, 0.0, 1.0)
    t1 = _blend_tasks(t1_init_padded, t1_run, w_run)

    t2 = contact_force_task(m, input_des) + base_linear_task(
        m, d, gains.kp_base_linear, gains.kd_base_linear)

    if fused_cascade == "xla":
        # the no-pivot cascade math on EXACT problem shapes: the
        # vmappable batch path (a vmapped pallas_call serializes over the
        # grid, and the padded (128,128) XLA math wastes >70 % of every
        # pass — kernels.cascade_exact measured 6748 vs 1588 solves/s at
        # B=256/20 iters on a v5e)
        from ..kernels.cascade_exact import cascade_exact
        x_opt = cascade_exact(t0, t1, t2)
    elif fused_cascade:
        from ..kernels.hoqp_fused import fused_hoqp
        x_opt = fused_hoqp(t0, t1, t2)
    else:
        x_opt = hoqp_solve([t0, t1, t2])
    tau = recover_torques(m, x_opt, ee_wrench)
    return WbcResult(x_opt=x_opt, torques=tau, vdot=x_opt[:24],
                     forces=x_opt[24:])


def hierarchical_mpc_wbc_update(model: RobotModel, info: C.CentroidalInfo,
                                gains: WbcGains, tau_max,
                                state_des, input_des, input_last,
                                q, v, contact_flags, period,
                                ee_wrench=None,
                                fused_cascade: bool = False) -> WbcResult:
    """MPC-only variant: no arm/EE tasks (reference
    HierarchicalMpcWbc.cpp:18-34 — arm handled by position controllers)."""
    from .tasks import compute_wbc_data
    m, d = compute_wbc_data(model, info, state_des, input_des, input_last,
                            q, v, contact_flags, period)
    t0 = (floating_base_eom_task(m, ee_wrench)
          + torque_limits_task(m, tau_max, ee_wrench)
          + no_contact_motion_task(m)
          + friction_cone_task(m, gains.friction_coefficient))
    t1 = (base_height_task(m, d, gains.base_height_kp, gains.base_height_kd)
          + base_angular_task(m, d, gains.kp_base_angular,
                              gains.kd_base_angular)
          + base_linear_task(m, d, gains.kp_base_linear, gains.kd_base_linear)
          + swing_leg_task(m, d, gains.kp_swing,
                           gains.kd_swing).scaled(gains.swing_task_weight))
    t2 = contact_force_task(m, input_des)
    if fused_cascade:
        from ..kernels.hoqp_fused import fused_hoqp
        x_opt = fused_hoqp(t0, t1, t2)
    else:
        x_opt = hoqp_solve([t0, t1, t2])
    tau = recover_torques(m, x_opt, ee_wrench)
    return WbcResult(x_opt=x_opt, torques=tau, vdot=x_opt[:24],
                     forces=x_opt[24:])


class HierarchicalWbc:
    """Host-side wrapper holding one-step state (inputLast_ for the
    finite-difference joint acceleration; reference WbcBase.cpp:212-213)."""

    def __init__(self, model: RobotModel, info: C.CentroidalInfo,
                 gains: WbcGains = None):
        import jax
        from functools import partial
        self.model = model
        self.info = info
        self.gains = gains or WbcGains()
        self.tau_max = jnp.asarray(model.joint_effort, dtype=jnp.float32)
        self._input_last = jnp.zeros(30, dtype=jnp.float32)
        self._update = jax.jit(partial(hierarchical_wbc_update, model, info))

    def update(self, state_des, input_des, q, v, contact_flags, period,
               time) -> WbcResult:
        res = self._update(self.gains, self.tau_max, state_des, input_des,
                           self._input_last, q, v, contact_flags,
                           jnp.asarray(period, dtype=jnp.float32),
                           jnp.asarray(time, dtype=jnp.float32))
        self._input_last = jnp.asarray(input_des, dtype=jnp.float32)
        return res
