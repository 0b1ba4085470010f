"""WBC task formulations as pure functions with static shapes.

Replicates the reference's WbcBase (qm_wbc/src/WbcBase.cpp:25-595): the
measured/desired precomputation and the 14 `formulate*Task` methods, with
two TPU-native changes:

  - contact-dependent tasks keep FIXED row counts; inactive rows are
    multiplicatively masked to 0 (equalities read 0 = 0; inequalities get
    their bound pushed to +BIG so they are never tight) — no shape changes
    across gait modes;
  - all rigid-body quantities come from the pure-JAX model layer (the
    generalized coordinates are identical to the reference's Pinocchio
    parameterization: base pos, ZYX Euler, joints with plain-rate
    velocities — see WbcBase::updateMeasured :137-143).

Decision vector x in R^36 = [v_dot(24); F(12)] (torques recovered
afterwards; reference WbcBase.cpp:36, :548-563).
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WbcGains
from ..models import centroidal as C
from ..models import dynamics as D
from ..models import kinematics as K
from ..models.rotations import (euler_zyx_rate_to_omega_world_matrix,
                                euler_zyx_to_R, rotation_error_world)
from ..models.spec import EE_FRAME, NQ, RobotModel

NUM_DECISION_VARS = 36
MASK_BIG = 1e6


class Task(NamedTuple):
    """Stacked task matrices: A x = b (equality), D x <= f (inequality).

    Reference equivalent: qm_wbc/include/qm_wbc/Task.h:17-66. Fixed row
    counts; empty blocks are (0, 36) arrays.
    """
    A: jnp.ndarray
    b: jnp.ndarray
    D: jnp.ndarray
    f: jnp.ndarray

    def __add__(self, other: "Task") -> "Task":
        return Task(jnp.concatenate([self.A, other.A], axis=0),
                    jnp.concatenate([self.b, other.b], axis=0),
                    jnp.concatenate([self.D, other.D], axis=0),
                    jnp.concatenate([self.f, other.f], axis=0))

    def scaled(self, w) -> "Task":
        return Task(self.A * w, self.b * w, self.D, self.f)


def empty_task(dtype=jnp.float32) -> Task:
    z = jnp.zeros((0, NUM_DECISION_VARS), dtype=dtype)
    v = jnp.zeros((0,), dtype=dtype)
    return Task(z, v, z, v)


def eq_task(A, b) -> Task:
    z = jnp.zeros((0, NUM_DECISION_VARS), dtype=A.dtype)
    return Task(A, b, z, jnp.zeros((0,), dtype=A.dtype))


def ineq_task(D, f) -> Task:
    z = jnp.zeros((0, NUM_DECISION_VARS), dtype=D.dtype)
    return Task(z, jnp.zeros((0,), dtype=D.dtype), D, f)


class WbcData(NamedTuple):
    """Measured-side precomputation (reference WbcBase::updateMeasured)."""
    q: jnp.ndarray          # (24,)
    v: jnp.ndarray          # (24,)
    M: jnp.ndarray          # (24,24) mass matrix
    h: jnp.ndarray          # (24,)  nonlinear effects
    Jc: jnp.ndarray         # (12,24) stacked contact Jacobian
    dJc_v: jnp.ndarray      # (12,)  dJc/dt * v
    base_J: jnp.ndarray     # (6,24)
    base_dJ_v: jnp.ndarray  # (6,)
    ee_J: jnp.ndarray       # (6,24) arm EE Jacobian
    ee_dJ_v: jnp.ndarray    # (6,)  (base-euler columns NOT zeroed; see task)
    ee_dJ_v_noeuler: jnp.ndarray  # (3,) angular rows with euler cols zeroed
    feet_pos: jnp.ndarray   # (4,3)
    feet_vel: jnp.ndarray   # (4,3)
    ee_pos: jnp.ndarray     # (3,)
    ee_R: jnp.ndarray       # (3,3)
    ee_vel: jnp.ndarray     # (6,)
    contact_flags: jnp.ndarray  # (4,) float 0/1


class WbcDesired(NamedTuple):
    """Desired-side precomputation (reference WbcBase::updateDesired)."""
    q: jnp.ndarray             # (24,)
    v: jnp.ndarray             # (24,)
    base_acc: jnp.ndarray      # (6,) desired base acceleration (qdd coords)
    feet_pos: jnp.ndarray      # (4,3)
    feet_vel: jnp.ndarray      # (4,3)
    ee_pos: jnp.ndarray        # (3,)
    ee_R: jnp.ndarray          # (3,3)
    ee_vel: jnp.ndarray        # (6,)


def _measured_from_suite(q, v, contact_flags, s, ds):
    """Assemble WbcData from an RbdSuite and its q-Jacobian (ds) by
    contraction — the time-derivative terms are einsums with v."""
    dM = ds.M                                      # (24,24,24)
    Mdot = jnp.einsum("ijk,k->ij", dM, v)
    dTdq = 0.5 * jnp.einsum("i,ijk,j->k", v, dM, v)
    h = Mdot @ v - dTdq + s.gvec
    dJc_v = jnp.einsum("ijk,k,j->i", ds.Jc, v, v)
    base_dJ_v = jnp.einsum("ijk,k,j->i", ds.base_J, v, v)
    ee_dJ = jnp.einsum("ijk,k->ij", ds.ee_J, v)    # (6,24)
    ee_dJ_noeuler = ee_dJ.at[3:, 3:6].set(0.0)
    feet_vel = (s.Jc @ v).reshape(4, 3)
    return WbcData(q=q, v=v, M=s.M, h=h, Jc=s.Jc, dJc_v=dJc_v,
                   base_J=s.base_J, base_dJ_v=base_dJ_v,
                   ee_J=s.ee_J, ee_dJ_v=ee_dJ @ v,
                   ee_dJ_v_noeuler=(ee_dJ_noeuler @ v)[3:],
                   feet_pos=s.feet_pos, feet_vel=feet_vel,
                   ee_pos=s.ee_pos, ee_R=s.ee_R, ee_vel=s.ee_J @ v,
                   contact_flags=jnp.asarray(contact_flags, dtype=q.dtype))


def compute_measured(model: RobotModel, q, v, contact_flags) -> WbcData:
    """All measured-side RBD quantities in one pass
    (reference WbcBase.cpp:134-191): one rbd_suite evaluation + ONE
    24-tangent jacfwd of it; every dot-term is a contraction."""
    suite_fn = partial(D.rbd_suite, model)
    s = suite_fn(q)
    ds = jax.jacfwd(suite_fn)(q)
    return _measured_from_suite(q, v, contact_flags, s, ds)


def compute_wbc_data(model: RobotModel, info: C.CentroidalInfo,
                     state_des, input_des, input_last, q, v,
                     contact_flags, period):
    """(WbcData, WbcDesired) with the measured and desired RBD passes
    fused: one vmapped (rbd_suite, jacfwd(rbd_suite)) over the stacked
    [q_meas, q_des] — the kernel count of a single pass, lane-parallel
    over the two configurations and the 24 tangents. This is what holds
    the WBC under its 2 ms deadline."""
    q_des = C.state_to_q(state_des)
    v_base = C.base_velocity_from_momentum(info, state_des)
    v_des = jnp.concatenate([v_base, input_des[12:]])

    suite_fn = partial(D.rbd_suite, model)
    qs = jnp.stack([q, q_des])
    prims, jacs = jax.vmap(
        lambda qq: (suite_fn(qq), jax.jacfwd(suite_fn)(qq)))(qs)
    s0 = jax.tree_util.tree_map(lambda a: a[0], prims)
    ds0 = jax.tree_util.tree_map(lambda a: a[0], jacs)
    s1 = jax.tree_util.tree_map(lambda a: a[1], prims)
    ds1 = jax.tree_util.tree_map(lambda a: a[1], jacs)

    m = _measured_from_suite(q, v, contact_flags, s0, ds0)

    # desired side (reference WbcBase::updateDesired :193-226)
    joint_acc = (input_des[12:] - input_last[12:]) / period
    A = s1.A
    Adot = jnp.einsum("ijk,k->ij", ds1.A, v_des)
    Ab, Aj = A[:, :6], A[:, 6:]
    hdot = C.flow_map(model, info, state_des, input_des)[:6] * info.mass
    rate = hdot - Adot @ v_des - Aj @ joint_acc
    base_acc = jnp.linalg.solve(Ab, rate)
    feet_vel = (s1.Jc @ v_des).reshape(4, 3)
    d = WbcDesired(q=q_des, v=v_des, base_acc=base_acc,
                   feet_pos=s1.feet_pos, feet_vel=feet_vel,
                   ee_pos=s1.ee_pos, ee_R=s1.ee_R, ee_vel=s1.ee_J @ v_des)
    return m, d


def _frame_J(model, q, name):
    return K.frame_jacobian(model, q, name)


def compute_desired(model: RobotModel, info: C.CentroidalInfo,
                    state_des, input_des, input_last, period) -> WbcDesired:
    """Desired-side kinematics + base acceleration (reference
    WbcBase::updateDesired :193-226): desired base acceleration from the
    centroidal momentum matrix algebra Ab^-1 (m hdot_des - Adot v - Aj qdd_j)
    with joint accelerations finite-differenced from consecutive MPC inputs."""
    q_des = C.state_to_q(state_des)
    v_base = C.base_velocity_from_momentum(info, state_des)
    v_j = input_des[12:]
    v_des = jnp.concatenate([v_base, v_j])

    joint_acc = (input_des[12:] - input_last[12:]) / period
    # one jvp yields A and Adot together (pinocchio dccrba equivalent)
    A, Adot = jax.jvp(partial(D.centroidal_momentum_matrix, model),
                      (q_des,), (v_des,))
    Ab, Aj = A[:, :6], A[:, 6:]
    # normalized momentum rate from the centroidal flow map (forces+gravity)
    hdot = C.flow_map(model, info, state_des, input_des)[:6] * info.mass
    rate = hdot - Adot @ v_des - Aj @ joint_acc
    base_acc = jnp.linalg.solve(Ab, rate)

    Jc, _, ee_J, feet_pos, ee_pos, ee_R = K.frame_kinematics(model, q_des)
    feet_vel = (Jc @ v_des).reshape(4, 3)
    return WbcDesired(q=q_des, v=v_des, base_acc=base_acc,
                      feet_pos=feet_pos, feet_vel=feet_vel,
                      ee_pos=ee_pos, ee_R=ee_R, ee_vel=ee_J @ v_des)


# ---------------------------------------------------------------------------
# task formulations (reference WbcBase.cpp:228-546). x = [v_dot(24); F(12)]
# ---------------------------------------------------------------------------

def _with_force_cols(A_vdot, A_force):
    return jnp.concatenate([A_vdot, A_force], axis=1)


def _ee_generalized_force(m: WbcData, ee_wrench):
    """Q = J_ee^T w (24,) for a world-frame wrench [f(3); tau(3)] applied
    at the arm EE; zeros when no wrench is given."""
    if ee_wrench is None:
        return jnp.zeros(NQ, dtype=m.q.dtype)
    return m.ee_J.T @ jnp.asarray(ee_wrench, dtype=m.q.dtype)


def floating_base_eom_task(m: WbcData, ee_wrench=None) -> Task:
    """[Mb, -Jb'] x = -hb + (J_ee' w)[:6] (reference :338-356; the
    external-wrench term is the task-structured hook of the reference's
    force branch — BASELINE config #4)."""
    A = _with_force_cols(m.M[:6], -m.Jc.T[:6])
    Q = _ee_generalized_force(m, ee_wrench)
    return eq_task(A, -m.h[:6] + Q[:6])


def torque_limits_task(m: WbcData, tau_max, ee_wrench=None) -> Task:
    """+-[Mj, -Jj'] x <= tau_max -+ (hj - (J_ee' w)[6:])
    (reference :360-383 with the external-wrench bias)."""
    Aj = _with_force_cols(m.M[6:], -m.Jc.T[6:])
    D_ = jnp.concatenate([Aj, -Aj], axis=0)
    tau = jnp.asarray(tau_max, dtype=m.q.dtype)
    Q = _ee_generalized_force(m, ee_wrench)
    hj_eff = m.h[6:] - Q[6:]
    f = jnp.concatenate([tau - hj_eff, tau + hj_eff])
    return ineq_task(D_, f)


def no_contact_motion_task(m: WbcData) -> Task:
    """Jc x = -dJc v for stance feet (reference :386-401); swing rows
    masked to 0 = 0."""
    mask = jnp.repeat(m.contact_flags, 3)
    A = _with_force_cols(m.Jc, jnp.zeros((12, 12), dtype=m.q.dtype))
    return eq_task(A * mask[:, None], -m.dJc_v * mask)


_PYRAMID = np.array([[0.0, 0.0, -1.0],
                     [1.0, 0.0, 0.0],
                     [-1.0, 0.0, 0.0],
                     [0.0, 1.0, 0.0],
                     [0.0, -1.0, 0.0]])


def friction_cone_task(m: WbcData, friction_coeff) -> Task:
    """Swing feet: F = 0 (equality). Stance feet: 5-face pyramid
    D F <= 0 (reference :407-437). Masked rows: equalities -> 0 = 0;
    inequalities -> 0 <= BIG."""
    dtype = m.q.dtype
    c = m.contact_flags
    swing_mask = jnp.repeat(1.0 - c, 3)
    A_force = jnp.eye(12, dtype=dtype) * swing_mask[:, None]
    A = _with_force_cols(jnp.zeros((12, 24), dtype=dtype), A_force)
    b = jnp.zeros(12, dtype=dtype)

    pyr = jnp.asarray(_PYRAMID, dtype=dtype)
    pyr = pyr.at[1:, 2].set(-friction_coeff)
    blocks = []
    for i in range(4):
        Z = jnp.zeros((5, 12), dtype=dtype)
        blocks.append(Z.at[:, 3 * i:3 * i + 3].set(pyr) * c[i])
    D_force = jnp.concatenate(blocks, axis=0)                 # (20,12)
    D_ = _with_force_cols(jnp.zeros((20, 24), dtype=dtype), D_force)
    f = jnp.repeat(1.0 - c, 5) * MASK_BIG                     # inactive->BIG
    return Task(A, b, D_, f)


def base_height_task(m: WbcData, d: WbcDesired, kp, kd) -> Task:
    """z acceleration servo (reference :296-308)."""
    A = jnp.zeros((1, NUM_DECISION_VARS), dtype=m.q.dtype).at[0, 2].set(1.0)
    b = (d.base_acc[2] + kp * (d.q[2] - m.q[2]) + kd * (d.v[2] - m.v[2]))
    return eq_task(A, b[None])


def base_linear_task(m: WbcData, d: WbcDesired, kp, kd) -> Task:
    """xy acceleration + position/velocity servo (reference :228-240)."""
    A = jnp.zeros((2, NUM_DECISION_VARS), dtype=m.q.dtype)
    A = A.at[0, 0].set(1.0).at[1, 1].set(1.0)
    b = (d.base_acc[:2] + kp * (d.q[:2] - m.q[:2]) + kd * (d.v[:2] - m.v[:2]))
    return eq_task(A, b)


def base_xy_accel_task(m: WbcData, d: WbcDesired) -> Task:
    """Feedforward-only xy acceleration (reference :243-255)."""
    A = jnp.zeros((2, NUM_DECISION_VARS), dtype=m.q.dtype)
    A = A.at[0, 0].set(1.0).at[1, 1].set(1.0)
    return eq_task(A, d.base_acc[:2])


def base_angular_task(m: WbcData, d: WbcDesired, kp, kd) -> Task:
    """World-frame angular acceleration servo through the base angular
    Jacobian (reference :258-293)."""
    dtype = m.q.dtype
    A = _with_force_cols(m.base_J[3:], jnp.zeros((3, 12), dtype=dtype))
    E_meas = euler_zyx_rate_to_omega_world_matrix(m.q[3:6])
    omega_meas = E_meas @ m.v[3:6]
    omega_des = E_meas @ d.v[3:6]        # reference uses measured angles
    R_meas = euler_zyx_to_R(m.q[3:6])
    R_des = euler_zyx_to_R(d.q[3:6])
    err = rotation_error_world(R_des, R_meas)
    # desired angular acceleration: d/dt(E(zyx) zyx_dot) along desired rates
    _, Edot_v = jax.jvp(
        lambda z: euler_zyx_rate_to_omega_world_matrix(z) @ d.v[3:6],
        (m.q[3:6],), (d.v[3:6],))
    acc_des = E_meas @ d.base_acc[3:6] + Edot_v
    b = acc_des + kp * err + kd * (omega_des - omega_meas) - m.base_dJ_v[3:]
    return eq_task(A, b)


def swing_leg_task(m: WbcData, d: WbcDesired, kp, kd) -> Task:
    """Cartesian PD on swing feet (reference :311-334); stance rows
    masked."""
    dtype = m.q.dtype
    mask = jnp.repeat(1.0 - m.contact_flags, 3)
    accel = (kp * (d.feet_pos - m.feet_pos)
             + kd * (d.feet_vel - m.feet_vel)).reshape(-1)
    A = _with_force_cols(m.Jc, jnp.zeros((12, 12), dtype=dtype))
    b = accel - m.dJc_v
    return eq_task(A * mask[:, None], b * mask)


def arm_joint_tracking_task(m: WbcData, d: WbcDesired, kp, kd) -> Task:
    """Arm joint PD (reference :439-465); used for the first 10 s."""
    dtype = m.q.dtype
    A = jnp.zeros((6, NUM_DECISION_VARS), dtype=dtype)
    A = A.at[:, 18:24].set(jnp.eye(6, dtype=dtype))
    kp = jnp.asarray(kp, dtype=dtype)
    kd = jnp.asarray(kd, dtype=dtype)
    b = kp * (d.q[18:24] - m.q[18:24]) + kd * (d.v[18:24] - m.v[18:24])
    return eq_task(A, b)


def ee_linear_task(m: WbcData, d: WbcDesired, kp, kd) -> Task:
    """Arm-EE linear Cartesian PD in world frame (reference :467-492)."""
    dtype = m.q.dtype
    A = _with_force_cols(m.ee_J[:3], jnp.zeros((3, 12), dtype=dtype))
    kp = jnp.asarray(kp, dtype=dtype)
    kd = jnp.asarray(kd, dtype=dtype)
    acc = kp * (d.ee_pos - m.ee_pos) + kd * (d.ee_vel[:3] - m.ee_vel[:3])
    b = acc - m.ee_dJ_v[:3]
    return eq_task(A, b)


def ee_angular_task(m: WbcData, d: WbcDesired, kp, kd) -> Task:
    """Arm-EE angular tracking with world rotation error; base-Euler
    columns zeroed as in the reference (:494-531; note the reference uses
    damping only, no desired angular velocity feedforward)."""
    dtype = m.q.dtype
    Jang = m.ee_J[3:].at[:, 3:6].set(0.0)
    A = _with_force_cols(Jang, jnp.zeros((3, 12), dtype=dtype))
    err = rotation_error_world(d.ee_R, m.ee_R)
    kp = jnp.asarray(kp, dtype=dtype)
    kd = jnp.asarray(kd, dtype=dtype)
    b = kp * err + kd * (-m.ee_vel[3:]) - m.ee_dJ_v_noeuler
    return eq_task(A, b)


def contact_force_task(m: WbcData, input_des) -> Task:
    """F = F_mpc for all four feet (reference :534-546)."""
    dtype = m.q.dtype
    A = _with_force_cols(jnp.zeros((12, 24), dtype=dtype),
                         jnp.eye(12, dtype=dtype))
    return eq_task(A, input_des[:12])


def recover_torques(m: WbcData, x_opt, ee_wrench=None):
    """tau = Mj vdot - Jj' F + hj - (J_ee' w)[6:]
    (reference WbcBase::updateCmd :548-563, with the external EE wrench
    entering as a measured generalized force)."""
    vdot, F = x_opt[:24], x_opt[24:]
    Q = _ee_generalized_force(m, ee_wrench)
    return m.M[6:] @ vdot - m.Jc.T[6:] @ F + m.h[6:] - Q[6:]
