"""Centroidal dynamics model (Single Rigid Body variant) in pure JAX.

TPU-native replacement for OCS2's PinocchioCentroidalDynamicsAD + CppAD
codegen and CentroidalModelRbdConversions (reference: qm_interface/src/
dynamics/QMDynamicsAD.cpp:12-33, task.info:1 `centroidalModelType 1`,
QMController.cpp:289-290). Linearizations come from jax.jacfwd instead of
generated C code; everything is vmap/jit-safe.

State / input layout (matches reference task.info:150-233):
  x in R^30 = [ h_norm(6) = (v_com, L_world/m) ; base pose (p(3), zyx(3)) ;
               q_joints(18) ]
  u in R^30 = [ contact forces 4x3 (LF, RF, LH, RH, world frame) ; qdot_j(18) ]

SRBD freezes the mass distribution at the nominal joint configuration:
the centroidal inertia and the COM offset from the base are constants in the
base frame; contact/EE kinematics still use the actual joint angles.
"""
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import dynamics as D
from . import kinematics as K
from .rotations import (euler_zyx_rate_to_omega_world_matrix, euler_zyx_to_R,
                        skew)
from .spec import (CONTACT_FRAMES, NQ, NUM_CONTACTS, NUM_JOINTS, RobotModel,
                   default_q)

STATE_DIM = 30
INPUT_DIM = 30
GRAVITY = D.GRAVITY


@dataclass(frozen=True)
class CentroidalInfo:
    """Frozen SRBD quantities (nominal joint configuration)."""
    mass: float
    r_com_base: np.ndarray      # COM offset from base origin, base frame (3,)
    I_com_base: np.ndarray      # centroidal inertia, base frame (3,3)


def make_centroidal_info(model: RobotModel, q_nominal=None) -> CentroidalInfo:
    if q_nominal is None:
        q_nominal = default_q(base_pos=(0, 0, 0), base_zyx=(0, 0, 0))
    q = jnp.asarray(q_nominal, dtype=jnp.float64
                    if jax.config.jax_enable_x64 else jnp.float32)
    # jit the one-time construction: eager op-by-op dispatch of the FK/CMM
    # graphs is orders of magnitude slower than one compiled call
    com_A = jax.jit(lambda qq: (D.com_position(model, qq),
                                D.centroidal_momentum_matrix(model, qq)))
    com_j, A_j = com_A(q)
    com, A = np.asarray(com_j), np.asarray(A_j)
    E0 = np.asarray(euler_zyx_rate_to_omega_world_matrix(q[3:6]))
    I_com = A[3:, 3:6] @ np.linalg.inv(E0)
    assert np.allclose(I_com, I_com.T, atol=1e-4), I_com
    return CentroidalInfo(mass=float(model.total_mass),
                          r_com_base=com, I_com_base=np.asarray(I_com))


def state_to_q(x):
    """Generalized coordinates q(24) from centroidal state x(30)."""
    return x[6:6 + NQ]


def base_velocity_from_momentum(info: CentroidalInfo, x):
    """[pdot_base(3); zyx_rates(3)] from normalized momentum (SRBD Ab^-1).

    Reference equivalent: OCS2 getFloatingBaseCentroidalStateFromRbdModel /
    the base-pose rows of the centroidal flow map. Scalar-structured
    implementation (models/chainfk.py) — called 3x per dynamics
    evaluation in the solver, so graph size matters."""
    from . import chainfk
    return chainfk.base_velocity_from_momentum(info, x)


def com_position_srbd(info: CentroidalInfo, x):
    """SRBD COM: base position + rotated nominal offset."""
    from .smallmat import mv3
    R = euler_zyx_to_R(x[9:12])
    return x[6:9] + mv3(R, jnp.asarray(info.r_com_base, dtype=x.dtype))


def flow_map(model: RobotModel, info: CentroidalInfo, x, u,
             ee_wrench=None):
    """xdot = f(x, u): centroidal dynamics (reference QMDynamicsAD flow map).

    Momentum rate from contact forces + gravity; base pose rate from the
    frozen SRBD momentum matrix; joint rate = commanded joint velocity
    input. ee_wrench: optional world wrench [f(3); tau(3)] applied at the
    arm EE — the MPC-side disturbance input hook (BASELINE config #4).
    """
    q = state_to_q(x)
    forces = u[:3 * NUM_CONTACTS].reshape(NUM_CONTACTS, 3)
    v_j = u[3 * NUM_CONTACTS:]

    p_contacts = K.contact_positions(model, q)        # (4,3) actual FK
    p_com = com_position_srbd(info, x)

    f_total = forces.sum(0)
    tau_com = jnp.cross(p_contacts - p_com[None, :], forces).sum(0)

    if ee_wrench is not None:
        w = jnp.asarray(ee_wrench, dtype=x.dtype)
        from ..ocp.costs import ee_pose as _ee_pose
        p_ee, _ = _ee_pose(model, q)
        f_total = f_total + w[:3]
        tau_com = tau_com + jnp.cross(p_ee - p_com, w[:3]) + w[3:]

    g = jnp.array([0.0, 0.0, -GRAVITY], dtype=x.dtype)
    h_dot_lin = f_total / info.mass + g
    h_dot_ang = tau_com / info.mass

    base_dot = base_velocity_from_momentum(info, x)
    return jnp.concatenate([h_dot_lin, h_dot_ang, base_dot, v_j])


def linearize_flow_map(model: RobotModel, info: CentroidalInfo, x, u):
    """A = df/dx (30x30), B = df/du (30x30) via forward-mode autodiff.

    Replaces the CppAD-generated analytic Jacobians
    (reference QMDynamicsAD::linearApproximation).
    """
    f = partial(flow_map, model, info)
    A = jax.jacfwd(f, argnums=0)(x, u)
    B = jax.jacfwd(f, argnums=1)(x, u)
    return A, B


def weight_compensating_input(info: CentroidalInfo, contact_flags):
    """Gravity-distributing input for the given contact flags.

    Reference: OCS2 weightCompensatingInput, used by QMInitializer
    (qm_interface/src/initialization/QMInitializer.cpp:35-40) and the
    tracking cost's input offset (LeggedRobotQuadraticTrackingCost.h:38).
    """
    flags = jnp.asarray(contact_flags)
    n_active = jnp.maximum(flags.sum(), 1)
    fz = info.mass * GRAVITY / n_active
    forces = jnp.stack([jnp.zeros_like(flags, dtype=jnp.float32),
                        jnp.zeros_like(flags, dtype=jnp.float32),
                        flags.astype(jnp.float32) * fz], axis=1)  # (4,3)
    return jnp.concatenate([forces.reshape(-1),
                            jnp.zeros(NUM_JOINTS, dtype=jnp.float32)])


# ---------------------------------------------------------------------------
# RBD <-> centroidal conversions (reference: CentroidalModelRbdConversions,
# QMController.cpp:240-241). Our "RBD state" convention:
#   rbd = [q(24); v(24); ee pose(7)] is assembled by the estimator; the
#   conversion functions below work on (q, v) pairs directly.
# ---------------------------------------------------------------------------

def centroidal_state_from_rbd(model: RobotModel, info: CentroidalInfo, q, v):
    """x(30) from generalized (q, v) using the SRBD momentum matrix."""
    from .smallmat import mm3, mv3
    zyx = q[3:6]
    R = euler_zyx_to_R(zyx)
    E = euler_zyx_rate_to_omega_world_matrix(zyx)
    omega = mv3(E, v[3:6])
    r_w = mv3(R, jnp.asarray(info.r_com_base, dtype=q.dtype))
    v_com = v[0:3] + jnp.cross(omega, r_w)
    I_w = mm3(mm3(R, jnp.asarray(info.I_com_base, dtype=q.dtype)),
              jnp.swapaxes(R, -1, -2))
    l_norm = mv3(I_w, omega) / info.mass
    return jnp.concatenate([v_com, l_norm, q])


def rbd_velocity_from_centroidal(info: CentroidalInfo, x, v_joints=None):
    """v(24) from centroidal state (joint rates must be supplied or zero)."""
    base_dot = base_velocity_from_momentum(info, x)
    if v_joints is None:
        v_joints = jnp.zeros(NUM_JOINTS, dtype=x.dtype)
    return jnp.concatenate([base_dot, v_joints])


def full_centroidal_state_from_rbd(model: RobotModel, q, v):
    """x(30) using the exact (full) centroidal momentum matrix A(q)v.

    The FullCentroidalDynamics variant (centroidalModelType 0) mapping;
    useful for estimator-side ground truth and accuracy tests.
    """
    A = D.centroidal_momentum_matrix(model, q)
    h_norm = (A @ v) / model.total_mass
    return jnp.concatenate([h_norm, q])
