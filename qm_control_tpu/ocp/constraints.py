"""State-input equality constraints via input reparameterization.

The reference imposes, per foot (qm_interface/src/QMInterface.cpp:116-131):
  stance:  zero foot velocity          (3 eq, OCS2 ZeroVelocityConstraintCppAd)
  swing:   zero contact force          (3 eq, ZeroForceConstraint)
           foot normal velocity = ref  (1 eq, NormalVelocityConstraintCppAd)
and eliminates them inside the SQP via projection
(`projectStateInputEqualityConstraints true`, task.info:83).

TPU-native design: eliminate them ANALYTICALLY, outside the solver, by
reparameterizing the input

    u = u0(x, t) + N(x, t) @ w,        w in R^30 (same layout as u)

so the iLQR solver stays a clean unconstrained solver with static shapes.
The elimination is exact because each foot's constraints touch only that
leg's 3 joint velocities (the foot Jacobian has zero columns for other
legs and the arm):

  stance leg:  J_leg(3x3) u_leg = -J_base(3x6) base_dot(x)
                -> u_leg pinned (damped 3x3 solve), forces free.
  swing leg:   forces pinned to 0; one row a.u_leg = b pins the component
               of u_leg along a (a = z-row of J_leg); the rank-2 projector
               P = I - a a^T/|a|^2 leaves the tangential motion free.

Contact flags enter as multiplicative masks (floats), so one compiled
program covers every gait/mode — SURVEY.md §7 hard part #2.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import centroidal as C
from ..models import kinematics as K
from ..models.spec import (CONTACT_FRAMES, CONTACT_LEG_JOINTS, NUM_BASE,
                           NUM_CONTACTS, RobotModel)

_DAMP = 1e-6


class InputParam(NamedTuple):
    """u = u0 + N @ w at one (x, t) query."""
    u0: jnp.ndarray    # (30,)
    N: jnp.ndarray     # (30, 30)


def _foot_jacobians(model: RobotModel, q):
    """Per-foot linear Jacobian split: (4,3,6) base cols, (4,3,3) own-leg
    cols. Closed-form scalar-structured leg-chain kinematics (feet don't
    depend on the arm) — see models.chainfk.foot_kinematics; generic
    fallback for non-aliengo leg structures."""
    from ..models import chainfk
    try:
        chainfk.leg_chain(model)
    except AssertionError:
        _, Jb, Jl = K.foot_kinematics(model, q)
        return Jb, Jl
    _, Jb, Jl = chainfk.foot_kinematics(model, q)
    return Jb, Jl


def _damped_solve(A, b):
    """x with A x ~= b for (possibly singular) 3x3 A: A^T(AA^T + eps I)^-1 b.
    Unrolled Cramer solve — batched LU on (...,3,3) is slow on TPU."""
    from ..models.smallmat import mm3, mtv3, solve3
    AAt = mm3(A, jnp.swapaxes(A, -1, -2)) + _DAMP * jnp.eye(3, dtype=A.dtype)
    return mtv3(A, solve3(AAt, b))


def input_parameterization(model: RobotModel, info: C.CentroidalInfo,
                           x, contact_flags, swing_zdot_ref) -> InputParam:
    """Build (u0, N) at state x for the given contact flags (4,) in {0,1}
    and per-foot swing normal-velocity references (4,).

    positionErrorGain = 0 (task.info:11) so the normal-velocity constraint
    has no position feedback term — velocity-only, as configured.
    """
    dtype = x.dtype
    q = C.state_to_q(x)
    base_dot = C.base_velocity_from_momentum(info, x)            # (6,)
    Jb, Jl = _foot_jacobians(model, q)                           # (4,3,6),(4,3,3)
    c = jnp.asarray(contact_flags, dtype=dtype)                  # (4,)

    # stance: u_leg = -Jl^-1 Jb base_dot  (damped)
    rhs = -jnp.einsum("fij,j->fi", Jb, base_dot)                 # (4,3)
    u_stance = _damped_solve(Jl, rhs)          # broadcasts over the 4 feet

    # swing: a.u_leg = b with a = z-row of Jl, b = zdot_ref - z-row(Jb).base_dot
    a = Jl[:, 2, :]                                              # (4,3)
    b = swing_zdot_ref - Jb[:, 2, :] @ base_dot                  # (4,)
    aa = jnp.sum(a * a, axis=1) + _DAMP
    u_swing = a * (b / aa)[:, None]                              # (4,3)
    P_swing = (jnp.broadcast_to(jnp.eye(3, dtype=dtype), (4, 3, 3))
               - a[:, :, None] * a[:, None, :] / aa[:, None, None])

    # assemble u0 (30,)
    u0_forces = jnp.zeros((NUM_CONTACTS, 3), dtype=dtype)
    u0_legs = c[:, None] * u_stance + (1.0 - c[:, None]) * u_swing
    u0 = jnp.zeros(30, dtype=dtype)
    u0 = u0.at[:12].set(u0_forces.reshape(-1))
    # leg-velocity slots in u follow joint order (LF, LH, RF, RH) while feet
    # are ordered (LF, RF, LH, RH) — scatter per foot.
    N = jnp.zeros((30, 30), dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    for f in range(NUM_CONTACTS):
        fs = slice(3 * f, 3 * f + 3)                 # force slot of foot f
        j0 = 12 + CONTACT_LEG_JOINTS[f][0]
        js = slice(j0, j0 + 3)                       # joint-vel slot of foot f
        N = N.at[fs, fs].set(c[f] * eye3)
        N = N.at[js, js].set((1.0 - c[f]) * P_swing[f])
        u0 = u0.at[js].set(u0_legs[f])
    N = N.at[30 - 6:, 30 - 6:].set(jnp.eye(6, dtype=dtype))   # arm free
    return InputParam(u0=u0, N=N)


def apply_input_param(p: InputParam, w):
    return p.u0 + p.N @ w


def constraint_residuals(model: RobotModel, info: C.CentroidalInfo,
                         x, u, contact_flags, swing_zdot_ref):
    """Residuals of the three equality constraint families at (x, u).

    Returns dict of (4,3)/(4,3)/(4,) masked residuals (zero when inactive);
    used by tests and solver diagnostics, not by the solver itself.
    """
    dtype = x.dtype
    q = C.state_to_q(x)
    base_dot = C.base_velocity_from_momentum(info, x)
    Jb, Jl = _foot_jacobians(model, q)
    c = jnp.asarray(contact_flags, dtype=dtype)
    forces = u[:12].reshape(4, 3)
    u_legs = jnp.stack([u[12 + CONTACT_LEG_JOINTS[f][0]:
                          12 + CONTACT_LEG_JOINTS[f][0] + 3] for f in range(4)])
    v_feet = jnp.einsum("fij,j->fi", Jb, base_dot) + \
        jnp.einsum("fij,fj->fi", Jl, u_legs)                     # (4,3)
    return dict(
        zero_velocity=c[:, None] * v_feet,
        zero_force=(1.0 - c[:, None]) * forces,
        normal_velocity=(1.0 - c) * (v_feet[:, 2] - swing_zdot_ref),
    )
