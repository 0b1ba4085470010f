"""Rigid-body dynamics in pure JAX: mass matrix, bias forces, centroidal
momentum matrix, forward dynamics.

Replaces the reference's Pinocchio calls (crba, nonLinearEffects, dccrba;
qm_wbc/src/WbcBase.cpp:150-190, :219) with an energy-consistent autodiff
formulation:

  M(q)      = sum_b J_b^T I_b^world J_b        (composite over bodies)
  g(q)      = grad_q V(q),  V = sum_b m_b g z_com_b
  h(q,v)    = Mdot v - 1/2 grad_q (v^T M v) + g(q)     (Christoffel identity)
  A(q)      = sum_b T_b I_b^world J_b          (centroidal momentum matrix)

Mdot and Adot come from jvp along v — exact, no finite differences. Because
M and h derive from the same kinetic energy, energy conservation holds to
machine precision (tested in tests/test_dynamics.py).

All quantities use velocity coordinates = plain q-dot (see spec.py).
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .kinematics import all_body_jacobians, fk
from .rotations import skew
from .spec import RobotModel

GRAVITY = 9.81


def _world_spatial_inertias(model: RobotModel, cache):
    """(n,6,6) spatial inertia of each body about its frame origin, world axes.

    Ordering [linear; angular]:  I = [[m 1, -m S(c_w)], [m S(c_w), Ic_w - m S(c_w)^2]]
    where c_w = R @ com (world offset of the COM from the body origin).
    """
    R = cache["R"]
    m = jnp.asarray(model.mass, dtype=R.dtype)                      # (n,)
    c_w = jnp.einsum("nij,nj->ni", R, jnp.asarray(model.com, dtype=R.dtype))
    Ic_w = jnp.einsum("nij,njk,nlk->nil", R,
                      jnp.asarray(model.inertia, dtype=R.dtype), R)
    S = skew(c_w)                                                   # (n,3,3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), S.shape)
    top = jnp.concatenate([m[:, None, None] * eye, -m[:, None, None] * S], axis=2)
    bot = jnp.concatenate([m[:, None, None] * S,
                           Ic_w - m[:, None, None] * (S @ S)], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def mass_matrix(model: RobotModel, q):
    """(nq, nq) joint-space inertia matrix (reference: pinocchio::crba)."""
    cache = fk(model, q)
    J = all_body_jacobians(model, cache)          # (n,6,nq)
    I = _world_spatial_inertias(model, cache)     # (n,6,6)
    M = jnp.einsum("nik,nij,njl->kl", J, I, J)
    return 0.5 * (M + M.T)


def potential_energy(model: RobotModel, q):
    cache = fk(model, q)
    c_w = cache["p"] + jnp.einsum("nij,nj->ni", cache["R"],
                                  jnp.asarray(model.com, dtype=q.dtype))
    return GRAVITY * jnp.sum(jnp.asarray(model.mass, dtype=q.dtype) * c_w[:, 2])


def gravity_vector(model: RobotModel, q):
    # jacfwd, not grad: reverse-mode through the unrolled FK chain emits
    # scatter-heavy HLO that XLA:CPU compiles ~20x slower (measured 37 s
    # vs 2 s for this graph); forward mode vmaps one jvp body instead.
    return jax.jacfwd(partial(potential_energy, model))(q)


def kinetic_energy(model: RobotModel, q, v):
    return 0.5 * v @ mass_matrix(model, q) @ v


def nonlinear_effects(model: RobotModel, q, v):
    """h(q,v) = C(q,v)v + g(q)  (reference: pinocchio::nonLinearEffects)."""
    _, Mdot = jax.jvp(partial(mass_matrix, model), (q,), (v,))
    # forward-mode gradient (see gravity_vector): same values, but the
    # whole nonlinear_effects graph compiles in ~10 s instead of ~147 s
    # on XLA:CPU (the CI/dryrun platform).
    dTdq = jax.jacfwd(lambda qq: kinetic_energy(model, qq, v))(q)
    return Mdot @ v - dTdq + gravity_vector(model, q)


def com_position(model: RobotModel, q):
    cache = fk(model, q)
    m = jnp.asarray(model.mass, dtype=q.dtype)
    c_w = cache["p"] + jnp.einsum("nij,nj->ni", cache["R"],
                                  jnp.asarray(model.com, dtype=q.dtype))
    return (m[:, None] * c_w).sum(0) / m.sum()


def centroidal_momentum_matrix(model: RobotModel, q):
    """(6, nq) A(q) with h_com = A(q) v, [linear; angular] about the COM.

    Reference equivalent: pinocchio ccrba / OCS2 getCentroidalMomentumMatrix
    (used in WbcBase.cpp:219 via dccrba and the centroidal mapping).
    """
    cache = fk(model, q)
    J = all_body_jacobians(model, cache)          # (n,6,nq)
    I = _world_spatial_inertias(model, cache)     # (n,6,6)
    m = jnp.asarray(model.mass, dtype=q.dtype)
    c_w = cache["p"] + jnp.einsum("nij,nj->ni", cache["R"],
                                  jnp.asarray(model.com, dtype=q.dtype))
    com = (m[:, None] * c_w).sum(0) / m.sum()
    # momentum of body b about its origin -> translate to com:
    # lin' = lin ; ang' = ang + (o_b - com) x lin
    r = cache["p"] - com[None, :]                  # (n,3)
    S = skew(r)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), S.shape)
    zero = jnp.zeros_like(S)
    T = jnp.concatenate([jnp.concatenate([eye, zero], axis=2),
                         jnp.concatenate([S, eye], axis=2)], axis=1)  # (n,6,6)
    return jnp.einsum("nij,njk,nkl->il", T, I, J)


def centroidal_momentum_matrix_dot(model: RobotModel, q, v):
    """dA/dt via jvp (reference: pinocchio::dccrba)."""
    _, Adot = jax.jvp(partial(centroidal_momentum_matrix, model), (q,), (v,))
    return Adot


class RbdSuite(NamedTuple):
    """Every RBD/frame quantity the WBC needs from ONE FK pass.

    Designed so that jax.jacfwd of rbd_suite (one 24-tangent forward
    pass, lane-parallel) yields all the time-derivative terms (Mdot,
    Adot, dJ/dt) by contraction — the whole WBC model side becomes a
    single kernel-count-of-one-FK computation (latency-critical: the
    2 ms WBC deadline, BASELINE.md).
    """
    M: jnp.ndarray        # (24,24) mass matrix
    A: jnp.ndarray        # (6,24) centroidal momentum matrix
    Jc: jnp.ndarray       # (12,24) stacked contact Jacobian (linear)
    base_J: jnp.ndarray   # (6,24)
    ee_J: jnp.ndarray     # (6,24)
    feet_pos: jnp.ndarray  # (4,3)
    ee_pos: jnp.ndarray   # (3,)
    ee_R: jnp.ndarray     # (3,3)
    gvec: jnp.ndarray     # (24,) gravity generalized force (analytic)


def rbd_suite(model: RobotModel, q) -> RbdSuite:
    """One FK pass -> (M, A, frame Jacobians, gravity vector).

    Gravity is closed-form (dV/dq_k = g sum_b m_b dz(com_b)/dq_k via the
    com-point Jacobian z-rows) — no autodiff pass.
    """
    from .kinematics import frame_kinematics
    cache = fk(model, q)
    J = all_body_jacobians(model, cache)          # (n,6,nq)
    I = _world_spatial_inertias(model, cache)     # (n,6,6)
    M = jnp.einsum("nik,nij,njl->kl", J, I, J)
    M = 0.5 * (M + M.T)

    m = jnp.asarray(model.mass, dtype=q.dtype)
    c_w = cache["p"] + jnp.einsum("nij,nj->ni", cache["R"],
                                  jnp.asarray(model.com, dtype=q.dtype))
    com = (m[:, None] * c_w).sum(0) / m.sum()
    r = cache["p"] - com[None, :]
    S = skew(r)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), S.shape)
    zero = jnp.zeros_like(S)
    T = jnp.concatenate([jnp.concatenate([eye, zero], axis=2),
                         jnp.concatenate([S, eye], axis=2)], axis=1)
    A = jnp.einsum("nij,njk,nkl->il", T, I, J)

    # analytic gravity: z-row of each body-com point Jacobian
    a, o = cache["a"], cache["o"]                 # (k,3)
    rev = jnp.asarray(model.joint_type == 1, dtype=q.dtype)       # (k,)
    mask = jnp.asarray(model.ancestor, dtype=q.dtype)             # (k,b)
    rc = c_w[None, :, :] - o[:, None, :]          # (k,b,3)
    cross_z = a[:, None, 0] * rc[:, :, 1] - a[:, None, 1] * rc[:, :, 0]
    lin_z = rev[:, None] * cross_z + (1.0 - rev)[:, None] * a[:, None, 2]
    gvec = GRAVITY * jnp.einsum("b,kb->k", m, lin_z * mask)

    Jc, base_J, ee_J, feet_pos, ee_pos, ee_R = frame_kinematics(
        model, q, cache=cache)
    return RbdSuite(M=M, A=A, Jc=Jc, base_J=base_J, ee_J=ee_J,
                    feet_pos=feet_pos, ee_pos=ee_pos, ee_R=ee_R, gvec=gvec)


def forward_dynamics(model: RobotModel, q, v, tau, J_c=None, f_c=None):
    """v_dot = M^{-1} (tau + J_c^T f_c - h). tau is the full (nq,) force."""
    M = mass_matrix(model, q)
    h = nonlinear_effects(model, q, v)
    rhs = tau - h
    if J_c is not None:
        rhs = rhs + J_c.T @ f_c
    return jnp.linalg.solve(M, rhs)
