"""Scalar-structured chain kinematics (models/chainfk.py) vs the generic
tree FK — the chain forms must agree exactly (same model, same frames).

Reference semantics being preserved: Pinocchio frame placements /
Jacobians as used by QMPreComputation.cpp:50-89 and the OCS2 EE
kinematics (QMInterface.cpp:363-379).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models import chainfk
from qm_control_tpu.models import kinematics as K
from qm_control_tpu.models.spec import (CONTACT_FRAMES, CONTACT_LEG_JOINTS,
                                        EE_FRAME, NUM_BASE)


@pytest.fixture(scope="module")
def qs(model):
    rng = np.random.default_rng(7)
    return [jnp.asarray(rng.normal(size=24) * 0.7, dtype=jnp.float32)
            for _ in range(3)]


def test_foot_positions_match_tree_fk(model, qs):
    for q in qs:
        cache = K.fk(model, q)
        ref = jnp.stack([K.frame_pose(model, cache, f)[0]
                         for f in CONTACT_FRAMES])
        fast = chainfk.contact_positions(model, q)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=1e-5)


def test_foot_jacobians_match_tree_fk(model, qs):
    for q in qs:
        cache = K.fk(model, q)
        p_feet, Jb, Jl = chainfk.foot_kinematics(model, q)
        for i, f in enumerate(CONTACT_FRAMES):
            fr = model.frame(f)
            p_f, _ = K.frame_pose(model, cache, f)
            J = K.point_jacobian(model, cache, p_f, fr.body)[:3]
            np.testing.assert_allclose(np.asarray(Jb[i]),
                                       np.asarray(J[:, :NUM_BASE]),
                                       atol=1e-5)
            cols = [NUM_BASE + j for j in CONTACT_LEG_JOINTS[i]]
            np.testing.assert_allclose(np.asarray(Jl[i]),
                                       np.asarray(J[:, cols]), atol=1e-5)
            np.testing.assert_allclose(np.asarray(p_feet[i]),
                                       np.asarray(p_f), atol=1e-5)


def test_ee_pose_matches_tree_fk(model, qs):
    for q in qs:
        cache = K.fk(model, q)
        ref_p, ref_R = K.frame_pose(model, cache, EE_FRAME)
        p, R = chainfk.ee_pose(model, q)
        np.testing.assert_allclose(np.asarray(p), np.asarray(ref_p),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(R), np.asarray(ref_R),
                                   atol=1e-5)


def test_base_velocity_scalar_form(model, qs):
    """chainfk.base_velocity_from_momentum vs the direct matrix algebra."""
    from qm_control_tpu.models.rotations import (
        euler_zyx_rate_to_omega_world_matrix, euler_zyx_to_R)
    info = C.make_centroidal_info(model)
    rng = np.random.default_rng(3)
    for _ in range(3):
        x = jnp.asarray(rng.normal(size=30) * 0.4, dtype=jnp.float32)
        R = euler_zyx_to_R(x[9:12])
        E = euler_zyx_rate_to_omega_world_matrix(x[9:12])
        I_w = R @ jnp.asarray(info.I_com_base, dtype=x.dtype) @ R.T
        omega = jnp.linalg.solve(I_w, info.mass * x[3:6])
        r_w = R @ jnp.asarray(info.r_com_base, dtype=x.dtype)
        ref = jnp.concatenate([x[0:3] - jnp.cross(omega, r_w),
                               jnp.linalg.solve(E, omega)])
        new = C.base_velocity_from_momentum(info, x)
        np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                                   atol=1e-4)


def test_chain_jacobians_differentiate(model, qs):
    """jacfwd through the chain FK agrees with the closed-form Jacobian
    (the solver differentiates through these chains)."""
    q = qs[0]
    Jpos = jax.jacfwd(lambda qq: chainfk.contact_positions(model, qq))(q)
    _, Jb, Jl = chainfk.foot_kinematics(model, q)
    for i in range(4):
        np.testing.assert_allclose(np.asarray(Jpos[i, :, :NUM_BASE]),
                                   np.asarray(Jb[i]), atol=1e-4)
        cols = [NUM_BASE + j for j in CONTACT_LEG_JOINTS[i]]
        np.testing.assert_allclose(np.asarray(Jpos[i][:, cols]),
                                   np.asarray(Jl[i]), atol=1e-4)
