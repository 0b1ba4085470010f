"""Kinematics unit tests: FK sanity, Jacobians vs autodiff, Jdot."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_control_tpu.models import (CONTACT_FRAMES, EE_FRAME, NQ, default_q)
from qm_control_tpu.models import kinematics as K
from qm_control_tpu.models.rotations import (R_to_euler_zyx, euler_zyx_to_R,
                                             quat_to_R, R_to_quat, quat_slerp,
                                             quat_mul, quat_conj,
                                             euler_zyx_rate_to_omega_world_matrix)


def rand_q(rng, scale=0.5):
    q = np.asarray(default_q(), dtype=np.float32)
    dq = rng.normal(size=NQ).astype(np.float32) * scale
    return jnp.asarray(q + dq)


def test_rotation_roundtrip(rng):
    zyx = jnp.asarray(rng.uniform(-1.2, 1.2, size=(50, 3)), dtype=jnp.float32)
    R = euler_zyx_to_R(zyx)
    back = R_to_euler_zyx(R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(zyx), atol=1e-5)
    q = R_to_quat(R)
    R2 = quat_to_R(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_quat_slerp_endpoints(rng):
    a = rng.normal(size=4).astype(np.float32)
    b = rng.normal(size=4).astype(np.float32)
    qa = jnp.asarray(a / np.linalg.norm(a))
    qb = jnp.asarray(b / np.linalg.norm(b))
    q0 = quat_slerp(qa, qb, 0.0)
    q1 = quat_slerp(qa, qb, 1.0)
    assert min(np.linalg.norm(q0 - qa), np.linalg.norm(q0 + qa)) < 1e-5
    assert min(np.linalg.norm(q1 - qb), np.linalg.norm(q1 + qb)) < 1e-5
    # midpoint is unit and equidistant
    qm = quat_slerp(qa, qb, 0.5)
    assert abs(np.linalg.norm(qm) - 1) < 1e-5


def test_fk_standing_pose(model):
    """Feet at ground level when the base stands at its 0.4 m COM height
    with the default joint state (reference task.info initialState)."""
    q = jnp.asarray(default_q(), dtype=jnp.float32)
    cache = K.fk(model, q)
    for f in CONTACT_FRAMES:
        p, _ = K.frame_pose(model, cache, f)
        # thigh 0.25 + calf 0.25 at (0.8, -1.5) knee bend -> foot z near 0
        assert abs(float(p[2])) < 0.06, (f, p)
        assert 0.10 < abs(float(p[1])) < 0.35  # lateral offset (0.051+0.0868)
    p_ee, _ = K.frame_pose(model, cache, EE_FRAME)
    assert float(p_ee[2]) > 0.4  # arm EE above base


def test_frame_jacobian_vs_autodiff(model, rng):
    q = rand_q(rng)
    for name in (EE_FRAME, "LF_FOOT", "base"):
        J = K.frame_jacobian(model, q, name)
        # linear rows = d p / d q
        Jp = jax.jacfwd(lambda qq: K.frame_pose(model, K.fk(model, qq), name)[0])(q)
        np.testing.assert_allclose(np.asarray(J[:3]), np.asarray(Jp),
                                   atol=2e-5, rtol=1e-4)
        # angular rows: omega = unskew(Rdot R^T) for each coordinate direction
        JR = jax.jacfwd(lambda qq: K.frame_pose(model, K.fk(model, qq), name)[1])(q)
        R = K.frame_pose(model, K.fk(model, q), name)[1]
        for k in range(NQ):
            W = JR[:, :, k] @ R.T
            w = np.array([W[2, 1], W[0, 2], W[1, 0]])
            np.testing.assert_allclose(np.asarray(J[3:, k]), w, atol=2e-5)


def test_base_jacobian_structure(model, rng):
    """Base Jacobian: linear part [I3, 0...]; angular = Euler-rate map E."""
    q = rand_q(rng)
    J = K.frame_jacobian(model, q, "base")
    np.testing.assert_allclose(np.asarray(J[:3, :3]), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(J[:3, 3:]), 0.0, atol=1e-6)
    E = euler_zyx_rate_to_omega_world_matrix(q[3:6])
    np.testing.assert_allclose(np.asarray(J[3:, 3:6]), np.asarray(E), atol=1e-5)
    np.testing.assert_allclose(np.asarray(J[3:, 6:]), 0.0, atol=1e-6)


def test_jacobian_dot_finite_difference(model, rng):
    q = rand_q(rng)
    v = jnp.asarray(rng.normal(size=NQ).astype(np.float32))
    eps = 1e-3
    Jd = K.frame_jacobian_dot(model, q, v, EE_FRAME)
    J1 = K.frame_jacobian(model, q + eps * v, EE_FRAME)
    J0 = K.frame_jacobian(model, q - eps * v, EE_FRAME)
    np.testing.assert_allclose(np.asarray(Jd), np.asarray((J1 - J0) / (2 * eps)),
                               atol=5e-3, rtol=1e-2)


def test_contact_jacobian_stack(model, rng):
    q = rand_q(rng)
    Jc = K.stacked_contact_jacobian(model, q)
    assert Jc.shape == (12, NQ)
    # arm joints never move the feet
    np.testing.assert_allclose(np.asarray(Jc[:, 18:]), 0.0, atol=1e-7)
    # rows match per-frame jacobians
    for i, f in enumerate(CONTACT_FRAMES):
        J = K.frame_jacobian(model, q, f)
        np.testing.assert_allclose(np.asarray(Jc[3 * i:3 * i + 3]),
                                   np.asarray(J[:3]), atol=1e-6)


def test_fk_vmap_and_jit(model, rng):
    qs = jnp.stack([rand_q(rng) for _ in range(8)])
    f = jax.jit(jax.vmap(lambda q: K.contact_positions(model, q)))
    out = f(qs)
    assert out.shape == (8, 4, 3)
    single = K.contact_positions(model, qs[3])
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(single), atol=1e-6)
