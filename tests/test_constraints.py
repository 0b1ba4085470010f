"""Equality-constraint elimination: residuals vanish on the reparameterized
input manifold u = u0 + N w (ocp/constraints.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.ocp.constraints import (apply_input_param,
                                            constraint_residuals,
                                            input_parameterization)


@pytest.fixture(scope="module")
def info(model):
    return C.make_centroidal_info(model)


def _rand_state(rng):
    x = np.zeros(30, dtype=np.float32)
    x[:6] = 0.1 * rng.standard_normal(6)           # momentum
    q = default_q(base_pos=(0.02, -0.01, 0.42), base_zyx=(0.1, 0.03, -0.05))
    x[6:30] = q + 0.05 * rng.standard_normal(24)
    return jnp.asarray(x)


@pytest.mark.parametrize("flags", [(1, 1, 1, 1), (0, 0, 0, 0), (1, 0, 0, 1),
                                   (0, 1, 1, 0)])
def test_residuals_vanish_on_manifold(model, info, rng, flags):
    x = _rand_state(rng)
    zdot = jnp.asarray(rng.uniform(-0.3, 0.3, 4), dtype=jnp.float32)
    p = input_parameterization(model, info, x, jnp.asarray(flags,
                                                           dtype=jnp.float32),
                               zdot)
    for _ in range(3):
        w = jnp.asarray(rng.standard_normal(30) * 10.0, dtype=jnp.float32)
        u = apply_input_param(p, w)
        res = constraint_residuals(model, info, x, u,
                                   jnp.asarray(flags, dtype=jnp.float32),
                                   zdot)
        np.testing.assert_allclose(np.asarray(res["zero_velocity"]), 0,
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(res["zero_force"]), 0,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(res["normal_velocity"]), 0,
                                   atol=2e-3)


def test_stance_forces_and_arm_are_free(model, info, rng):
    """Force components (stance) and arm velocities pass through w exactly."""
    x = _rand_state(rng)
    flags = jnp.ones(4, dtype=jnp.float32)
    p = input_parameterization(model, info, x, flags, jnp.zeros(4))
    w = jnp.asarray(rng.standard_normal(30), dtype=jnp.float32)
    u = apply_input_param(p, w)
    np.testing.assert_allclose(np.asarray(u[:12]), np.asarray(w[:12]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(u[24:]), np.asarray(w[24:]),
                               atol=1e-6)


def test_swing_foot_tracks_zdot_reference(model, info, rng):
    """With all feet swinging, the resulting foot z-velocity equals the
    reference regardless of w."""
    from qm_control_tpu.models import kinematics as K
    x = _rand_state(rng)
    flags = jnp.zeros(4, dtype=jnp.float32)
    zdot = jnp.asarray([0.25, -0.1, 0.05, 0.3], dtype=jnp.float32)
    p = input_parameterization(model, info, x, flags, zdot)
    w = jnp.asarray(rng.standard_normal(30), dtype=jnp.float32)
    u = apply_input_param(p, w)
    q = C.state_to_q(x)
    base_dot = C.base_velocity_from_momentum(info, x)
    v = jnp.concatenate([base_dot, u[12:]])
    J = K.stacked_contact_jacobian(model, q)
    v_feet = (J @ v).reshape(4, 3)
    np.testing.assert_allclose(np.asarray(v_feet[:, 2]), np.asarray(zdot),
                               atol=2e-3)
