"""Dynamics unit tests: mass matrix properties, energy conservation,
centroidal momentum consistency, gravity force sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_control_tpu.models import NQ, default_q
from qm_control_tpu.models import dynamics as D
from qm_control_tpu.models import kinematics as K


def rand_qv(rng, scale=0.4):
    q = jnp.asarray(default_q() + rng.normal(size=NQ) * scale, dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=NQ).astype(np.float32))
    return q, v


def test_mass_matrix_spd(model, rng):
    q, _ = rand_qv(rng)
    M = np.asarray(D.mass_matrix(model, q))
    np.testing.assert_allclose(M, M.T, atol=1e-5)
    w = np.linalg.eigvalsh(M)
    assert w.min() > 1e-6, w.min()
    # total mass appears in the translational block
    np.testing.assert_allclose(M[:3, :3], model.total_mass * np.eye(3),
                               atol=1e-3)


def test_gravity_standing(model):
    """At rest, gravity generalized force: z-component = m g; x,y = 0."""
    q = jnp.asarray(default_q(), dtype=jnp.float32)
    g = np.asarray(D.gravity_vector(model, q))
    np.testing.assert_allclose(g[0], 0.0, atol=1e-4)
    np.testing.assert_allclose(g[1], 0.0, atol=1e-4)
    np.testing.assert_allclose(g[2], model.total_mass * D.GRAVITY, rtol=1e-5)


def test_nle_matches_gravity_at_rest(model, rng):
    q, _ = rand_qv(rng)
    h = D.nonlinear_effects(model, q, jnp.zeros(NQ, dtype=q.dtype))
    g = D.gravity_vector(model, q)
    np.testing.assert_allclose(np.asarray(h), np.asarray(g), atol=1e-4)


@pytest.mark.heavy
def test_energy_conservation(model, rng):
    """Unforced dynamics conserve total energy (RK4, double precision step)."""
    q, v = rand_qv(rng, scale=0.2)
    v = v * 0.3

    def deriv(state):
        q, v = state[:NQ], state[NQ:]
        vd = D.forward_dynamics(model, q, v, jnp.zeros(NQ, dtype=q.dtype))
        return jnp.concatenate([v, vd])

    def rk4(state, dt):
        k1 = deriv(state)
        k2 = deriv(state + 0.5 * dt * k1)
        k3 = deriv(state + 0.5 * dt * k2)
        k4 = deriv(state + dt * k3)
        return state + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    s = jnp.concatenate([q, v])
    E0 = float(D.kinetic_energy(model, q, v) + D.potential_energy(model, q))
    step = jax.jit(rk4, static_argnums=())
    dt = 1e-3
    for _ in range(50):
        s = step(s, dt)
    qf, vf = s[:NQ], s[NQ:]
    E1 = float(D.kinetic_energy(model, qf, vf) + D.potential_energy(model, qf))
    assert abs(E1 - E0) / max(abs(E0), 1.0) < 2e-3, (E0, E1)


def test_centroidal_momentum_consistency(model, rng):
    """A(q) v linear part == total mass * com velocity."""
    q, v = rand_qv(rng)
    A = D.centroidal_momentum_matrix(model, q)
    h = A @ v
    # com velocity via jvp of com position
    _, com_dot = jax.jvp(lambda qq: D.com_position(model, qq), (q,), (v,))
    np.testing.assert_allclose(np.asarray(h[:3]),
                               model.total_mass * np.asarray(com_dot),
                               atol=1e-3, rtol=1e-4)


def test_centroidal_momentum_rate(model, rng):
    """d/dt (A v) with gravity-only forcing = total gravity wrench at COM."""
    q, v = rand_qv(rng, scale=0.2)
    vd = D.forward_dynamics(model, q, v, jnp.zeros(NQ, dtype=q.dtype))
    A = D.centroidal_momentum_matrix(model, q)
    Adot = D.centroidal_momentum_matrix_dot(model, q, v)
    hdot = np.asarray(A @ vd + Adot @ v)
    expected = np.array([0, 0, -model.total_mass * D.GRAVITY, 0, 0, 0])
    np.testing.assert_allclose(hdot, expected, atol=5e-2)


def test_mdot_skew_property(model, rng):
    """Mdot - 2C is skew-symmetric <=> passivity; verify via energy identity:
    v^T (Mdot v - 2(h - g)) == ... use d/dt(KE) = v^T (tau - h + g) check."""
    q, v = rand_qv(rng)
    h = D.nonlinear_effects(model, q, v)
    g = D.gravity_vector(model, q)
    _, Mdot = jax.jvp(lambda qq: D.mass_matrix(model, qq), (q,), (v,))
    # v^T C v == 1/2 v^T Mdot v
    lhs = float(v @ (h - g))
    rhs = 0.5 * float(v @ Mdot @ v)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3, atol=1e-3)
