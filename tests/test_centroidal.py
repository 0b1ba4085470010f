"""Centroidal model tests: flow map physics, SRBD consistency, conversions."""
import jax
import jax.numpy as jnp
import numpy as np

from qm_control_tpu.models import NQ, NUM_JOINTS, default_q
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models import dynamics as D
from qm_control_tpu.models import kinematics as K


def make_info(model):
    return C.make_centroidal_info(model)


def standing_state(model, info):
    q = default_q()
    x = np.zeros(C.STATE_DIM, dtype=np.float32)
    x[6:6 + NQ] = q
    return jnp.asarray(x)


def test_weight_compensating_equilibrium(model):
    """Standing with gravity-compensating forces: linear momentum rate == 0
    and base/joint rates == 0 (the MPC warm-start point, QMInitializer).
    Note: equal force distribution leaves a small residual torque because
    the arm shifts the COM off the feet centroid (reference behaves the
    same — weightCompensatingInput is a warm start, not an equilibrium)."""
    info = make_info(model)
    x = standing_state(model, info)
    u = C.weight_compensating_input(info, jnp.array([1, 1, 1, 1]))
    xdot = C.flow_map(model, info, x, u)
    np.testing.assert_allclose(np.asarray(xdot[:3]), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(xdot[6:]), 0.0, atol=1e-4)
    assert float(jnp.abs(xdot[3:6]).max()) < 1.0  # residual COM torque, small


def test_momentum_rate_gravity_only(model):
    """Zero forces in flight: vdot_com = -g, angular rate = 0."""
    info = make_info(model)
    x = standing_state(model, info)
    u = jnp.zeros(C.INPUT_DIM)
    xdot = C.flow_map(model, info, x, u)
    np.testing.assert_allclose(np.asarray(xdot[:6]),
                               [0, 0, -C.GRAVITY, 0, 0, 0], atol=1e-5)


def test_torque_from_offset_force(model):
    """A pure-z force at a foot produces angular momentum rate r x f / m."""
    info = make_info(model)
    x = standing_state(model, info)
    q = C.state_to_q(x)
    p_feet = np.asarray(K.contact_positions(model, q))
    p_com = np.asarray(C.com_position_srbd(info, x))
    f = np.zeros((4, 3), dtype=np.float32)
    f[0, 2] = 100.0   # LF foot
    u = jnp.asarray(np.concatenate([f.reshape(-1), np.zeros(NUM_JOINTS)]),
                    dtype=jnp.float32)
    xdot = np.asarray(C.flow_map(model, info, x, u))
    expected_ang = np.cross(p_feet[0] - p_com, f[0]) / info.mass
    np.testing.assert_allclose(xdot[3:6], expected_ang, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(xdot[0:3], [0, 0, 100.0 / info.mass - C.GRAVITY],
                               rtol=1e-4)


def test_rbd_centroidal_roundtrip(model, rng):
    """centroidal_state_from_rbd and base_velocity_from_momentum invert."""
    info = make_info(model)
    q = jnp.asarray(default_q() + rng.normal(size=NQ) * 0.1, dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=NQ).astype(np.float32) * 0.5)
    x = C.centroidal_state_from_rbd(model, info, q, v)
    v_back = C.rbd_velocity_from_centroidal(info, x, v_joints=v[6:])
    np.testing.assert_allclose(np.asarray(v_back), np.asarray(v),
                               atol=1e-4, rtol=1e-4)


def test_srbd_vs_full_momentum_at_nominal(model):
    """At the nominal configuration the SRBD momentum map equals the full
    CMM-based map (they differ only away from nominal)."""
    info = make_info(model)
    q = jnp.asarray(default_q(base_pos=(0, 0, 0)), dtype=jnp.float32)
    rngv = np.random.default_rng(1)
    v = jnp.asarray(rngv.normal(size=NQ).astype(np.float32) * 0.3)
    v = v.at[6:].set(0.0)   # SRBD ignores joint momentum
    x_srbd = C.centroidal_state_from_rbd(model, info, q, v)
    x_full = C.full_centroidal_state_from_rbd(model, q, v)
    np.testing.assert_allclose(np.asarray(x_srbd[:6]), np.asarray(x_full[:6]),
                               atol=1e-4, rtol=1e-3)


def test_linearization_shapes_and_fd(model, rng):
    info = make_info(model)
    x = standing_state(model, info) + jnp.asarray(
        rng.normal(size=C.STATE_DIM).astype(np.float32) * 0.05)
    u = C.weight_compensating_input(info, jnp.array([1, 1, 1, 1]))
    A, B = C.linearize_flow_map(model, info, x, u)
    assert A.shape == (30, 30) and B.shape == (30, 30)
    # finite-difference spot check along random directions
    dx = rng.normal(size=30).astype(np.float32) * 1e-3
    f0 = C.flow_map(model, info, x, u)
    f1 = C.flow_map(model, info, x + jnp.asarray(dx), u)
    np.testing.assert_allclose(np.asarray(f1 - f0), np.asarray(A) @ dx,
                               atol=1e-4)
