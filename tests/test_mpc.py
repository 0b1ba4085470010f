"""MPC smoke tests on a reduced horizon (compile-time friendly on CPU).

The full-horizon (N=66) standing/trot parity scenario runs in the
integration suite / on hardware via bench.py.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from qm_control_tpu.config import MpcConfig, QmConfig
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.mpc.mpc import MpcSolver, evaluate_policy
from qm_control_tpu.ocp.reference import target_from_knots


@pytest.fixture(scope="module")
def info(model):
    return C.make_centroidal_info(model)


@pytest.fixture(scope="module")
def small_cfg():
    return QmConfig().with_(mpc=MpcConfig(time_horizon=0.24, dt=0.04,
                                          num_iterations=1))


def _standing_state():
    q = default_q(base_pos=(0.0, 0.0, 0.4))
    x = np.zeros(30, dtype=np.float32)
    x[6:30] = q
    return jnp.asarray(x)


def _standing_target(x):
    s = np.zeros(37)
    s[:30] = np.asarray(x)
    s[30:33] = [0.52, 0.09, 0.78]         # EE roughly above mount
    s[33:37] = [0.5, -0.5, 0.5, -0.5]     # reference quat_init (x,y,z,w)
    return target_from_knots([0.0, 2.0], [s, s])


@pytest.mark.heavy
def test_standing_mpc_solve(model, info, small_cfg):
    x0 = _standing_state()
    target = _standing_target(x0)
    gs = GaitSchedule(GAIT_LIBRARY["stance"])
    ms = gs.mode_schedule(0.0, 2.0)
    mpc = MpcSolver(model, info, small_cfg)
    policy = mpc.solve(0.0, x0, target, ms)
    assert np.isfinite(float(policy.cost))
    # stance: every node's forces sum close to total weight
    U = np.asarray(policy.U)
    fz_total = U[:, 2] + U[:, 5] + U[:, 8] + U[:, 11]
    np.testing.assert_allclose(fz_total[:-1], model.total_mass * 9.81,
                               rtol=0.2)
    # base stays near the target height across the horizon
    X = np.asarray(policy.X)
    np.testing.assert_allclose(X[:, 8], 0.4, atol=0.05)
    # all nodes in STANCE mode
    assert (np.asarray(policy.modes) == 15).all()


@pytest.mark.heavy
def test_warm_started_resolve_and_policy_eval(model, info, small_cfg):
    x0 = _standing_state()
    target = _standing_target(x0)
    gs = GaitSchedule(GAIT_LIBRARY["stance"])
    ms = gs.mode_schedule(0.0, 2.0)
    mpc = MpcSolver(model, info, small_cfg)
    p1 = mpc.solve(0.0, x0, target, ms)
    x_next, _, _ = evaluate_policy(p1, 0.01)
    p2 = mpc.solve(0.01, x_next, target, ms)  # warm-started path
    assert np.isfinite(float(p2.cost))
    x_des, u_des, mode = evaluate_policy(p2, 0.05)
    assert x_des.shape == (30,) and u_des.shape == (30,)
    assert int(mode) == 15
    # interpolation stays inside the node hull
    assert float(x_des[8]) == pytest.approx(0.4, abs=0.05)


def test_shift_warm_start_fractional_interpolation():
    """Sub-node shifts must interpolate, not round to zero (ADVICE r1 #3:
    with a 10 ms MPC period and 15 ms nodes an integer shift would leave
    the warm start permanently one period stale)."""
    from qm_control_tpu.mpc.mpc import shift_warm_start
    dt = 0.015
    W = jnp.arange(10, dtype=jnp.float32)[:, None] * jnp.ones((1, 3))
    # shift of 2/3 node: node k picks up value k + 2/3
    out = np.asarray(shift_warm_start(W, jnp.asarray(0.010 / dt * dt,
                                                     jnp.float32), dt))
    np.testing.assert_allclose(out[0], 2.0 / 3.0, atol=1e-5)
    np.testing.assert_allclose(out[5], 5 + 2.0 / 3.0, atol=1e-4)
    # tail clamps to the last value
    np.testing.assert_allclose(out[-1], 9.0, atol=1e-5)
    # integer shift reproduces exact node shifting
    out2 = np.asarray(shift_warm_start(W, jnp.asarray(2 * dt, jnp.float32),
                                       dt))
    np.testing.assert_allclose(out2[:8, 0], np.arange(2, 10), atol=1e-4)
    # zero shift is the identity
    out3 = np.asarray(shift_warm_start(W, jnp.asarray(0.0), dt))
    np.testing.assert_allclose(out3, np.asarray(W), atol=0)
