"""Runtime layer: plant physics, estimator round-trip, closed loop.

The closed-loop standing test is the reference's Gazebo-validation
equivalent (SURVEY.md §4 item 1) on a reduced horizon.
"""
import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_control_tpu.config import MpcConfig, QmConfig
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.ocp.reference import target_from_knots
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant,
                                              rbd_to_qv)
from qm_control_tpu.runtime.loop import ControlLoop, LoopConfig
from qm_control_tpu.runtime.plant import (HybridCommand, PlantConfig,
                                          init_plant_state, make_plant_step,
                                          push_command)
from qm_control_tpu.runtime.safety import safety_check


@pytest.fixture(scope="module")
def info(model):
    return C.make_centroidal_info(model)


def _standing_q(z=0.38):
    # feet touch the ground at base height ~0.38 for the default stance
    return jnp.asarray(default_q(base_pos=(0.0, 0.0, z)), dtype=jnp.float32)


def test_plant_pd_hold_stands(model):
    """PD-hold on all joints: the plant settles near the initial pose."""
    q0 = _standing_q()
    state = init_plant_state(q0)
    cmd = HybridCommand(
        pos_des=q0[6:], vel_des=jnp.zeros(18),
        kp=jnp.concatenate([200.0 * jnp.ones(12), 300.0 * jnp.ones(6)]),
        kd=jnp.concatenate([8.0 * jnp.ones(12), 10.0 * jnp.ones(6)]),
        ff=jnp.zeros(18))
    step = make_plant_step(model, PlantConfig(delay_steps=0))

    def tick(s, _):
        s = push_command(s, cmd)
        s, fc = step(s)
        return s, (s.q[2], fc)
    run = jax.jit(lambda s: jax.lax.scan(tick, s, None, length=1000))
    state, (heights, fcs) = run(state)
    h = np.asarray(heights)
    assert np.isfinite(h).all()
    # base settles and does not collapse or bounce away
    assert 0.25 < h[-1] < 0.5
    assert np.abs(h[-200:] - h[-1]).max() < 0.02
    # ground supports the robot: total normal force ~ weight at the end
    fz = np.asarray(fcs)[:, :, 2].sum(axis=1)
    np.testing.assert_allclose(fz[-100:].mean(), model.total_mass * 9.81,
                               rtol=0.15)


@pytest.mark.heavy
def test_plant_actuation_delay(model):
    """The delay line replays commands delay_steps old."""
    q0 = _standing_q()
    step_now = make_plant_step(model, PlantConfig(delay_steps=0))
    step_del = make_plant_step(model, PlantConfig(delay_steps=8))
    s_now = init_plant_state(q0)
    s_del = init_plant_state(q0)
    kick = HybridCommand(pos_des=q0[6:], vel_des=jnp.zeros(18),
                         kp=jnp.zeros(18), kd=jnp.zeros(18),
                         ff=20.0 * jnp.ones(18))
    for i in range(4):
        s_now = push_command(s_now, kick)
        s_del = push_command(s_del, kick)
        s_now, _ = step_now(s_now)
        s_del, _ = step_del(s_del)
    # delayed plant has not seen the kick yet -> slower joints
    assert float(jnp.abs(s_del.v[6:]).max()) < float(jnp.abs(s_now.v[6:]).max())


def test_estimator_round_trip(model, info, rng):
    q = jnp.asarray(default_q(base_pos=(0.1, -0.2, 0.42),
                              base_zyx=(0.4, 0.1, -0.05)), dtype=jnp.float32)
    v = jnp.asarray(0.3 * rng.standard_normal(24), dtype=jnp.float32)
    rbd = rbd_state_from_plant(model, q, v)
    assert rbd.shape == (55,)
    q2, v2 = rbd_to_qv(rbd)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-4)
    x = observation_from_rbd(model, info, rbd)
    assert x.shape == (30,)
    np.testing.assert_allclose(np.asarray(x[6:30]), np.asarray(q), atol=1e-5)


def test_safety_check():
    x = jnp.zeros(30).at[8].set(0.4)
    assert bool(safety_check(x))
    assert not bool(safety_check(x.at[11].set(2.0)))      # rolled over
    assert not bool(safety_check(x.at[8].set(0.02)))      # collapsed
    assert not bool(safety_check(x.at[0].set(jnp.nan)))   # NaN state
    assert not bool(safety_check(x, policy_cost=jnp.asarray(jnp.inf)))


@pytest.mark.slow
def test_closed_loop_standing(model, info):
    """Standing closed loop over 0.5 s of sim time: robot stays up near
    the target height, EE holds its pose, safety holds.

    NOTE: the MPC horizon must be long enough for the arm to re-posture
    within-horizon (its velocity limits are tight); short horizons
    (<~0.4 s) make base drift the 'cheap' correction and the loop walks
    away — matching why the reference uses a 1.0 s horizon.
    """
    cfg = QmConfig().with_(mpc=MpcConfig(time_horizon=0.5, dt=0.025,
                                         num_iterations=1))
    cfg = cfg.with_(wbc=dataclasses.replace(cfg.wbc, arm_settling_time=0.0))
    loop = ControlLoop(model, info, cfg, LoopConfig())
    q0 = _standing_q()
    carry = loop.init_carry(q0)
    s = np.zeros(37)
    s[:30] = np.asarray(jnp.concatenate([jnp.zeros(6), q0]))
    s[8] = 0.4
    s[30:33] = [0.52, 0.09, 0.78]
    s[33:37] = [0.5, -0.5, 0.5, -0.5]
    target = target_from_knots([0.0, 5.0], [s, s])
    ms = GaitSchedule(GAIT_LIBRARY["stance"]).mode_schedule(0.0, 5.0)
    carry = loop.warmup(carry, target, ms, num_solves=15)
    carry, metrics = loop.run(carry, target, ms, num_cycles=50)
    heights = np.asarray(metrics.base_height)
    assert np.isfinite(heights).all()
    assert bool(np.asarray(metrics.safe)[-1]), "safety tripped"
    assert 0.36 < heights[-1] < 0.42, heights
    # EE holds the commanded pose
    assert float(np.asarray(metrics.ee_pos_err)[-1]) < 0.02


@pytest.mark.slow
def test_trot_in_place_stays_finite():
    """Regression: a f32-broken Cholesky pivot in the WBC IP solver used
    to NaN-poison the whole control cycle within ~10 ms of trot gait
    (round 2); the pivoted-GJ solve with pivot floor must keep the loop
    finite and safe."""
    import numpy as np
    from qm_control_tpu.experiments import _default_cfg, _standing_setup
    from qm_control_tpu.runtime.loop import ControlLoop, LoopConfig
    from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
    from qm_control_tpu.ocp.reference import target_from_knots
    cfg = _default_cfg(horizon=0.4, dt=0.04)
    model, info, q0, s = _standing_setup(cfg)
    loop = ControlLoop(model, info, cfg, LoopConfig())
    target = target_from_knots([0.0, 9.0], [s, s])
    ms = GaitSchedule(GAIT_LIBRARY["trot"]).mode_schedule(0.0, 9.0)
    carry = loop.init_carry(q0)
    carry = loop.warmup(carry, target, ms, num_solves=10)
    carry, m = loop.run(carry, target, ms, num_cycles=50)
    assert not np.isnan(np.asarray(m.ee_pos_err)).any()
    assert not np.isnan(np.asarray(m.torques)).any()
    assert bool(np.asarray(m.safe)[-1])
