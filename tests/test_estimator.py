"""IMU-path estimator (runtime/estimator.py) — offset latch, local-to-
global angular velocity, and a closed-loop standing test where the WBC
consumes (IMU, joints, contacts) instead of ground truth.

Reference semantics: qm_estimation/src/StateEstimateBase.cpp:46-68.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_control_tpu.config import WbcGains
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.runtime.estimator import (ImuEstimatorState,
                                              imu_estimator_update,
                                              imu_from_plant,
                                              init_imu_estimator,
                                              observation_from_rbd,
                                              rbd_state_from_plant)


@pytest.fixture(scope="module")
def info(model):
    return C.make_centroidal_info(model)


def test_imu_estimator_matches_ground_truth(model):
    """Zero offset, zero noise: the IMU-assembled rbdState equals the
    cheater estimator's."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(default_q(base_pos=(0.1, -0.2, 0.4),
                              base_zyx=(0.0, 0.05, -0.03)), jnp.float32)
    v = jnp.asarray(rng.normal(size=24) * 0.1, dtype=jnp.float32)
    rbd_ref = rbd_state_from_plant(model, q, v)
    quat, gyro = imu_from_plant(model, q, v)
    est = init_imu_estimator()
    # initialize the offset latch at zero orientation so nothing is removed
    q0 = q.at[3:6].set(0.0)
    quat0, gyro0 = imu_from_plant(model, q0, v * 0)
    _, _, est = imu_estimator_update(model, est, quat0, gyro0, q0[6:],
                                     v[6:] * 0, q0[:3], v[:3] * 0,
                                     jnp.ones(4))
    rbd, mode, est = imu_estimator_update(model, est, quat, gyro, q[6:],
                                          v[6:], q[:3], v[:3], jnp.ones(4))
    np.testing.assert_allclose(np.asarray(rbd), np.asarray(rbd_ref),
                               atol=1e-4)
    assert int(mode) == 15  # STANCE


def test_offset_latch_removes_initial_orientation(model):
    """First-sample ZYX is latched and subtracted from every sample
    (StateEstimateBase.cpp:50-55)."""
    q = jnp.asarray(default_q(base_pos=(0, 0, 0.4),
                              base_zyx=(0.6, 0.0, 0.0)), jnp.float32)
    v = jnp.zeros(24, dtype=jnp.float32)
    quat, gyro = imu_from_plant(model, q, v)
    est = init_imu_estimator()
    rbd1, _, est = imu_estimator_update(model, est, quat, gyro, q[6:],
                                        v[6:], q[:3], v[:3], jnp.ones(4))
    assert abs(float(rbd1[0])) < 1e-6          # yaw offset removed
    rbd2, _, est = imu_estimator_update(model, est, quat, gyro, q[6:],
                                        v[6:], q[:3], v[:3], jnp.ones(4))
    assert abs(float(rbd2[0])) < 1e-6          # offset persists
    # a subsequent rotation reads relative to the latched offset
    q3 = q.at[3].set(0.9)
    quat3, gyro3 = imu_from_plant(model, q3, v)
    rbd3, _, est = imu_estimator_update(model, est, quat3, gyro3, q3[6:],
                                        v[6:], q3[:3], v[:3], jnp.ones(4))
    np.testing.assert_allclose(float(rbd3[0]), 0.3, atol=1e-5)


def test_angular_velocity_local_to_global(model):
    """w_global recovered from a local gyro sample matches E zyx_dot."""
    from qm_control_tpu.models.rotations import (
        euler_zyx_rate_to_omega_world_matrix)
    q = jnp.asarray(default_q(base_zyx=(0.3, 0.1, -0.2)), jnp.float32)
    v = jnp.zeros(24, dtype=jnp.float32).at[3:6].set(
        jnp.asarray([0.4, -0.2, 0.1]))
    quat, gyro = imu_from_plant(model, q, v)
    est = init_imu_estimator()
    q0 = q.at[3:6].set(0.0)
    quat0, gyro0 = imu_from_plant(model, q0, v * 0)
    _, _, est = imu_estimator_update(model, est, quat0, gyro0, q0[6:],
                                     v[6:] * 0, q0[:3], v[:3] * 0,
                                     jnp.ones(4))
    rbd, _, _ = imu_estimator_update(model, est, quat, gyro, q[6:], v[6:],
                                     q[:3], v[:3], jnp.ones(4))
    E = euler_zyx_rate_to_omega_world_matrix(q[3:6])
    np.testing.assert_allclose(np.asarray(rbd[24:27]),
                               np.asarray(E @ v[3:6]), atol=1e-4)


@pytest.mark.slow
def test_closed_loop_standing_with_noisy_imu(model, info):
    """The WBC holds a standing pose for 0.2 s with the observation
    assembled from a NOISY IMU through imu_estimator_update (not ground
    truth) — the non-cheater estimation seam in the loop."""
    from qm_control_tpu.gaits.gait import contact_flags_from_mode
    from qm_control_tpu.runtime.plant import (HybridCommand, PlantConfig,
                                              init_plant_state,
                                              make_plant_step, push_command)
    from qm_control_tpu.runtime.estimator import rbd_to_qv
    from qm_control_tpu.wbc.wbc import hierarchical_wbc_update
    import dataclasses

    q0 = jnp.asarray(default_q(base_pos=(0, 0, 0.38)), jnp.float32)
    x_des = jnp.concatenate([jnp.zeros(6, jnp.float32), q0])
    u_des = C.weight_compensating_input(info, jnp.ones(4)).astype(jnp.float32)
    gains = dataclasses.replace(WbcGains(), arm_settling_time=0.0)
    tau_max = jnp.asarray(model.joint_effort, dtype=jnp.float32)
    plant_step = make_plant_step(model, PlantConfig())
    state = init_plant_state(q0, model=model)
    est = init_imu_estimator()

    @jax.jit
    def tick(state, est, key):
        quat, gyro = imu_from_plant(model, state.q, state.v,
                                    rng_noise=key, gyro_sigma=0.01,
                                    quat_sigma=0.002)
        rbd, mode, est = imu_estimator_update(
            model, est, quat, gyro, state.q[6:], state.v[6:],
            state.q[:3], state.v[:3], jnp.ones(4))
        flags = contact_flags_from_mode(mode).astype(jnp.float32)
        q_m, v_m = rbd_to_qv(rbd)
        wbc = hierarchical_wbc_update(
            model, info, gains, tau_max, x_des, u_des, u_des, q_m, v_m,
            flags, jnp.asarray(0.002, jnp.float32),
            jnp.asarray(20.0, jnp.float32))
        cmd = HybridCommand(
            pos_des=x_des[12:30], vel_des=jnp.zeros(18, jnp.float32),
            kp=jnp.zeros(18, jnp.float32),
            kd=3.0 * jnp.ones(18, jnp.float32), ff=wbc.torques)
        state = push_command(state, cmd)

        def sub(s, _):
            s, _ = plant_step(s)
            return s, None
        state, _ = jax.lax.scan(sub, state, None, length=2)
        return state, est

    key = jax.random.PRNGKey(0)
    for i in range(100):   # 0.2 s at 500 Hz
        key, sub = jax.random.split(key)
        state, est = tick(state, est, sub)
    assert np.isfinite(np.asarray(state.q)).all()
    assert 0.3 < float(state.q[2]) < 0.5, float(state.q[2])
