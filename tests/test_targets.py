"""Target trajectories: interpolation and command conversions."""
import jax.numpy as jnp
import numpy as np

from qm_control_tpu.config import ReferenceConfig
from qm_control_tpu.models.rotations import quat_slerp
from qm_control_tpu.ocp.reference import (cmd_vel_to_target,
                                          ee_cmd_vel_to_target,
                                          goal_pose_to_target,
                                          interpolate_ee_pose,
                                          interpolate_state,
                                          target_from_knots)


def _mk_target():
    s0 = np.zeros(37)
    s1 = np.zeros(37)
    s0[6:9] = [0, 0, 0.4]
    s1[6:9] = [0.3, 0, 0.4]
    s0[30:33] = [0.5, 0.1, 0.5]
    s1[30:33] = [0.8, 0.1, 0.5]
    s0[33:37] = [0, 0, 0, 1]            # identity quat (x,y,z,w)
    q = np.array([np.sin(0.25), 0, 0, np.cos(0.25)])  # 0.5 rad about x
    s1[33:37] = q
    return target_from_knots([0.0, 1.0], [s0, s1])


def test_state_interpolation_midpoint():
    tgt = _mk_target()
    x = interpolate_state(tgt, 0.5)
    np.testing.assert_allclose(float(x[6]), 0.15, atol=1e-6)
    # quaternion: slerp half way about x = 0.25 rad rotation
    p, q = interpolate_ee_pose(tgt, 0.5)
    np.testing.assert_allclose(np.asarray(p), [0.65, 0.1, 0.5], atol=1e-6)
    np.testing.assert_allclose(float(q[0]), np.cos(0.125), atol=1e-5)
    np.testing.assert_allclose(float(q[1]), np.sin(0.125), atol=1e-5)


def test_interpolation_clamps_outside_range():
    tgt = _mk_target()
    x_before = interpolate_state(tgt, -1.0)
    x_after = interpolate_state(tgt, 99.0)
    np.testing.assert_allclose(np.asarray(x_before), np.asarray(tgt.states[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(x_after), np.asarray(tgt.states[1]),
                               atol=1e-6)


def test_goal_pose_conversion():
    cfg = ReferenceConfig()
    obs_state = np.zeros(30)
    obs_state[6:12] = [0.1, 0.2, 0.38, 0.3, 0.01, -0.02]
    ee_state = np.array([0.6, 0.3, 0.5, 0, 0, 0, 1.0])
    tgt = goal_pose_to_target([1.0, 0.3, 0.6], [1, 0, 0, 0], 2.0, obs_state,
                              ee_state, cfg)
    s1 = np.asarray(tgt.states[1])
    # base follows EE with the (0.52, 0.09) mount offset, z = comHeight
    np.testing.assert_allclose(s1[6], 1.0 - 0.52, atol=1e-6)
    np.testing.assert_allclose(s1[7], 0.3 - 0.09, atol=1e-6)
    np.testing.assert_allclose(s1[8], 0.4, atol=1e-6)
    assert s1[10] == 0 and s1[11] == 0          # pitch/roll zeroed
    np.testing.assert_allclose(s1[9], 0.3, atol=1e-6)  # yaw kept
    np.testing.assert_allclose(s1[30:33], [1.0, 0.3, 0.6], atol=1e-6)
    # arrival time from displacement / 0.3 m/s
    disp = np.linalg.norm(np.array([1.0, 0.3, 0.6]) - ee_state[:3])
    assert float(tgt.times[1]) >= 2.0 + disp / cfg.target_displacement_velocity - 1e-4


def test_cmd_vel_conversion_extrapolates_base():
    cfg = ReferenceConfig()
    obs_state = np.zeros(30)
    obs_state[6:12] = [0, 0, 0.4, np.pi / 2, 0, 0]   # yawed 90 deg
    ee_state = np.array([0.5, 0.1, 0.5, 0, 0, 0, 1.0])
    last_ee = np.array([0.5, 0.1, 0.5, 0, 0, 0, 1.0])
    tgt, _ = cmd_vel_to_target([0.2, 0, 0, 0.1], last_ee, 0.0, obs_state,
                               ee_state, cfg)
    s1 = np.asarray(tgt.states[1])
    # vx body forward = +y world after 90deg yaw; 0.2 m/s * 1 s
    np.testing.assert_allclose(s1[6], 0.0, atol=1e-5)
    np.testing.assert_allclose(s1[7], 0.2, atol=1e-5)
    np.testing.assert_allclose(s1[9], np.pi / 2 + 0.1, atol=1e-6)
    # momentum rows carry the commanded world velocity
    np.testing.assert_allclose(s1[0:3], [0.0, 0.2, 0.0], atol=1e-5)


def test_ee_cmd_vel_latches_height_and_base_follows():
    cfg = ReferenceConfig()
    obs_state = np.zeros(30)
    obs_state[6:12] = [0, 0, 0.4, 0, 0, 0]
    q_nominal = np.array([0.5, -0.5, 0.5, -0.5])   # xyzw == quat_init
    ee_state = np.concatenate([[0.5, 0.1, 0.5], q_nominal])
    last_ee = np.concatenate([[0.4, 0.1, 0.45], q_nominal])
    tgt, new_last = ee_cmd_vel_to_target([0.1, 0.0, 0.0, 0.0], last_ee, 0.0,
                                         obs_state, ee_state, cfg)
    s1 = np.asarray(tgt.states[1])
    # z + orientation held from last target; base follows with offset
    np.testing.assert_allclose(s1[32], 0.45, atol=1e-6)
    np.testing.assert_allclose(s1[6], s1[30] - 0.52, atol=1e-6)
    np.testing.assert_allclose(s1[7], s1[31] - 0.09, atol=1e-6)
