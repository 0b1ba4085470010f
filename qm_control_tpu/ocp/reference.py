"""Target trajectories: the 37-dim MPC reference and command conversions.

Replaces the reference's TargetTrajectories + QmTargetTrajectoriesPublisher
(qm_controllers/src/QmTargetTrajectoriesPublisher_node.cpp:25-208). Target
states are R^37 = [centroidal state(30); EE pose(7)] where the EE pose is
[position(3); quaternion (x,y,z,w)] — the Eigen coefficient order the
reference appends (_node.cpp:60-62, EndEffectorConstraint.cpp:96-102).

A TargetTrajectory is a fixed-size padded pytree (jit/vmap-safe): K knots of
(time, state). Interpolation is linear on the 33 linear dims and slerp on
the quaternion, exactly mirroring EndEffectorConstraint::
interpolateEndEffectorPose (reference :82-113).
"""
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import ReferenceConfig
from ..models.rotations import (euler_zyx_to_R, quat_distance, quat_slerp)

TARGET_DIM = 37
MAX_KNOTS = 8          # fixed padding; command conversions emit 2 knots


class TargetTrajectory(NamedTuple):
    """Padded (time, state) knot sequence. times non-decreasing over the
    first n_knots entries; padding repeats the last knot at t=+big."""
    times: jnp.ndarray     # (K,)
    states: jnp.ndarray    # (K, 37)


def target_from_knots(times, states, dtype=jnp.float32):
    """Host-side constructor with padding to MAX_KNOTS."""
    times = np.asarray(times, dtype=np.float64)
    states = np.atleast_2d(np.asarray(states, dtype=np.float64))
    k = len(times)
    assert states.shape == (k, TARGET_DIM), states.shape
    t = np.full(MAX_KNOTS, 1e9)
    t[:k] = times
    s = np.tile(states[-1], (MAX_KNOTS, 1))
    s[:k] = states
    return TargetTrajectory(jnp.asarray(t, dtype=dtype),
                            jnp.asarray(s, dtype=dtype))


def _segment(times, t):
    """(index, alpha) with value = alpha*knot[i] + (1-alpha)*knot[i+1].

    Matches OCS2 LinearInterpolation::timeSegment semantics (alpha is the
    weight of the LEFT knot; clamped outside the range).
    """
    idx = jnp.clip(jnp.searchsorted(times, t, side="right") - 1,
                   0, times.shape[0] - 2)
    t0, t1 = times[idx], times[idx + 1]
    denom = jnp.where(t1 - t0 < 1e-9, 1.0, t1 - t0)
    alpha = jnp.clip(1.0 - (t - t0) / denom, 0.0, 1.0)
    return idx, alpha


def interpolate_state(target: TargetTrajectory, t):
    """(37,) linearly interpolated target (quat tail slerped separately)."""
    idx, alpha = _segment(target.times, t)
    lhs, rhs = target.states[idx], target.states[idx + 1]
    lin = alpha * lhs + (1.0 - alpha) * rhs
    q = _slerp_xyzw(lhs[33:37], rhs[33:37], 1.0 - alpha)
    return jnp.concatenate([lin[:33], q])


def _slerp_xyzw(q0_xyzw, q1_xyzw, t):
    """Slerp on (x,y,z,w)-ordered quaternions (target-state convention)."""
    to_wxyz = lambda q: jnp.concatenate([q[3:4], q[:3]])
    q = quat_slerp(to_wxyz(q0_xyzw), to_wxyz(q1_xyzw), t)
    return jnp.concatenate([q[1:4], q[0:1]])


def interpolate_ee_pose(target: TargetTrajectory, t):
    """EE (position(3), quat wxyz(4)) at time t.

    Reference: EndEffectorConstraint::interpolateEndEffectorPose
    (position lerp, quaternion slerp with weight (1-alpha) toward rhs).
    """
    x = interpolate_state(target, t)
    pos = x[30:33]
    q_xyzw = x[33:37]
    return pos, jnp.concatenate([q_xyzw[3:4], q_xyzw[:3]])


# ---------------------------------------------------------------------------
# Command conversions (reference QmTargetTrajectoriesPublisher_node.cpp).
# Host-side: take numpy observations, return a TargetTrajectory.
# The (0.52, 0.09) base-from-EE offset is the reference's hard-coded
# arm-mount offset (_node.cpp:152-153, :185-186).
# ---------------------------------------------------------------------------

EE_BASE_OFFSET = np.array([0.52, 0.09])
TIME_TO_TARGET = 1.0


def estimate_time_to_target(delta, cfg: ReferenceConfig):
    """Arrival-time heuristic from displacement/rotation speed limits
    (reference _node.cpp:25-41)."""
    disp = float(np.linalg.norm(delta[:3]))
    rot = float(np.linalg.norm(delta[3:6]))
    return max(disp / cfg.target_displacement_velocity,
               rot / cfg.target_rotation_velocity)


def _two_knot_target(t0, t1, base0, base1, ee0, ee1, cfg, momentum0=None,
                     momentum1=None):
    djs = np.asarray(cfg.default_joint_state)
    z6 = np.zeros(6)
    m0 = z6 if momentum0 is None else momentum0
    m1 = z6 if momentum1 is None else momentum1
    s0 = np.concatenate([m0, base0, djs, ee0])
    s1 = np.concatenate([m1, base1, djs, ee1])
    return target_from_knots([t0, t1], [s0, s1])


def goal_pose_to_target(ee_pos, ee_quat_wxyz, obs_time, obs_state, ee_state,
                        cfg: ReferenceConfig):
    """RViz goal-pose conversion (reference EEgoalPoseToTargetTrajectories).

    ee_state: current EE pose [pos(3), quat xyzw(4)]. obs_state: (30,).
    """
    base_cur = np.array(obs_state[6:12], dtype=np.float64)
    q_xyzw = np.array([ee_quat_wxyz[1], ee_quat_wxyz[2], ee_quat_wxyz[3],
                       ee_quat_wxyz[0]])
    ee_target = np.concatenate([np.asarray(ee_pos, dtype=np.float64), q_xyzw])
    base_target = base_cur.copy()
    base_target[0] = ee_pos[0] - EE_BASE_OFFSET[0]
    base_target[1] = ee_pos[1] - EE_BASE_OFFSET[1]
    base_target[2] = cfg.com_height
    base_target[4] = 0.0
    base_target[5] = 0.0
    q_cur = np.array([ee_state[6], ee_state[3], ee_state[4], ee_state[5]])
    delta = np.concatenate([
        np.asarray(ee_target[:3]) - np.asarray(ee_state[:3]),
        np.asarray(quat_distance(jnp.asarray(q_cur),
                                 jnp.asarray(ee_quat_wxyz)))])
    t1 = obs_time + estimate_time_to_target(delta, cfg)
    base0 = base_cur.copy()
    base0[2] = cfg.com_height
    base0[4] = 0.0
    base0[5] = 0.0
    return _two_knot_target(obs_time, t1, base0, base_target,
                            np.asarray(ee_state, dtype=np.float64), ee_target, cfg)


def cmd_vel_to_target(cmd_vel, last_ee_target, obs_time, obs_state, ee_state,
                      cfg: ReferenceConfig):
    """Base velocity command (reference cmdVelToTargetTrajectories).

    cmd_vel = [vx, vy, vz, yaw_rate] in base frame; EE target held at
    last_ee_target (re-latched if >10 cm from the measured EE).
    Returns (TargetTrajectory, new_last_ee_target).
    """
    base_cur = np.array(obs_state[6:12], dtype=np.float64)
    R = np.asarray(euler_zyx_to_R(jnp.asarray(base_cur[3:6])))
    v_world = R @ np.asarray(cmd_vel[:3], dtype=np.float64)
    base_target = np.array([
        base_cur[0] + v_world[0] * TIME_TO_TARGET,
        base_cur[1] + v_world[1] * TIME_TO_TARGET,
        cfg.com_height,
        base_cur[3] + cmd_vel[3] * TIME_TO_TARGET,
        0.0, 0.0])
    last_ee_target = np.array(last_ee_target, dtype=np.float64)
    if np.linalg.norm(last_ee_target[:3] - np.asarray(ee_state[:3])) > 0.1:
        last_ee_target[:3] = ee_state[:3]
    base0 = base_cur.copy()
    base0[2] = cfg.com_height
    base0[4] = 0.0
    base0[5] = 0.0
    momentum = np.concatenate([v_world, np.zeros(3)])
    traj = _two_knot_target(obs_time, obs_time + TIME_TO_TARGET,
                            base0, base_target, last_ee_target,
                            last_ee_target, cfg,
                            momentum0=momentum, momentum1=momentum)
    return traj, last_ee_target


def ee_cmd_vel_to_target(cmd_vel, last_ee_target, obs_time, obs_state,
                         ee_state, cfg: ReferenceConfig):
    """EE velocity command (reference EeCmdVelToTargetTrajectories).

    cmd_vel[:3] is expressed in the EE tool frame relative to the nominal
    tool orientation quat_init = (w=-0.5, x=0.5, y=-0.5, z=0.5); the base
    target follows the EE with the fixed mount offset.
    """
    from ..models.rotations import quat_to_R
    base_cur = np.array(obs_state[6:12], dtype=np.float64)
    q_cur = jnp.asarray([ee_state[6], ee_state[3], ee_state[4], ee_state[5]])
    q_init = jnp.asarray([-0.5, 0.5, -0.5, 0.5])
    v_world = np.asarray(quat_to_R(q_cur) @ quat_to_R(q_init).T
                         @ jnp.asarray(cmd_vel[:3]))
    ee_target = np.array(last_ee_target, dtype=np.float64)
    ee_target[0] = ee_state[0] + v_world[0] * TIME_TO_TARGET
    ee_target[1] = ee_state[1] + v_world[1] * TIME_TO_TARGET
    base_target = base_cur.copy()
    base_target[0] = ee_target[0] - EE_BASE_OFFSET[0]
    base_target[1] = ee_target[1] - EE_BASE_OFFSET[1]
    base_target[2] = cfg.com_height
    base_target[4] = 0.0
    base_target[5] = 0.0
    base0 = base_cur.copy()
    base0[2] = cfg.com_height
    base0[4] = 0.0
    base0[5] = 0.0
    traj = _two_knot_target(obs_time, obs_time + TIME_TO_TARGET,
                            base0, base_target,
                            np.asarray(ee_state, dtype=np.float64),
                            ee_target, cfg)
    return traj, ee_target
