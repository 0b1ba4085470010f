"""State estimation: the 55-dim rbdState and the centroidal observation.

Replicates StateEstimateBase / FromTopicStateEstimate (reference
qm_estimation/src/StateEstimateBase.cpp:23-121, FromTopiceEstimate.cpp:
11-38): the "cheater" estimator reads plant ground truth — the same role
the Gazebo /ground_truth/state topic plays — assembles

    rbdState(55) = [euler_zyx(3); base_pos(3); q_joints(18);
                    omega_world(3); base_lin_vel(3); qdot_joints(18);
                    ee_pose(7: pos + quat xyzw)]

(the layout WbcBase::updateMeasured consumes, reference WbcBase.cpp:
137-143), and converts to the centroidal observation with yaw unwrapping
(QMController.cpp:239-242).
"""
from typing import NamedTuple

import jax.numpy as jnp

from ..models import centroidal as C
from ..models import kinematics as K
from ..models.rotations import (R_to_euler_zyx, R_to_quat,
                                euler_zyx_rate_to_omega_world_matrix,
                                euler_zyx_to_R, quat_to_R, yaw_unwrap)
from ..models.spec import EE_FRAME, RobotModel


def rbd_state_from_plant(model: RobotModel, q, v):
    """(55,) rbdState from plant ground truth (q, v in our coordinates:
    base pos + ZYX euler + joints; plain-rate velocities)."""
    E = euler_zyx_rate_to_omega_world_matrix(q[3:6])
    omega_world = E @ v[3:6]
    cache = K.fk(model, q)
    ee_pos, ee_R = K.frame_pose(model, cache, EE_FRAME)
    ee_q = R_to_quat(ee_R)                      # wxyz
    ee_q_xyzw = jnp.concatenate([ee_q[1:], ee_q[:1]])
    return jnp.concatenate([
        q[3:6], q[0:3], q[6:24],
        omega_world, v[0:3], v[6:24],
        ee_pos, ee_q_xyzw])


def rbd_to_qv(rbd):
    """Invert the rbdState layout back to (q(24), v(24))."""
    q = jnp.concatenate([rbd[3:6], rbd[0:3], rbd[6:24]])
    zyx = rbd[0:3]
    E = euler_zyx_rate_to_omega_world_matrix(zyx)
    zyx_dot = jnp.linalg.solve(E, rbd[24:27])
    v = jnp.concatenate([rbd[27:30], zyx_dot, rbd[30:48]])
    return q, v


def observation_from_rbd(model: RobotModel, info: C.CentroidalInfo, rbd,
                         last_yaw=None):
    """Centroidal observation x(30) from the rbdState, with yaw unwrap
    (reference QMController::updateStateEstimation :236-242)."""
    q, v = rbd_to_qv(rbd)
    if last_yaw is not None:
        q = q.at[3].set(yaw_unwrap(q[3], last_yaw))
    return C.centroidal_state_from_rbd(model, info, q, v)


# ---------------------------------------------------------------------------
# IMU-path estimator (non-cheater seam)
# ---------------------------------------------------------------------------

class ImuEstimatorState(NamedTuple):
    """One-step estimator memory (reference StateEstimateBase latches the
    first IMU orientation sample as an offset, StateEstimateBase.cpp:50-55)."""
    zyx_offset: jnp.ndarray    # (3,) latched first-sample orientation
    initialized: jnp.ndarray   # scalar 0/1


def init_imu_estimator(dtype=jnp.float32) -> ImuEstimatorState:
    return ImuEstimatorState(zyx_offset=jnp.zeros(3, dtype=dtype),
                             initialized=jnp.asarray(0.0, dtype=dtype))


def imu_estimator_update(model: RobotModel, est: ImuEstimatorState,
                         imu_quat_wxyz, gyro_local,
                         joint_pos, joint_vel,
                         base_pos, base_lin_vel, contact_flags):
    """Assemble rbdState(55) from sensor-level inputs: IMU orientation +
    local angular rate, joint encoders, contact flags, and a base
    position/velocity source (odometry / leg odometry).

    Mirrors StateEstimateBase::updateImu (reference qm_estimation/src/
    StateEstimateBase.cpp:46-68):
      * the FIRST IMU sample's ZYX angles are latched and subtracted from
        every subsequent sample (orientation offset removal);
      * the local angular velocity converts to global via the two OCS2
        rotation-derivative transforms: zyx_dot from (raw zyx, w_local),
        then w_global = E(offset-removed zyx) @ zyx_dot.
    Contact flags map to a gait mode (StateEstimateBase.h:40) returned
    alongside.

    Returns (rbd(55), mode, new_est_state).
    """
    from ..gaits.gait import mode_from_contact_flags
    dtype = joint_pos.dtype
    R_imu = quat_to_R(jnp.asarray(imu_quat_wxyz, dtype=dtype))
    zyx_raw = R_to_euler_zyx(R_imu)
    offset = jnp.where(est.initialized > 0, est.zyx_offset, zyx_raw)
    zyx = zyx_raw - offset
    # w_local = R(zyx_raw)^T E(zyx_raw) zyx_dot  ->  solve for zyx_dot
    E_raw = euler_zyx_rate_to_omega_world_matrix(zyx_raw)
    zyx_dot = jnp.linalg.solve(euler_zyx_to_R(zyx_raw).T @ E_raw,
                               jnp.asarray(gyro_local, dtype=dtype))
    omega_world = euler_zyx_rate_to_omega_world_matrix(zyx) @ zyx_dot

    q = jnp.concatenate([jnp.asarray(base_pos, dtype=dtype), zyx,
                         jnp.asarray(joint_pos, dtype=dtype)])
    cache = K.fk(model, q)
    ee_pos, ee_R = K.frame_pose(model, cache, EE_FRAME)
    ee_q = R_to_quat(ee_R)
    ee_q_xyzw = jnp.concatenate([ee_q[1:], ee_q[:1]])
    rbd = jnp.concatenate([
        zyx, jnp.asarray(base_pos, dtype=dtype),
        jnp.asarray(joint_pos, dtype=dtype),
        omega_world, jnp.asarray(base_lin_vel, dtype=dtype),
        jnp.asarray(joint_vel, dtype=dtype),
        ee_pos, ee_q_xyzw])
    mode = mode_from_contact_flags(contact_flags)
    new_est = ImuEstimatorState(zyx_offset=offset,
                                initialized=jnp.ones((), dtype=dtype))
    return rbd, mode, new_est


def imu_from_plant(model: RobotModel, q, v, rng_noise=None,
                   gyro_sigma=0.0, quat_sigma=0.0):
    """Synthesize an IMU sample (quat_wxyz, gyro_local) from plant ground
    truth, optionally with Gaussian noise — the QMHWSim::parseImu
    equivalent (reference qm_gazebo/src/QMHWSim.cpp:118-171)."""
    R = euler_zyx_to_R(q[3:6])
    quat = R_to_quat(R)
    E = euler_zyx_rate_to_omega_world_matrix(q[3:6])
    omega_world = E @ v[3:6]
    gyro_local = R.T @ omega_world
    if rng_noise is not None:
        import jax
        k1, k2 = jax.random.split(rng_noise)
        gyro_local = gyro_local + gyro_sigma * jax.random.normal(
            k1, (3,), dtype=q.dtype)
        dq = quat_sigma * jax.random.normal(k2, (3,), dtype=q.dtype)
        # small-angle quaternion perturbation
        from ..models.rotations import quat_mul
        pert = jnp.concatenate([jnp.ones(1, dtype=q.dtype), 0.5 * dq])
        quat = quat_mul(pert / jnp.linalg.norm(pert), quat)
    return quat, gyro_local
