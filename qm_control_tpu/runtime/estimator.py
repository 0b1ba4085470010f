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
import jax.numpy as jnp

from ..models import centroidal as C
from ..models import kinematics as K
from ..models.rotations import (R_to_quat, euler_zyx_rate_to_omega_world_matrix,
                                yaw_unwrap)
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
