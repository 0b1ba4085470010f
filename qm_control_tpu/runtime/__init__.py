"""Runtime shell: plant simulation, state estimation, safety, control loop.

TPU-native replacement for the reference's ros_control/Gazebo plumbing
(QMHWSim, StateEstimateBase, SafetyChecker, QMController's update loop;
SURVEY.md §7 steps 5-6). Everything is written single-scenario and
vmap-lifted for batched scenario rollouts.
"""
from .plant import PlantConfig, PlantState, hybrid_torque, make_plant_step  # noqa: F401
from .estimator import rbd_state_from_plant, observation_from_rbd  # noqa: F401
from .safety import safety_check  # noqa: F401
from .loop import ControlLoop, LoopConfig  # noqa: F401
