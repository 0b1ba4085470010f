"""Command / teleop layer: gait switching + target command conversion.

Replaces the reference's command processes (SURVEY.md §1 L7):
  - QmTargetTrajectoriesPublisher node (goal pose / cmd_vel / ee_cmd_vel
    -> TargetTrajectories; the conversions live in ocp/reference.py);
  - GaitJoyPublisher (gamepad button combos -> mode_schedule,
    qm_controllers/src/GaitJoyPublisher.cpp:18-60; LB+A = trot,
    LB+B = stance) and the keyboard gait selector from
    ocs2_legged_robot_ros;
ROS topics become plain method calls / an in-process queue.
"""
import queue
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..config import ReferenceConfig
from ..gaits.library import GAIT_LIBRARY, GaitSchedule, ModeSequenceTemplate
from ..ocp.reference import (TargetTrajectory, cmd_vel_to_target,
                             ee_cmd_vel_to_target, goal_pose_to_target)

# reference GaitJoyPublisher.cpp:41-49: button combos -> named gaits
JOY_GAIT_BINDINGS = {
    ("LB", "A"): "trot",
    ("LB", "B"): "stance",
    ("LB", "X"): "standing_trot",
    ("LB", "Y"): "flying_trot",
}


@dataclass
class GaitCommander:
    """Gait switching front-end over a GaitSchedule (the GaitJoyPublisher
    + keyboard gait node equivalent)."""
    schedule: GaitSchedule = field(default_factory=GaitSchedule)

    def switch(self, gait_name: str, at_time: float):
        """Keyboard-style: switch to a named gait from the library."""
        if gait_name not in GAIT_LIBRARY:
            raise KeyError(f"unknown gait '{gait_name}'; have "
                           f"{sorted(GAIT_LIBRARY)}")
        self.schedule.insert_template(GAIT_LIBRARY[gait_name], at_time)

    def joy(self, buttons, at_time: float) -> Optional[str]:
        """Gamepad-style: button combo -> gait switch. Returns the gait
        name if a binding fired."""
        pressed = tuple(sorted(b for b, on in buttons.items() if on))
        for combo, gait in JOY_GAIT_BINDINGS.items():
            if all(b in pressed for b in combo):
                self.switch(gait, at_time)
                return gait
        return None

    def mode_schedule(self, lo: float, hi: float):
        return self.schedule.mode_schedule(lo, hi)


@dataclass
class TargetCommander:
    """Target command front-end (the QmTargetTrajectoriesPublisher node
    equivalent): converts user intent to TargetTrajectories using the
    reference's three conversions, holding lastEeTarget state."""
    cfg: ReferenceConfig = field(default_factory=ReferenceConfig)
    last_ee_target: np.ndarray = field(
        default_factory=lambda: np.array([0.52, 0.09, 0.78,
                                          0.5, -0.5, 0.5, -0.5]))

    def goal_pose(self, ee_pos, ee_quat_wxyz, obs_time, obs_state,
                  ee_state) -> TargetTrajectory:
        """RViz interactive-marker 'send target pose' equivalent."""
        self.last_ee_target = np.concatenate(
            [np.asarray(ee_pos, dtype=np.float64),
             [ee_quat_wxyz[1], ee_quat_wxyz[2], ee_quat_wxyz[3],
              ee_quat_wxyz[0]]])
        return goal_pose_to_target(ee_pos, ee_quat_wxyz, obs_time,
                                   obs_state, ee_state, self.cfg)

    def cmd_vel(self, v, obs_time, obs_state, ee_state) -> TargetTrajectory:
        """Base velocity teleop (/cmd_vel equivalent)."""
        traj, self.last_ee_target = cmd_vel_to_target(
            v, self.last_ee_target, obs_time, obs_state, ee_state, self.cfg)
        return traj

    def ee_cmd_vel(self, v, obs_time, obs_state,
                   ee_state) -> TargetTrajectory:
        """EE velocity teleop (/ee_cmd_vel equivalent)."""
        traj, self.last_ee_target = ee_cmd_vel_to_target(
            v, self.last_ee_target, obs_time, obs_state, ee_state, self.cfg)
        return traj


class CommandQueue:
    """Thread-safe in-process command queue — the pub/sub replacement for
    the reference's ROS topics (SURVEY.md §5 comm backend)."""

    def __init__(self, maxsize: int = 64):
        self._q = queue.Queue(maxsize=maxsize)

    def publish(self, msg):
        # drop-oldest with retry: under concurrent publishers the freed
        # slot can be stolen between get_nowait and put_nowait, so loop
        # instead of letting a transient race raise queue.Full
        while True:
            try:
                self._q.put_nowait(msg)
                return
            except queue.Full:
                try:
                    self._q.get_nowait()      # drop oldest
                except queue.Empty:
                    pass

    def drain(self):
        """All pending messages (newest last)."""
        out = []
        while True:
            try:
                out.append(self._q.get_nowait())
            except queue.Empty:
                return out
