"""Utilities: timers, metrics, trajectory export/visualization."""
from .timers import RepeatedTimer  # noqa: F401
from .viz import TrajectoryLog, export_trajectory  # noqa: F401
