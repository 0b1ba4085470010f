"""Optimal-control-problem layer: targets, costs, constraints, assembly.

TPU-native equivalent of the reference's qm_interface package
(OCP factory QMInterface.cpp:79-142) — see SURVEY.md §2.1 / §7 step 3.
"""
from .reference import TargetTrajectory  # noqa: F401
from .problem import OcpParams, make_ocp  # noqa: F401
