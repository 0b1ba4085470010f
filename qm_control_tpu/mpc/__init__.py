"""MPC layer: policy solve, warm start, MRT-style policy evaluation.

TPU-native replacement for OCS2's SqpMpc + MPC_MRT_Interface
(SURVEY.md §2.2 rows 1, 3).
"""
from .mpc import MpcPolicy, MpcSolver, evaluate_policy  # noqa: F401
