"""Trajectory-optimization solvers (iLQR/SLQ, Riccati sweeps, QPs).

TPU-native replacement for OCS2's SqpMpc / SLQ / HPIPM stack
(SURVEY.md §2.2 rows 1-2).
"""
from .ilqr import IlqrSettings, IlqrSolution, ilqr_solve  # noqa: F401
