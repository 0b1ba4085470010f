"""Whole-body control: task formulations + hierarchical null-space QP.

TPU-native replacement for the reference's qm_wbc package
(WbcBase + HoQp + HierarchicalWbc; SURVEY.md §2.1, §7 step 4).
"""
from .qp import solve_qp  # noqa: F401
from .tasks import Task, WbcData, WbcDesired  # noqa: F401
from .wbc import HierarchicalWbc, hierarchical_wbc_update  # noqa: F401
