"""Pallas TPU kernels for the real-time hot paths.

hoqp_fused: the 3-level hierarchical-WBC QP cascade as ONE fused kernel
(SURVEY.md §7 step 4 — replaces ~50 host-visible factorizations with a
single device program).
"""
from .hoqp_fused import fused_hoqp, FusedCascadeSpec  # noqa: F401
