"""Failure detection: vectorized safety predicate + divergence guards.

Replicates SafetyChecker (reference qm_controllers/include/qm_controllers/
SafetyChecker.h:16-35): the controller stops when base ROLL leaves
(-pi/2, pi/2) (pose index 5 = theta_base_x). Extended per SURVEY.md §5:
NaN/divergence guards on solver outputs, vectorized over scenario batches
(per-scenario kill flags instead of a process stop).
"""
import jax.numpy as jnp


def safety_check(x, policy_cost=None, height_limits=(0.08, 1.0)):
    """True = safe. x: centroidal state (30,). Branch-free; vmap over a
    batch for per-scenario kill/reset flags."""
    roll = x[11]                          # base pose [p(3), z, y, x]
    ok = (roll > -jnp.pi / 2) & (roll < jnp.pi / 2)
    ok &= jnp.isfinite(x).all()
    ok &= (x[8] > height_limits[0]) & (x[8] < height_limits[1])
    if policy_cost is not None:
        ok &= jnp.isfinite(policy_cost)
    return ok
