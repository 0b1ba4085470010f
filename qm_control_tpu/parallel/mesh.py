"""Device mesh + sharded scenario batches.

Replaces the reference's (nonexistent) distributed backend with the
TPU-native one (SURVEY.md §5 'Distributed communication backend'): a
`jax.sharding.Mesh` over a data-parallel axis, scenario batches sharded
with NamedSharding, XLA collectives (`psum` via shard_map) for metric
reduction only — collectives ride ICI within a slice and DCN across
slices; per-scenario solves never communicate.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (DP_AXIS,))


def shard_scenarios(mesh: Mesh, batch):
    """Place a BatchScenario (leading dim B, divisible by mesh size) with
    the batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(DP_AXIS))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), batch)


def sharded_mpc_step(mesh: Mesh, batched_step):
    """Wrap a batched MPC step so inputs/outputs stay sharded over the
    mesh and a cross-chip mean of the solver cost is reduced with a
    collective (the only communication in the fleet).

    Returns step(batch) -> (batch', policy, mean_cost).
    """
    in_sharding = NamedSharding(mesh, P(DP_AXIS))
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=None)
    def step(batch):
        new_batch, policy = batched_step(batch)
        # metric reduction across the whole fleet: one all-reduce on a
        # scalar per chip (ICI/DCN), nothing else crosses devices
        mean_cost = jnp.mean(policy.cost)
        return new_batch, policy, mean_cost

    def run(batch):
        batch = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, in_sharding), batch)
        return step(batch)

    return run
