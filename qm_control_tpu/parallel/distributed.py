"""Multi-host initialization and explicit-collective scale-out.

The TPU-native distributed backend (SURVEY.md §5): `jax.distributed`
initialization for multi-process/multi-host runs (ICI within a slice,
DCN across slices), host-local batch feeding, and explicit
`shard_map` + `psum` metric reduction. The scenario fleet is pure data
parallelism (SURVEY.md §2.3): per-scenario MPC+WBC solves never
communicate; the only collective traffic is scalar metric reduction.

Run one process per host (or per chip group):

    python -m qm_control_tpu.parallel.distributed --probe \
        --coordinator=HOST:PORT --num-processes=N --process-id=I

or rely on the TPU environment's auto-detection (no args needed on Cloud
TPU). For CI without hardware, tests/test_multiprocess.py launches two
CPU processes with virtual devices over localhost.
"""
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DP_AXIS

_INITIALIZED = False


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, local_device_ids=None):
    """Idempotent jax.distributed.initialize wrapper.

    Arguments default to the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID environment variables; on Cloud TPU all of them are
    auto-detected and may stay None. Single-process runs (everything
    None and no env) skip initialization entirely and fall through to
    the local-device path.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return                      # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)
    _INITIALIZED = True


def global_mesh() -> Mesh:
    """1-D DP mesh over ALL global devices (every process must call this
    with the same topology)."""
    return Mesh(np.asarray(jax.devices()), (DP_AXIS,))


def host_local_batch_to_global(mesh: Mesh, local_batch):
    """Assemble a globally-sharded array pytree from per-process local
    shards: each process passes its own scenarios (leading dim
    B_global / num_processes); the result is one global jax.Array per
    leaf, sharded over the mesh."""
    sharding = NamedSharding(mesh, P(DP_AXIS))
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)), local_batch)


def sharded_mean(mesh: Mesh, fn):
    """shard_map-wrapped evaluation with an EXPLICIT psum reduction:
    out = psum(sum(fn(local_shard))) / B_global. The collective is a
    single scalar all-reduce riding ICI/DCN.

    fn: per-scenario function, vmapped inside over the local shard.
    Returns g(batch) -> scalar mean over the global batch.
    """
    from jax.experimental.shard_map import shard_map

    @partial(shard_map, mesh=mesh, in_specs=P(DP_AXIS), out_specs=P())
    def local(batch_shard):
        vals = jax.vmap(fn)(batch_shard)
        total = jnp.sum(vals)
        count = jnp.asarray(vals.shape[0], vals.dtype)
        return (jax.lax.psum(total, DP_AXIS)
                / jax.lax.psum(count, DP_AXIS))[None]

    return lambda batch: jax.jit(local)(batch)[0]


def sharded_fleet_step(mesh: Mesh, batched_step):
    """Globally-sharded MPC fleet step with an explicit psum'd cost mean
    (the multi-host variant of mesh.sharded_mpc_step).

    batched_step: step(batch) -> (batch', policy) built by
    parallel.batch.make_batched_mpc_step — vmapped, shard-agnostic.
    Returns run(batch) -> (batch', policy, mean_cost) where mean_cost is
    reduced across every device with jax.lax.psum.
    """
    from jax.experimental.shard_map import shard_map
    in_spec = P(DP_AXIS)

    def local(batch_shard):
        new_batch, policy = batched_step(batch_shard)
        total = jax.lax.psum(jnp.sum(policy.cost), DP_AXIS)
        count = jax.lax.psum(
            jnp.asarray(policy.cost.shape[0], policy.cost.dtype), DP_AXIS)
        return new_batch, policy, (total / count)[None]

    sharded = shard_map(
        local, mesh=mesh, in_specs=(in_spec,),
        out_specs=(in_spec, in_spec, P()), check_rep=False)
    jitted = jax.jit(sharded)

    def run(batch):
        new_batch, policy, mean = jitted(batch)
        return new_batch, policy, mean[0]

    return run


def _probe():
    """Print the process/device topology and run one psum (sanity)."""
    initialize_distributed()
    mesh = global_mesh()
    n = len(jax.devices())
    print(f"process {jax.process_index()}/{jax.process_count()}, "
          f"{jax.local_device_count()} local / {n} global devices")
    val = sharded_mean(mesh, lambda x: x)(
        jnp.arange(n * 2, dtype=jnp.float32))
    expect = (n * 2 - 1) / 2.0
    print(f"psum mean = {float(val)} (expect {expect})")
    assert abs(float(val) - expect) < 1e-5


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()
    if args.coordinator:
        os.environ["JAX_COORDINATOR_ADDRESS"] = args.coordinator
    if args.num_processes is not None:
        os.environ["JAX_NUM_PROCESSES"] = str(args.num_processes)
    if args.process_id is not None:
        os.environ["JAX_PROCESS_ID"] = str(args.process_id)
    if args.probe:
        _probe()
