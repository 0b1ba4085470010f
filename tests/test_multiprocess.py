"""Two-process jax.distributed CI test — multi-host sharding without a
cluster (SURVEY.md §4: jax.distributed + xla_force_host_platform_device_count).

Each subprocess gets 2 virtual CPU devices; the pair forms a 4-device
global mesh over localhost. The child script runs a shard_map + psum
reduction AND a tiny sharded MPC fleet step, asserting both.
"""
import os
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(proc_id)
import jax
jax.config.update("jax_platforms", "cpu")
from qm_control_tpu.parallel.distributed import (
    global_mesh, host_local_batch_to_global, initialize_distributed,
    sharded_mean)
initialize_distributed()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
mesh = global_mesh()

import numpy as np
import jax.numpy as jnp
# each process contributes its local half of a global batch of 8
local = np.arange(4, dtype=np.float32) + 4 * proc_id
g = host_local_batch_to_global(mesh, local)
mean = sharded_mean(mesh, lambda x: x * 2.0)(g)
expect = float(np.arange(8).mean() * 2.0)
assert abs(float(mean) - expect) < 1e-5, (float(mean), expect)

# tiny sharded MPC fleet step across the two processes
from qm_control_tpu.config import MpcConfig, QmConfig
from qm_control_tpu.parallel.batch import BatchScenario, make_batched_mpc_step
from qm_control_tpu.parallel.distributed import sharded_fleet_step
from qm_control_tpu.solver.sqp import SqpSettings
from __graft_entry__ import _setup
cfg = QmConfig().with_(mpc=MpcConfig(time_horizon=0.08, dt=0.04,
                                     num_iterations=1))
cfg, model, info, x0, target, ms = _setup(cfg)
N = cfg.mpc.num_nodes
B_local = 2
tile = lambda a: jnp.tile(jnp.asarray(a)[None], (B_local,) + (1,) * jnp.ndim(a))
local_batch = BatchScenario(
    t=jnp.zeros(B_local, dtype=jnp.float32), x=tile(x0),
    target=jax.tree_util.tree_map(tile, target),
    ms=jax.tree_util.tree_map(tile, ms),
    W_warm=jnp.zeros((B_local, N, 30), dtype=jnp.float32),
    X_warm=tile(jnp.tile(x0[None], (N + 1, 1))))
gbatch = host_local_batch_to_global(
    mesh, jax.tree_util.tree_map(lambda a: np.asarray(a), local_batch))
step = sharded_fleet_step(
    mesh, make_batched_mpc_step(model, info, cfg,
                                SqpSettings(num_iterations=1,
                                            unrolled_ops=False)))
new_batch, policy, mean_cost = step(gbatch)
assert np.isfinite(float(mean_cost)), float(mean_cost)
print(f"proc {proc_id} OK mean_cost={float(mean_cost):.4f}")
"""


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=repo) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out, out[-2000:]
