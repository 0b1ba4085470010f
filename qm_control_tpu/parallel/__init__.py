"""Scenario-batch and multi-chip scale-out.

The reference is a single-process, single-robot controller (SURVEY.md
§2.3); its concurrency inventory is an MPC worker thread + a real-time
thread. The TPU-native replacement scales by SCENARIO PARALLELISM:

  - `vmap` lifts the whole MPC/WBC/closed-loop step over thousands of
    (gait, target, disturbance, initial-state) scenarios per chip;
  - a `jax.sharding.Mesh` over ("dp",) shards the scenario batch across
    chips/hosts (ICI within a slice, DCN across slices), with collectives
    used only for metric reduction.

There is deliberately no TP/PP/SP/EP analog: per-scenario state is tiny
(x in R^30); pure data parallelism over scenarios plus within-scenario
kernel parallelism is the correct decomposition (SURVEY.md §2.3).
"""
from .batch import BatchScenario, make_batched_mpc_step, make_batched_wbc  # noqa: F401
from .mesh import make_mesh, shard_scenarios, sharded_mpc_step  # noqa: F401
