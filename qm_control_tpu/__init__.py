"""qm_control_tpu — TPU-native whole-body MPC + WBC framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of skywoodsz/qm_control
(a ROS1/C++ centroidal-MPC + hierarchical-QP whole-body controller for a
Unitree Aliengo quadruped with a Kinova j2n6s300 arm; see SURVEY.md).

Architecture: functional core (model, costs, solver, WBC QP as pure JAX),
thin imperative shell (host loop, config, telemetry). Every compute function
is written for a single scenario and `vmap`-lifted; scenario batches shard
over a `jax.sharding.Mesh` (pure data parallelism — per-scenario state is
tiny, see SURVEY.md §2.3).
"""
import os

import jax

# Control stacks need full f32 matmul accuracy (Riccati recursions and QP
# nullspace cascades are ill-conditioned); TPU default would use bf16 passes.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache (the TPU-native analog of the reference's
# CppAD model library cache, task.info:13-15). Set via jax.config — env
# vars are too late when a sitecustomize hook has already imported jax.
if os.environ.get("QM_TPU_NO_COMPILE_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/qm_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

__version__ = "0.1.0"
