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
import jax

# Control stacks need full f32 matmul accuracy (Riccati recursions and QP
# nullspace cascades are ill-conditioned); TPU default would use bf16 passes.
jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
