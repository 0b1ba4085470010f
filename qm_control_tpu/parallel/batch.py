"""Scenario batching: vmap-lifted MPC and WBC steps.

Every compute function in the framework is written single-scenario and
lifted here. A BatchScenario carries per-scenario problem data (initial
state, target trajectory, mode schedule, warm starts); everything is a
flat pytree of arrays with a leading batch axis, so it shards trivially
over a device mesh (mesh.py).
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QmConfig, WbcGains
from ..gaits.gait import ModeSchedule
from ..models import centroidal as C
from ..models.spec import RobotModel
from ..mpc.mpc import MpcPolicy, mpc_step
from ..ocp.reference import TargetTrajectory
from ..solver.sqp import SqpSettings
from ..wbc.wbc import hierarchical_wbc_update


class BatchScenario(NamedTuple):
    """Per-scenario MPC problem data (leading dim = batch)."""
    t: jnp.ndarray             # (B,)
    x: jnp.ndarray             # (B, 30)
    target: TargetTrajectory   # (B, K) / (B, K, 37)
    ms: ModeSchedule           # (B, E) / (B, E+1)
    W_warm: jnp.ndarray        # (B, N, 30)
    X_warm: jnp.ndarray        # (B, N+1, 30)


def stack_scenarios(scenarios) -> BatchScenario:
    """Stack a list of single-scenario tuples into a BatchScenario."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *scenarios)


def make_batched_mpc_step(model: RobotModel, info: C.CentroidalInfo,
                          cfg: QmConfig,
                          settings: SqpSettings = None):
    """Returns step(batch: BatchScenario) -> (BatchScenario, MpcPolicy_B).

    One warm-started MPC solve per scenario, vmapped. The returned batch
    carries the updated warm starts, so calling in a loop implements
    receding-horizon MPC for the whole fleet.
    """
    from ..ocp.problem import make_ocp
    settings = settings or SqpSettings(num_iterations=cfg.mpc.num_iterations)
    ocp = make_ocp(model, info, cfg)

    def one(t, x, target, ms, W_warm, X_warm):
        return mpc_step(ocp, model, info, cfg, settings, t, x, target, ms,
                        W_warm, X_warm,
                        jnp.asarray(1.0 / cfg.mpc.mpc_frequency,
                                    dtype=jnp.float32),
                        jnp.asarray(False))

    vstep = jax.vmap(one)

    def step(batch: BatchScenario):
        policy = vstep(batch.t, batch.x, batch.target, batch.ms,
                       batch.W_warm, batch.X_warm)
        new_batch = batch._replace(W_warm=policy.W, X_warm=policy.X)
        return new_batch, policy

    return step


def make_batched_wbc(model: RobotModel, info: C.CentroidalInfo,
                     gains: WbcGains = None, cascade: str = "xla"):
    """Returns wbc(x_des_B, u_des_B, input_last_B, q_B, v_B, flags_B,
    period, time) -> WbcResult (batched).

    cascade="xla" (default) runs the fused kernel's no-pivot cascade
    math as vmapped XLA — the fast batch path (round-4 measured on v5e
    at B=256: 1866 solves/s vs 662 for the pivoted hoqp_solve cascade
    and 550 for a vmapped pallas_call, which serializes over its grid).
    cascade="hoqp" keeps the pivoted reference cascade."""
    gains = gains or WbcGains()
    tau_max = jnp.asarray(model.joint_effort, dtype=jnp.float32)
    fused = "xla" if cascade == "xla" else False

    def one(x_des, u_des, input_last, q, v, flags, period, time):
        return hierarchical_wbc_update(model, info, gains, tau_max, x_des,
                                       u_des, input_last, q, v, flags,
                                       period, time, fused_cascade=fused)

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, None, None))


def make_batched_cycle(model: RobotModel, info: C.CentroidalInfo,
                       cfg: QmConfig, loop_cfg=None,
                       gains: WbcGains = None):
    """The FULL closed-loop cycle (1 MPC solve + control ticks x WBC +
    plant substeps; runtime.loop.make_cycle) vmapped over scenarios —
    the BASELINE north-star workload ("thousands of scenarios of MPC+WBC
    per chip"). Returns (vcycle, make_carries):

        vcycle(carries_B, target_B, ms_B, gains) -> (carries_B, metrics_B)
        make_carries(q0, B) -> batched CycleCarry

    The WBC runs the vmappable XLA cascade math (LoopConfig.fused_wbc
    "xla") — a vmapped pallas_call would serialize over its grid."""
    import jax as _jax

    from ..runtime.loop import ControlLoop, LoopConfig, make_cycle
    loop_cfg = loop_cfg or LoopConfig(fused_wbc="xla")
    if loop_cfg.fused_wbc is None or loop_cfg.fused_wbc is True:
        loop_cfg = loop_cfg._replace(fused_wbc="xla")
    cycle, _warm = make_cycle(model, info, cfg, loop_cfg)
    vcycle = _jax.vmap(cycle, in_axes=(0, 0, 0, None))

    def make_carries(q0, B):
        loop = ControlLoop(model, info, cfg, loop_cfg, gains=gains)
        c1 = loop.init_carry(q0)
        return _jax.tree_util.tree_map(
            lambda a: jnp.tile(jnp.asarray(a)[None],
                               (B,) + (1,) * jnp.ndim(a)), c1)

    return vcycle, make_carries
