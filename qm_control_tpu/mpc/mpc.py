"""MPC solve + policy evaluation.

Replaces OCS2 `SqpMpc::run` + `MPC_MRT_Interface::evaluatePolicy`
(reference QMController.cpp:286-334, :128-146). One fully-fused jitted
device function per MPC step — no host round-trips inside the solve
(SURVEY.md §7 hard part #4) — and a jit-safe policy interpolator for the
tracking loop.

Warm starting mirrors OCS2's non-cold-start behavior: the previous (X, W)
trajectories are time-shifted onto the new horizon; the tail is filled
with the last value (coldStart false, task.info:135).
"""
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QmConfig
from ..gaits.gait import ModeSchedule, mode_at_time
from ..models import centroidal as C
from ..models.spec import RobotModel
from ..ocp.problem import OcpParams, make_node_data, make_ocp
from ..ocp.reference import TargetTrajectory
from ..solver.ilqr import IlqrSettings
from ..solver.sqp import SqpSettings, sqp_solve


class MpcPolicy(NamedTuple):
    """Time-indexed optimized policy (the MRT policy buffer content)."""
    t_nodes: jnp.ndarray   # (N+1,)
    X: jnp.ndarray         # (N+1, 30) optimized states
    U: jnp.ndarray         # (N+1, 30) optimized physical inputs (last repeated)
    modes: jnp.ndarray     # (N+1,) int32 planned modes at the nodes
    cost: jnp.ndarray      # scalar solver cost
    W: jnp.ndarray         # (N, nw) reduced inputs (warm-start state)
    alpha: jnp.ndarray     # accepted line-search step of the last iteration
    defect: jnp.ndarray    # max |defect| at the returned iterate


def evaluate_policy(policy: MpcPolicy, t):
    """(x_des(30), u_des(30), mode) at time t — linear interpolation between
    nodes, mode piecewise-constant (OCS2 MRT evaluatePolicy semantics)."""
    tn = policy.t_nodes
    idx = jnp.clip(jnp.searchsorted(tn, t, side="right") - 1, 0,
                   tn.shape[0] - 2)
    t0, t1 = tn[idx], tn[idx + 1]
    a = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    x = (1 - a) * policy.X[idx] + a * policy.X[idx + 1]
    u = (1 - a) * policy.U[idx] + a * policy.U[idx + 1]
    return x, u, policy.modes[idx]


class MpcSolver:
    """Host-side wrapper owning the jitted MPC step.

    Usage:
        mpc = MpcSolver(model, info, cfg)
        policy = mpc.solve(t, x, target, mode_schedule)   # warm-starts itself
    """

    def __init__(self, model: RobotModel, info: C.CentroidalInfo,
                 cfg: QmConfig, settings: Optional[SqpSettings] = None):
        self.model = model
        self.info = info
        self.cfg = cfg
        self.settings = settings or SqpSettings(
            num_iterations=cfg.mpc.num_iterations)
        self.N = cfg.mpc.num_nodes
        self._W_prev = None
        self._X_prev = None
        self._t_prev = None
        # Build OCP closures eagerly (construction-time numpy precompute
        # inside make_stage_cost must not run under a jit trace).
        self._ocp = make_ocp(model, info, cfg)
        self._step = jax.jit(partial(mpc_step, self._ocp, model, info, cfg,
                                     self.settings))

    def reset(self):
        self._W_prev = None
        self._X_prev = None
        self._t_prev = None

    def solve(self, t, x, target: TargetTrajectory,
              ms: ModeSchedule) -> MpcPolicy:
        cold = self._W_prev is None or self.cfg.mpc.cold_start
        if cold:
            W_warm = jnp.zeros((self.N, 30), dtype=jnp.float32)
            X_warm = jnp.zeros((self.N + 1, 30), dtype=jnp.float32)
            shift = jnp.asarray(0.0, dtype=jnp.float32)
        else:
            W_warm = self._W_prev
            X_warm = self._X_prev
            shift = jnp.asarray(t - self._t_prev, dtype=jnp.float32)
        policy = self._step(jnp.asarray(t, dtype=jnp.float32),
                            jnp.asarray(x, dtype=jnp.float32),
                            target, ms, W_warm, X_warm, shift,
                            jnp.asarray(cold))
        self._W_prev = policy.W
        self._X_prev = policy.X
        self._t_prev = t
        return policy


def shift_warm_start(W, shift, dt):
    """Shift a previous trajectory by `shift` seconds onto the new horizon.

    Linear interpolation at the fractional node positions (OCS2 interpolates
    the previous primal solution at the new node times). With the default
    MPC period (10 ms) below the node spacing (15 ms), integer-node shifting
    would always round to zero and the warm start would stay permanently one
    MPC period stale; fractional interpolation keeps it time-aligned.
    Beyond the old horizon the last value repeats.
    """
    N = W.shape[0]
    pos = jnp.arange(N, dtype=W.dtype) + shift / dt
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, N - 1)
    i1 = jnp.clip(i0 + 1, 0, N - 1)
    a = jnp.clip(pos - i0.astype(W.dtype), 0.0, 1.0)[:, None]
    return (1.0 - a) * W[i0] + a * W[i1]


def mpc_step(ocp, model: RobotModel, info: C.CentroidalInfo, cfg: QmConfig,
             settings: SqpSettings, t, x, target: TargetTrajectory,
             ms: ModeSchedule, W_warm, X_warm, warm_shift,
             cold, ee_wrench=None) -> MpcPolicy:
    """One MPC solve (pure function; jit once, call every cycle).

    ee_wrench: optional measured world wrench [f(3); tau(3)] at the arm
    EE, fed through to the OCP dynamics — DISTURBANCE-AWARE planning,
    a capability beyond the reference (its MPC never sees the wrench;
    measured here: the WBC alone braces a sustained lateral EE force up
    to ~20 N, the wrench-aware MPC extends that). Trace-time opt-in
    (None = off): the wrench term costs one extra EE FK per flow
    evaluation."""
    dynamics, input_of = ocp.dynamics, ocp.input_of
    params = make_node_data(ms, target, x, t, cfg)

    node_data = (params.t_nodes[:-1], params.contact_flags[:-1],
                 params.swing_zdot[:-1])
    final_data = params.t_nodes[-1]

    wr = ee_wrench
    dyn = lambda kd, xx, ww: dynamics(kd[0], kd[1], kd[2], xx, ww,
                                      ee_wrench=wr)
    sc = lambda kd, xx, ww: ocp.stage_cost(kd[0], kd[1], kd[2], xx, ww,
                                           target)
    fc = lambda fd, xx: ocp.final_cost(fd, xx, target)
    sq = lambda kd, xx, ww: ocp.stage_quadratize(kd[0], kd[1], kd[2], xx,
                                                 ww, target)
    fq = lambda fd, xx: ocp.final_quadratize(fd, xx, target)
    cd = lambda kd, xx, ww: ocp.cost_and_dynamics(kd[0], kd[1], kd[2], xx,
                                                  ww, target, ee_wrench=wr)
    sl = lambda kd, xx, ww: ocp.stage_linearize(kd[0], kd[1], kd[2], xx,
                                                ww, target, ee_wrench=wr)

    # QMInitializer equivalent (reference qm_interface/src/initialization/
    # QMInitializer.cpp:18-41): input = weight-compensating contact forces
    # for each node's contact flags; state = current state tiled over the
    # horizon (multiple shooting keeps this bounded — no rollout blowup).
    W_init = jax.vmap(
        lambda f: C.weight_compensating_input(info, f))(
            params.contact_flags[:-1]).astype(W_warm.dtype)
    X_init = jnp.tile(params.x0[None], (cfg.mpc.num_nodes + 1, 1))
    W0 = jnp.where(cold, W_init,
                   shift_warm_start(W_warm, warm_shift, cfg.mpc.dt))
    X0 = jnp.where(cold, X_init,
                   shift_warm_start(X_warm, warm_shift, cfg.mpc.dt))
    sol = sqp_solve(dyn, sc, fc, node_data, final_data, params.x0, X0, W0,
                    settings, stage_quad=sq, final_quad=fq,
                    cost_and_dynamics=cd, stage_linearize=sl)

    U = jax.vmap(input_of)(params.t_nodes[:-1], params.contact_flags[:-1],
                           params.swing_zdot[:-1], sol.X[:-1], sol.W)
    U = jnp.concatenate([U, U[-1:]], axis=0)
    modes = jax.vmap(lambda tt: mode_at_time(ms, tt))(params.t_nodes)
    return MpcPolicy(t_nodes=params.t_nodes, X=sol.X, U=U, modes=modes,
                     cost=sol.cost, W=sol.W, alpha=sol.alpha,
                     defect=sol.defect)
