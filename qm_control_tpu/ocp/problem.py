"""Discrete-time OCP assembly: dynamics + costs in reduced input space.

The TPU-native equivalent of QMInterface::setupOptimalControlProblem
(reference qm_interface/src/QMInterface.cpp:79-142). The decision input is
w (the free coordinates of u after analytic equality-constraint
elimination, see constraints.py); the solver (solver/ilqr.py) is a clean
unconstrained iLQR over

    x_{k+1} = F_k(x_k, w_k)          (RK2, zero-order-hold u at the node)
    sum_k dt * L_k(x_k, w_k) + Phi(x_N)

Per-node data (times, contact flags, swing z-velocity references,
interpolated targets) is precomputed into padded arrays — one compiled
program serves every gait/target (SURVEY.md §7 hard part #2).
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import QmConfig
from ..gaits.gait import ModeSchedule, contact_flags_at_time
from ..gaits.swing import SwingConfig, swing_z_reference
from ..models import centroidal as C
from ..models.spec import RobotModel
from .constraints import apply_input_param, input_parameterization
from .costs import (make_stage_cost, make_stage_quadratizer,
                    make_stage_quadratizer_parts)
from .reference import TargetTrajectory, interpolate_ee_pose


class OcpParams(NamedTuple):
    """Per-solve data (all arrays; a valid jit argument)."""
    t_nodes: jnp.ndarray        # (N+1,) absolute node times
    contact_flags: jnp.ndarray  # (N+1, 4) float 0/1
    swing_zdot: jnp.ndarray     # (N+1, 4) swing normal-velocity references
    target: TargetTrajectory    # padded target knots
    x0: jnp.ndarray             # (30,) initial state


def make_node_data(ms: ModeSchedule, target: TargetTrajectory, x0,
                   t_start, cfg: QmConfig, dtype=jnp.float32) -> OcpParams:
    """Device-side precomputation of per-node schedule data.

    Equivalent of the reference's preSolverRun (gait -> mode schedule;
    SwingTrajectoryPlanner update) + QMPreComputation per-node queries.
    """
    N = cfg.mpc.num_nodes
    dt = cfg.mpc.dt
    t_nodes = t_start + dt * jnp.arange(N + 1, dtype=dtype)
    horizon_end = t_start + cfg.mpc.time_horizon
    swing_cfg = SwingConfig(
        lift_off_velocity=cfg.swing.lift_off_velocity,
        touch_down_velocity=cfg.swing.touch_down_velocity,
        swing_height=cfg.swing.swing_height,
        touchdown_after_horizon=cfg.swing.touchdown_after_horizon,
        swing_time_scale=cfg.swing.swing_time_scale)

    def node_data(t):
        flags = contact_flags_at_time(ms, t).astype(dtype)
        zdots = jnp.stack([
            swing_z_reference(ms, f, t, horizon_end, swing_cfg)[1]
            for f in range(4)])
        return flags, zdots

    flags, zdots = jax.vmap(node_data)(t_nodes)
    return OcpParams(t_nodes=t_nodes, contact_flags=flags, swing_zdot=zdots,
                     target=target, x0=jnp.asarray(x0, dtype=dtype))


class Ocp(NamedTuple):
    """Closure bundle for one optimal-control problem (make_ocp)."""
    dynamics: object           # (t, flags, zdot, x, w) -> x_next (RK2)
    stage_cost: object         # (t, flags, zdot, x, w, target) -> dt*L
    final_cost: object         # (t, x, target) -> Phi
    input_of: object           # (t, flags, zdot, x, w) -> u(30)
    stage_quadratize: object   # -> (l, lx, lw, lxx, lww, lwx)
    final_quadratize: object   # -> (l, lx, lxx)
    cost_and_dynamics: object  # fused (cost, x_next)
    stage_linearize: object    # fused (A, B, l, lx, lw, lxx, lww, lwx)


def make_ocp(model: RobotModel, info: C.CentroidalInfo, cfg: QmConfig) -> Ocp:
    """Build the OCP closures (see Ocp fields).

    k_data = (t, contact_flags(4,), swing_zdot(4,)) is one node's
    slice (so the solver can lax.scan over nodes).
    """
    stage_l, final_l = make_stage_cost(model, info, cfg)
    stage_q, final_q = make_stage_quadratizer(model, info, cfg)
    stage_q_xu = make_stage_quadratizer_parts(model, info, cfg)
    dt = cfg.mpc.dt

    def input_of(t, flags, zdot, x, w):
        p = input_parameterization(model, info, x, flags, zdot)
        return apply_input_param(p, w)

    def flow(x, u, ee_wrench=None):
        return C.flow_map(model, info, x, u, ee_wrench=ee_wrench)

    def dynamics(t, flags, zdot, x, w, ee_wrench=None):
        # ee_wrench: optional measured world wrench fed through to the
        # dynamics — DISTURBANCE-AWARE planning (the reference's MPC
        # never sees the wrench; trace-time opt-in because the wrench
        # term costs one extra EE FK per flow evaluation)
        u = input_of(t, flags, zdot, x, w)
        # RK2 midpoint, zero-order-hold input (sqp.integratorType RK2,
        # task.info:92)
        k1 = flow(x, u, ee_wrench)
        k2 = flow(x + 0.5 * dt * k1, u, ee_wrench)
        return x + dt * k2

    def stage_cost(t, flags, zdot, x, w, target: TargetTrajectory):
        u = input_of(t, flags, zdot, x, w)
        return dt * stage_l(t, x, u, target, flags)

    def cost_and_dynamics(t, flags, zdot, x, w, target: TargetTrajectory,
                          ee_wrench=None):
        """Fused stage cost + next state: evaluates the (FK-heavy) input
        reparameterization ONCE — the solver's merit needs both."""
        u = input_of(t, flags, zdot, x, w)
        c = dt * stage_l(t, x, u, target, flags)
        k1 = flow(x, u, ee_wrench)
        k2 = flow(x + 0.5 * dt * k1, u, ee_wrench)
        return c, x + dt * k2

    def final_cost(t, x, target: TargetTrajectory):
        return final_l(t, x, target)

    def stage_quadratize(t, flags, zdot, x, w, target: TargetTrajectory):
        """(l, lx, lw, lxx, lww, lwx): Gauss-Newton quadratization pulled
        back through the input reparameterization u = u0(x) + N(x) w
        (second derivatives of (u0, N) w.r.t. x dropped — the same
        approximation OCS2 makes when projecting state-input equality
        constraints with a state-dependent basis)."""
        p = input_parameterization(model, info, x, flags, zdot)
        u = apply_input_param(p, w)
        Ju = jax.jacfwd(lambda xx: apply_input_param(
            input_parameterization(model, info, xx, flags, zdot), w))(x)
        L, Lx, Lu, Lxx, Luu, Lux = stage_q(t, x, u, target, flags)
        N = p.N
        LuuJu = Luu @ Ju
        lx = Lx + Ju.T @ Lu
        lw = N.T @ Lu
        lxx = Lxx + Ju.T @ Lux + Lux.T @ Ju + Ju.T @ LuuJu
        lww = N.T @ Luu @ N
        lwx = N.T @ (Lux + LuuJu)
        return (dt * L, dt * lx, dt * lw, dt * lxx, dt * lww, dt * lwx)

    def final_quadratize(t, x, target: TargetTrajectory):
        return final_q(t, x, target)

    def stage_linearize(t, flags, zdot, x, w, target: TargetTrajectory,
                        ee_wrench=None):
        """Fused dynamics linearization + cost quadratization: ONE
        jax.linearize over z = (x, w) of the combined (x_next, u, e_ee)
        map yields A, B, the input-map Jacobian du/dx, N = du/dw, AND the
        EE-residual Jacobian Je together — every FK in the stage is
        evaluated and differentiated exactly once."""
        from .costs import ee_residual
        z0 = jnp.concatenate([x, w])
        p_ref, q_ref = interpolate_ee_pose(target, t)

        def f(z):
            xx, ww = z[:30], z[30:]
            p = input_parameterization(model, info, xx, flags, zdot)
            uu = apply_input_param(p, ww)
            k1 = flow(xx, uu, ee_wrench)
            k2 = flow(xx + 0.5 * dt * k1, uu, ee_wrench)
            e = ee_residual(model, xx, p_ref, q_ref)
            return jnp.concatenate([xx + dt * k2, uu, e])

        out, f_jvp = jax.linearize(f, z0)
        u, e = out[30:60], out[60:]
        J = jax.vmap(f_jvp)(jnp.eye(60, dtype=x.dtype)).T
        A, B = J[:30, :30], J[:30, 30:]
        Ju, N = J[30:60, :30], J[30:60, 30:]
        Je = J[60:, :30]
        L, Lx, Lu, Lxx, Luu, Lux = stage_q_xu(t, x, u, target, flags, e, Je)
        LuuJu = Luu @ Ju
        lx = Lx + Ju.T @ Lu
        lw = N.T @ Lu
        lxx = Lxx + Ju.T @ Lux + Lux.T @ Ju + Ju.T @ LuuJu
        lww = N.T @ Luu @ N
        lwx = N.T @ (Lux + LuuJu)
        return (A, B, dt * L, dt * lx, dt * lw, dt * lxx, dt * lww,
                dt * lwx)

    if cfg.mpc.structured_linearize:
        from .linearize import make_structured_linearize
        stage_linearize = make_structured_linearize(model, info, cfg)

    return Ocp(dynamics, stage_cost, final_cost, input_of,
               stage_quadratize, final_quadratize, cost_and_dynamics,
               stage_linearize)
