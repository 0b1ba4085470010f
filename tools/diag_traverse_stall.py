"""Traverse-stall mechanism hunt, part B: instrumented traverse.

Runs the README traverse (cmd_vel with EE held) and logs, once per MPC
chunk:
  - plant base x (achieved)
  - plan terminal base x (X_warm[-1, 6]) — does the OPTIMIZER refuse to
    advance, or does the PLANT fail to execute the plan?
  - per-term stage costs along the converged plan: tracking-base-x,
    tracking-rest, EE penalty, arm barrier, friction barrier
  - per-term gradient of the horizon-summed cost w.r.t. a rigid base-x
    shift of the whole plan (the "leash force"): which term pushes the
    plan backward when the pull (Q_x * lead) pushes it forward.

VERDICT round-3 item #1 hypotheses: (a) plant contact, (b) arm barriers,
(c) cost-gradient equilibrium, (d) target-lead semantics. This tool
falsifies among (b)/(c) directly and separates (a) by the plan-vs-plant
comparison; (d) is checked by printing the re-issued target's lead.

Run: JAX_PLATFORMS=cpu python tools/diag_traverse_stall.py [speed]
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from qm_control_tpu.config import MpcConfig, QmConfig
from qm_control_tpu.experiments import _default_cfg, _loop_cfg, _standing_setup
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.ocp.costs import (arm_limit_cost, ee_residual,
                                      friction_cone_cost, input_cost_weight)
from qm_control_tpu.ocp.reference import (cmd_vel_to_target,
                                          interpolate_ee_pose,
                                          interpolate_state, target_from_knots)
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant)
from qm_control_tpu.runtime.loop import ControlLoop
from qm_control_tpu.gaits.gait import contact_flags_from_mode, mode_at_time


def make_term_probe(model, info, cfg):
    """horizon-summed per-term costs + their gradient w.r.t. a rigid
    base-x shift applied to every plan state."""
    Q = np.asarray(cfg.cost.q_diag) * cfg.cost.q_scaling
    R = input_cost_weight(model, cfg.cost)
    mu_p, mu_o = cfg.cost.ee_mu_position, cfg.cost.ee_mu_orientation
    dt = cfg.mpc.dt

    def terms(shift, X, W_u, t_nodes, flags, target):
        Xs = X.at[:, 6].add(shift)
        mu = jnp.asarray([mu_p] * 3 + [mu_o] * 3, dtype=X.dtype)

        def stage(k):
            x = Xs[k]
            u = W_u[k]
            t = t_nodes[k]
            x_ref = interpolate_state(target, t)
            dx = x - x_ref[:30]
            u_ref = C.weight_compensating_input(info, flags[k]).astype(x.dtype)
            du = u - u_ref
            qb = 0.5 * Q[6] * dx[6] ** 2
            qrest = 0.5 * jnp.sum(jnp.asarray(Q) * dx * dx) - qb
            rc = 0.5 * du @ (jnp.asarray(R, dtype=x.dtype) @ du)
            p_ref, q_ref = interpolate_ee_pose(target, t)
            e = ee_residual(model, x, p_ref, q_ref)
            eec = 0.5 * jnp.sum(mu * e * e)
            bar = arm_limit_cost(model, x, u, cfg.joint_limits)
            fric = friction_cone_cost(u, flags[k], cfg.friction)
            return jnp.stack([qb, qrest, rc, eec, bar, fric])

        per = jax.vmap(stage)(jnp.arange(W_u.shape[0]))
        return jnp.sum(per, axis=0) * dt

    names = ["Q_base_x", "Q_rest", "R_input", "EE_penalty", "arm_barrier",
             "friction"]
    tot = lambda s, *a: jnp.sum(terms(s, *a))
    grad_all = jax.jit(jax.jacfwd(terms))
    val = jax.jit(terms)
    return names, val, grad_all


def main():
    speed = float(sys.argv[1]) if len(sys.argv) > 1 else -0.1
    cfg = _default_cfg()
    model, info, q0, s = _standing_setup(cfg)
    loop = ControlLoop(model, info, cfg, _loop_cfg(1000.0, 0.0))
    names, val, grad_all = make_term_probe(model, info, cfg)

    max_time = 13.0
    target = target_from_knots([0.0, max_time + 5], [s, s])
    gs = GaitSchedule(GAIT_LIBRARY["stance"])
    gs.insert_template(GAIT_LIBRARY["trot"], 0.5)
    ms = gs.mode_schedule(0.0, max_time + 5)
    carry = loop.init_carry(q0)
    carry = loop.warmup(carry, target, ms, num_solves=25)
    chunk = max(1, int(0.25 * cfg.mpc.mpc_frequency))
    ee_hold = None
    x_start = None
    t_walk = None
    print(f"{'t':>5} {'x_plant':>8} {'x_planT':>8} {'ee_mm':>6} "
          + " ".join(f"{n:>11}" for n in names))
    while float(carry.t) < max_time:
        rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
        x_obs = np.asarray(observation_from_rbd(model, info, rbd,
                                                carry.last_yaw))
        ee_state = np.asarray(rbd[48:55])
        x_now = float(carry.plant.q[0])
        if ee_hold is None and float(carry.t) >= 0.5:
            ee_hold = ee_state.copy()
            x_start = x_now
            t_walk = float(carry.t)
        if ee_hold is not None:
            ramp = min(1.0, (float(carry.t) - t_walk) / 0.5)
            v_cmd = [speed * ramp, 0, 0, 0]
            hold = ee_hold.copy()
        else:
            v_cmd = [0, 0, 0, 0]
            hold = ee_state.copy()
        target, _ = cmd_vel_to_target(v_cmd, hold, float(carry.t),
                                      x_obs, ee_state, cfg.reference)
        carry, m = loop.run(carry, target, ms, num_cycles=chunk)
        # probe the converged plan (X_warm is the previous solve's states)
        X = carry.X_warm
        N = X.shape[0] - 1
        t_nodes = float(carry.t) + cfg.mpc.dt * jnp.arange(N + 1,
                                                           dtype=jnp.float32)
        flags = jax.vmap(lambda tt: contact_flags_from_mode(
            mode_at_time(ms, tt)).astype(jnp.float32))(t_nodes[:-1])
        Wu = carry.W_warm  # (N, 30) reduced inputs: probe uses them as-is
        # map reduced -> physical inputs via the OCP input map if needed:
        # the W stored in the carry is the reduced parameterization; the
        # R/friction terms here are qualitative (the leash question is
        # about STATE terms, which are exact).
        g = np.asarray(grad_all(jnp.asarray(0.0, jnp.float32), X[:-1], Wu,
                                t_nodes, flags, target))
        v = np.asarray(val(jnp.asarray(0.0, jnp.float32), X[:-1], Wu,
                           t_nodes, flags, target))
        ee_mm = 1e3 * float(np.asarray(m.ee_pos_err)[-1])
        print(f"{float(carry.t):5.2f} {x_now - (x_start or 0):8.4f} "
              f"{float(X[-1, 6]) - (x_start or 0):8.4f} {ee_mm:6.2f} "
              + " ".join(f"{gi:11.2f}" for gi in g),
              flush=True)
        sys.stdout.flush()
    print("values at end:", dict(zip(names, v.tolist())))


if __name__ == "__main__":
    main()
