"""Converged OCP cost vs base displacement: from the stalled state, shift
the base by dx (arm joints re-optimized to hold the EE), rebuild the
cmd_vel target AT that state (reference re-anchoring semantics), and
compare converged costs. Decreasing cost-with-displacement = the global
walk is favorable and the stall is a closed-loop trap."""
import os, sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from qm_control_tpu.experiments import _default_cfg, _standing_setup
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.mpc.mpc import mpc_step
from qm_control_tpu.ocp.problem import make_ocp
from qm_control_tpu.ocp.reference import cmd_vel_to_target
from qm_control_tpu.ocp.costs import ee_residual, arm_limit_cost
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant)
from qm_control_tpu.solver.sqp import SqpSettings
from diag_tick_probe import load_carry

cfg = _default_cfg()
model, info, q0, s = _standing_setup(cfg)
carry, ee_hold, x_start = load_carry()
gs = GaitSchedule(GAIT_LIBRARY["stance"]); gs.insert_template(GAIT_LIBRARY["trot"], 0.5)
ms = gs.mode_schedule(max(0.0, float(carry.t) - 0.5), float(carry.t) + 3.0)  # receding window (MAX_EVENTS raise)
ocp = make_ocp(model, info, cfg)
rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
x_obs0 = observation_from_rbd(model, info, rbd, carry.last_yaw)
p_ref = jnp.asarray(ee_hold[:3], jnp.float32)
q_ref = jnp.asarray([ee_hold[6], ee_hold[3], ee_hold[4], ee_hold[5]], jnp.float32)
mu = jnp.asarray([2000.]*3 + [1000.]*3, jnp.float32)
N = cfg.mpc.num_nodes
st = SqpSettings(num_iterations=20)

def arm_hold(x):
    def cost(qa):
        xx = x.at[24:30].set(qa)
        e = ee_residual(model, xx, p_ref, q_ref)
        return 0.5*jnp.sum(mu*e*e) + arm_limit_cost(model, xx, jnp.zeros(30),
                                                    cfg.joint_limits)
    qa = x[24:30]
    g = jax.jit(jax.grad(cost)); H = jax.jit(jax.hessian(cost))
    for _ in range(40):
        qa = qa - jnp.linalg.solve(H(qa)+1e-6*jnp.eye(6), g(qa))
    return x.at[24:30].set(qa)

for dx in (0.0, -0.03, -0.06, -0.10, -0.15, -0.20):
    x = jnp.asarray(x_obs0).at[6].add(dx)
    x = x.at[0].set(0.0).at[1].set(0.0)   # at rest
    x = arm_hold(x)
    ee_state = np.zeros(7); 
    e = np.asarray(ee_residual(model, x, p_ref, q_ref))
    # rebuild target at this state (re-anchor like the publisher)
    rbd_fake = np.zeros(55)
    ee_now = np.concatenate([np.asarray(p_ref + jnp.asarray(e[:3])),
                             [ee_hold[3], ee_hold[4], ee_hold[5], ee_hold[6]]])
    target, _ = cmd_vel_to_target([-0.1, 0, 0, 0], ee_hold.copy(),
                                  float(carry.t), np.asarray(x), ee_now,
                                  cfg.reference)
    pol = mpc_step(ocp, model, info, cfg, st, carry.t, x, target, ms,
                   jnp.zeros((N,30),jnp.float32), jnp.zeros((N+1,30),jnp.float32),
                   jnp.float32(0.0), jnp.asarray(True))
    bx = np.asarray(pol.X)[:,6] - float(x[6])
    print(f"dx={dx:+.2f}: hold_ee_err={np.linalg.norm(e[:3])*1e3:6.2f} mm "
          f"cost={float(pol.cost):7.3f} plan adv@1s={bx[-1]*1e3:7.1f} mm "
          f"defect={float(pol.defect):.1e}")
