"""Which stage-cost term grows with the displaced (arm-stretched,
EE-held) configuration?"""
import os, sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from qm_control_tpu.experiments import _default_cfg, _standing_setup
from qm_control_tpu.ocp.costs import (arm_limit_cost, ee_residual,
                                      friction_cone_cost, input_cost_weight)
from qm_control_tpu.ocp.reference import cmd_vel_to_target, interpolate_state
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant)
from diag_tick_probe import load_carry

cfg = _default_cfg()
model, info, q0, s = _standing_setup(cfg)
carry, ee_hold, x_start = load_carry()
rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
x_obs0 = observation_from_rbd(model, info, rbd, carry.last_yaw)
p_ref = jnp.asarray(ee_hold[:3], jnp.float32)
q_ref = jnp.asarray([ee_hold[6], ee_hold[3], ee_hold[4], ee_hold[5]], jnp.float32)
mu = jnp.asarray([2000.]*3 + [1000.]*3, jnp.float32)
Q = jnp.asarray(np.asarray(cfg.cost.q_diag) * cfg.cost.q_scaling, jnp.float32)
R = jnp.asarray(input_cost_weight(model, cfg.cost), jnp.float32)

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

print(f"{'dx':>6} {'Q_vcom':>8} {'Q_base':>8} {'Q_legs':>8} {'Q_arm':>8} "
      f"{'R_in':>8} {'EE':>8} {'armbar':>8} {'fric':>8}")
for dx in (0.0, -0.10, -0.20):
    x = jnp.asarray(x_obs0).at[6].add(dx).at[0].set(0.).at[1].set(0.)
    x = arm_hold(x)
    ee_now = np.concatenate([np.asarray(p_ref), [ee_hold[3], ee_hold[4],
                                                 ee_hold[5], ee_hold[6]]])
    target, _ = cmd_vel_to_target([-0.1, 0, 0, 0], ee_hold.copy(),
                                  float(carry.t), np.asarray(x), ee_now,
                                  cfg.reference)
    # stage cost at t=carry.t (stationary state, weight-compensating input)
    x_ref = interpolate_state(target, carry.t + 0.5)
    dxv = x - x_ref[:30]
    u = C.weight_compensating_input(info, jnp.ones(4)).astype(jnp.float32)
    u_ref = u
    terms = [
        0.5*jnp.sum(Q[:6]*dxv[:6]**2),
        0.5*jnp.sum(Q[6:12]*dxv[6:12]**2),
        0.5*jnp.sum(Q[12:24]*dxv[12:24]**2),
        0.5*jnp.sum(Q[24:30]*dxv[24:30]**2),
        0.0,
        0.5*jnp.sum(mu*ee_residual(model, x, p_ref, q_ref)**2),
        arm_limit_cost(model, x, u, cfg.joint_limits),
        friction_cone_cost(u, jnp.ones(4), cfg.friction)]
    print(f"{dx:+.2f}  " + " ".join(f"{float(t):8.3f}" for t in terms))
    print("   arm q:", np.round(np.asarray(x[24:30]), 3),
          " legs dq:", np.round(np.asarray(dxv[12:24]), 2))
