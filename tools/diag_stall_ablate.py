"""Ablations at the stalled state: which cost term causes the plan's
first-100ms dead zone? Re-solve with term knocked out and report the
near-term base-x profile."""
import os, sys, dataclasses
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
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant)
from qm_control_tpu.solver.sqp import SqpSettings
from diag_tick_probe import load_carry

base_cfg = _default_cfg()
model, info, q0, s = _standing_setup(base_cfg)
carry, ee_hold, x_start = load_carry()
gs = GaitSchedule(GAIT_LIBRARY["stance"]); gs.insert_template(GAIT_LIBRARY["trot"], 0.5)
ms = gs.mode_schedule(max(0.0, float(carry.t) - 0.5), float(carry.t) + 3.0)  # receding window (MAX_EVENTS raise)
rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
x_obs = observation_from_rbd(model, info, rbd, carry.last_yaw)
ee_state = np.asarray(rbd[48:55])
target, _ = cmd_vel_to_target([-0.1, 0, 0, 0], ee_hold.copy(),
                              float(carry.t), np.asarray(x_obs), ee_state,
                              base_cfg.reference)
N = base_cfg.mpc.num_nodes
st = SqpSettings(num_iterations=15)

def run(name, cfg):
    ocp = make_ocp(model, info, cfg)
    pol = mpc_step(ocp, model, info, cfg, st, carry.t, x_obs, target, ms,
                   jnp.zeros((N,30),jnp.float32),
                   jnp.zeros((N+1,30),jnp.float32),
                   jnp.float32(0.0), jnp.asarray(True))
    X = np.asarray(pol.X)
    bx = X[:, 6] - float(x_obs[6])
    vx0 = X[:8, 0]
    idx = [0, 7, 13, 20, 33, 66]
    print(f"{name:24s} alpha={float(pol.alpha):4.2f} bx[mm]: "
          + " ".join(f"{bx[i]*1e3:7.1f}" for i in idx)
          + "   vx[0:8]: " + " ".join(f"{v:+.3f}" for v in vx0))

run("baseline", base_cfg)
cc = base_cfg.cost
run("no EE penalty", base_cfg.with_(cost=dataclasses.replace(
    cc, ee_mu_position=0.0, ee_mu_orientation=0.0,
    final_ee_mu_position=0.0, final_ee_mu_orientation=0.0)))
run("no friction barrier", base_cfg.with_(friction=dataclasses.replace(
    base_cfg.friction, barrier_mu=1e-6)))
run("no arm barrier", base_cfg.with_(joint_limits=dataclasses.replace(
    base_cfg.joint_limits, position_mu=1e-9, velocity_mu=1e-9)))
rd = list(cc.r_diag); rd2 = rd[:12] + [v for v in rd[12:24]] + [100.0]*6
run("R_arm vel x0.1", base_cfg.with_(cost=dataclasses.replace(
    cc, r_diag=tuple(rd2))))
rd3 = rd[:12] + [500.0]*12 + rd[24:30]
run("R_leg x0.1", base_cfg.with_(cost=dataclasses.replace(
    cc, r_diag=tuple(rd3))))
