"""At the stalled state: is the back-loaded plan the TRUE optimum, or a
warm-started 1-iteration artifact? Solve cold/warm with many iterations
and compare near-term velocity profiles."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qm_tpu_jax_cache")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from qm_control_tpu.experiments import _default_cfg, _loop_cfg, _standing_setup
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.mpc.mpc import mpc_step
from qm_control_tpu.ocp.problem import make_ocp
from qm_control_tpu.ocp.reference import cmd_vel_to_target
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant)
from qm_control_tpu.solver.sqp import SqpSettings
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from diag_tick_probe import load_carry

cfg = _default_cfg()
model, info, q0, s = _standing_setup(cfg)
carry, ee_hold, x_start = load_carry()
gs = GaitSchedule(GAIT_LIBRARY["stance"]); gs.insert_template(GAIT_LIBRARY["trot"], 0.5)
ms = gs.mode_schedule(max(0.0, float(carry.t) - 0.5), float(carry.t) + 3.0)  # receding window (MAX_EVENTS raise)
ocp = make_ocp(model, info, cfg)
rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
x_obs = observation_from_rbd(model, info, rbd, carry.last_yaw)
ee_state = np.asarray(rbd[48:55])
target, _ = cmd_vel_to_target([-0.1, 0, 0, 0], ee_hold.copy(),
                              float(carry.t), np.asarray(x_obs), ee_state,
                              cfg.reference)
N = cfg.mpc.num_nodes

def solve(iters, cold):
    st = SqpSettings(num_iterations=iters)
    W = jnp.zeros((N, 30), jnp.float32) if cold else carry.W_warm
    X = jnp.zeros((N + 1, 30), jnp.float32) if cold else carry.X_warm
    pol = mpc_step(ocp, model, info, cfg, st, carry.t, x_obs, target, ms,
                   W, X, jnp.float32(0.01), jnp.asarray(cold))
    return pol

for iters, cold in [(1, False), (3, False), (10, False), (10, True), (30, True)]:
    p = solve(iters, cold)
    X = np.asarray(p.X)
    # base x profile relative to current
    bx = X[:, 6] - float(x_obs[6])
    # report plan x displacement at 0.1s intervals
    idx = [0, 7, 13, 20, 33, 66]
    prof = " ".join(f"{bx[i]*1e3:7.1f}" for i in idx)
    print(f"iters={iters:2d} cold={int(cold)} cost={float(p.cost):8.3f} "
          f"defect={float(p.defect):.2e} alpha={float(p.alpha):.2f} "
          f"bx[mm]@nodes{idx}: {prof}")
