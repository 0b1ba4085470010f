"""THE round-5 stall question, asked directly in plan space.

From the stalled carry (tools/diag_save_stall.py):
  (a) converged solve with the re-anchored cmd-vel target: does the
      PLAN walk within its own 1 s horizon? (full-horizon bx profile)
  (b) same state, target anchored at a FIXED world goal 0.3 m back
      (goal-pose semantics, no re-anchoring): how far does the plan
      walk then? Distinguishes weak-cmd-vel-pull vs a hard leash.
  (c) cmd-vel with TIME_TO_TARGET x3: is the stall set by the lead
      distance v*TTT?
  (d) plan-space fixpoint map: x <- plan(x + one period), target
      re-anchored each step (PERFECT execution, no WBC/plant). If this
      also stalls at ~v*1.1s the stall is an OCP x re-anchoring
      property and the plant/WBC are exonerated.

Usage: JAX_PLATFORMS=cpu python tools/diag_plan_horizon.py [speed]
"""
import os, sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qm_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from qm_control_tpu.experiments import _default_cfg, _standing_setup
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.mpc.mpc import mpc_step
from qm_control_tpu.ocp.problem import make_ocp
from qm_control_tpu.ocp import reference as R
from qm_control_tpu.ocp.reference import cmd_vel_to_target, interpolate_state
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant)
from qm_control_tpu.solver.sqp import SqpSettings
from diag_tick_probe import load_carry

speed = float(sys.argv[1]) if len(sys.argv) > 1 else -0.1
cfg = _default_cfg()
model, info, q0, s = _standing_setup(cfg)
carry, ee_hold, x_start = load_carry()
gs = GaitSchedule(GAIT_LIBRARY["stance"])
gs.insert_template(GAIT_LIBRARY["trot"], 0.5)
ocp = make_ocp(model, info, cfg)
rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
x_obs = observation_from_rbd(model, info, rbd, carry.last_yaw)
ee_state = np.asarray(rbd[48:55])
N = cfg.mpc.num_nodes
st = SqpSettings(num_iterations=15)
dt_node = cfg.mpc.time_horizon / (N - 1)


def ms_at(t):
    return gs.mode_schedule(max(0.0, t - 0.5), t + cfg.mpc.time_horizon + 1.0)


def solve(t, x, target, warm_W=None, warm_X=None):
    W = jnp.zeros((N, 30), jnp.float32) if warm_W is None else warm_W
    X = jnp.zeros((N + 1, 30), jnp.float32) if warm_X is None else warm_X
    return mpc_step(ocp, model, info, cfg, st, jnp.float32(t), x, target,
                    ms_at(float(t)), W, X, jnp.float32(0.0),
                    jnp.asarray(True))


def show(name, pol, x0):
    X = np.asarray(pol.X)
    bx = (X[:, 6] - float(x0[6])) * 1e3
    idx = [0, 5, 10, 20, 33, 50, 66]
    print(f"{name:34s} bx[mm]@node: "
          + " ".join(f"{bx[i]:+7.1f}" for i in idx)
          + f"  vx@0/10/33: {X[0,0]:+.3f} {X[10,0]:+.3f} {X[33,0]:+.3f}")


t0 = float(carry.t)
x0 = jnp.asarray(x_obs)
print(f"stalled state: t={t0:.2f} x={float(x0[6]):+.4f} "
      f"(start {x_start:+.4f}, displacement {float(x0[6])-x_start:+.4f})")

# (a) converged plan, re-anchored cmd-vel target
tgt, _ = cmd_vel_to_target([speed, 0, 0, 0], ee_hold.copy(), t0,
                           np.asarray(x0), ee_state, cfg.reference)
pol = solve(t0, x0, tgt)
show(f"(a) cmd_vel {speed}", pol, x0)

# (b) fixed world goal 0.3 m back of the START (goal-pose anchoring)
goal = np.asarray(x0, dtype=np.float64).copy()
goal_x = x_start - 0.3
tgt_b = tgt
sb = np.asarray(interpolate_state(tgt, t0))
s0, s1 = sb.copy(), sb.copy()
s0[:6] = 0.0
s1[:6] = 0.0
s0[6] = float(x0[6]); s1[6] = goal_x
from qm_control_tpu.ocp.reference import target_from_knots
# EE stays at the hold in both knots (indices 30:37 of the 37-dim target)
s0[30:33] = ee_hold[:3]; s1[30:33] = ee_hold[:3]
s0[33:37] = ee_hold[3:7]   # quat xyzw, same layout as the rbd EE state
s1[33:37] = s0[33:37]
dist = abs(goal_x - float(x0[6]))
t_arr = t0 + max(1.0, dist / max(abs(speed), 1e-3))
tgt_b = target_from_knots([t0, t_arr], [s0, s1])
pol_b = solve(t0, x0, tgt_b)
show(f"(b) fixed goal @{goal_x - x_start:+.2f}m", pol_b, x0)

# (c) cmd-vel with 3x TIME_TO_TARGET
ttt0 = R.TIME_TO_TARGET
R.TIME_TO_TARGET = 3.0 * ttt0
tgt_c, _ = cmd_vel_to_target([speed, 0, 0, 0], ee_hold.copy(), t0,
                             np.asarray(x0), ee_state, cfg.reference)
R.TIME_TO_TARGET = ttt0
pol_c = solve(t0, x0, tgt_c)
show("(c) cmd_vel 3x TTT", pol_c, x0)

# (d) plan-space fixpoint map from the STANDING start (no plant):
# execute k nodes of each converged plan, re-anchor, repeat.
print("\n(d) plan-space re-anchoring map (perfect execution, no plant):")
for k_exec in (1, 3, 10):
    x = jnp.asarray(x_obs)  # start from the stalled state
    t = t0
    W = jnp.zeros((N, 30), jnp.float32)
    X = jnp.zeros((N + 1, 30), jnp.float32)
    steps = int(round(6.0 / (k_exec * dt_node)))
    steps = min(steps, 120)
    for i in range(steps):
        tgt, _ = cmd_vel_to_target([speed, 0, 0, 0], ee_hold.copy(), t,
                                   np.asarray(x), ee_state, cfg.reference)
        pol = solve(t, x, tgt, None, None)
        x = pol.X[k_exec]
        t += k_exec * dt_node
        W, X = pol.W, pol.X
    print(f"  k_exec={k_exec:2d} ({k_exec*dt_node*1e3:.0f} ms/step): after "
          f"{steps*k_exec*dt_node:.1f}s plan-time, x = "
          f"{float(x[6]) - x_start:+.4f} m from start "
          f"(ideal {speed * steps * k_exec * dt_node:+.3f})")
