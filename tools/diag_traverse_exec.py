"""Traverse-stall mechanism hunt, part C: plan-vs-execution at the base.

Part B (diag_traverse_stall.py) falsified the cost-equilibrium hypotheses:
at the stall the plan keeps promising ~0.07 m of progress inside its 1 s
horizon (net rigid-shift cost gradient ~+23 TOWARD progress; arm barriers
and friction ~0), yet the plant saturates at ~0.115 m. So the leash is in
EXECUTION. This tool measures, per MPC chunk:

  - promised vs achieved displacement over the chunk:
      plan:   x_plan(t0 + chunk) - x_plan(t0)
      plant:  x_plant(t0 + chunk) - x_plant(t0)
    and their running ratio (the per-cycle execution efficiency);
  - the plan's displacement PROFILE (is progress front- or back-loaded?):
      dx at +0.1 s, +0.25 s, +0.5 s, +1.0 s from plan start;
  - plant foot-grip saturation: max over feet of |f_t| / (mu * f_n)
    (1.0 = sliding) and the per-chunk anchor drag — hypothesis (a);
  - base-x velocity: planned vcom_x at node 0 vs plant base velocity.

Usage: JAX_PLATFORMS=cpu python tools/diag_traverse_exec.py [speed] [mu]
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qm_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax
import jax.numpy as jnp
import numpy as np

from qm_control_tpu.experiments import _default_cfg, _loop_cfg, _standing_setup
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.ocp.reference import cmd_vel_to_target, target_from_knots
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant)
from qm_control_tpu.runtime.loop import ControlLoop
from qm_control_tpu.runtime.plant import contact_forces


def main():
    speed = float(sys.argv[1]) if len(sys.argv) > 1 else -0.1
    mu = float(sys.argv[2]) if len(sys.argv) > 2 else None
    cfg = _default_cfg()
    model, info, q0, s = _standing_setup(cfg)
    lcfg = _loop_cfg(1000.0, 0.0)
    if mu is not None:
        lcfg = lcfg._replace(plant=lcfg.plant._replace(friction_mu=mu))
    loop = ControlLoop(model, info, cfg, lcfg)

    max_time = 13.0
    target = target_from_knots([0.0, max_time + 5], [s, s])
    gs = GaitSchedule(GAIT_LIBRARY["stance"])
    gs.insert_template(GAIT_LIBRARY["trot"], 0.5)
    ms = gs.mode_schedule(0.0, max_time + 5)
    carry = loop.init_carry(q0)
    carry = loop.warmup(carry, target, ms, num_solves=25)
    chunk = max(1, int(0.25 * cfg.mpc.mpc_frequency))
    dt_nodes = cfg.mpc.dt
    ee_hold = None
    x_start = None
    t_walk = None
    x_prev = float(carry.plant.q[0])
    plan_promise_prev = 0.0
    print(f"mu={lcfg.plant.friction_mu}  speed={speed}")
    print(f"{'t':>5} {'x_plant':>8} {'ach':>7} {'promis':>7} {'eff':>5} "
          f"{'dx@.1':>6} {'dx@.25':>6} {'dx@.5':>6} {'dx@1.0':>6} "
          f"{'grip':>5} {'vx_plan':>7} {'vx_act':>7}")
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
        X = np.asarray(carry.X_warm)
        x0p = X[0, 6]
        prof = [X[min(int(round(a / dt_nodes)), X.shape[0] - 1), 6] - x0p
                for a in (0.1, 0.25, 0.5, 1.0)]
        achieved = float(carry.plant.q[0]) - x_prev
        eff = (achieved / plan_promise_prev
               if abs(plan_promise_prev) > 1e-6 else float("nan"))
        # plant grip saturation at current state
        fc, _, _, _ = contact_forces(model, lcfg.plant, carry.plant.q,
                                     carry.plant.v, carry.plant.anchors)
        fc = np.asarray(fc)
        fn = fc[:, 2]
        ft = np.linalg.norm(fc[:, :2], axis=1)
        grip = float(np.max(ft / np.maximum(lcfg.plant.friction_mu * fn,
                                            1e-6)))
        vx_plan = float(X[0, 0])   # normalized momentum ~ vcom_x of plan
        vx_act = float(carry.plant.v[0])
        print(f"{float(carry.t):5.2f} {x_now - (x_start or 0):8.4f} "
              f"{achieved:7.4f} {plan_promise_prev:7.4f} {eff:5.2f} "
              + " ".join(f"{p:6.3f}" for p in prof)
              + f" {grip:5.2f} {vx_plan:7.3f} {vx_act:7.3f}", flush=True)
        x_prev = float(carry.plant.q[0])
        plan_promise_prev = prof[1]   # plan's promise for the next 0.25 s


if __name__ == "__main__":
    main()
