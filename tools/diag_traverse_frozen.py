"""Traverse-stall mechanism hunt, part E: frozen-plan execution.

The discriminator between the two surviving hypotheses:

  H-replan: each re-solve restarts a gentle acceleration ramp; only the
    first 10 ms ever executes, so the closed loop is a Zeno loop that
    never accumulates velocity ("perpetual gentle start"). Prediction:
    executing ONE plan open-loop for 0.5-1 s from the stalled state
    covers ~the promised distance.

  H-mismatch: the frozen-SRBD plan is dynamically inconsistent with the
    full-RBD plant at large arm extension (true COM ~7 cm ahead of the
    frozen SRBD COM; arm momentum unmodeled), so the plant cannot execute
    the planned base acceleration regardless of re-solving. Prediction:
    the frozen plan ALSO fails to advance the plant.

Protocol: run the traverse normally to t=8 s (well into the stall), then
switch to a 2 Hz-MPC loop (one solve, 0.5 s of WBC tracking per cycle)
with the target held, and log plant base x vs the plan's promise at each
0.5 s boundary.

Usage: JAX_PLATFORMS=cpu python tools/diag_traverse_frozen.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qm_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import numpy as np

from qm_control_tpu.experiments import _default_cfg, _loop_cfg, _standing_setup
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.ocp.reference import cmd_vel_to_target, target_from_knots
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant)
from qm_control_tpu.runtime.loop import ControlLoop, LoopConfig


def main():
    speed = -0.1
    cfg = _default_cfg()
    model, info, q0, s = _standing_setup(cfg)
    lcfg = _loop_cfg(1000.0, 0.0)
    loop = ControlLoop(model, info, cfg, lcfg)

    max_time = 8.0
    target = target_from_knots([0.0, 30.0], [s, s])
    gs = GaitSchedule(GAIT_LIBRARY["stance"])
    gs.insert_template(GAIT_LIBRARY["trot"], 0.5)
    ms = gs.mode_schedule(0.0, cfg.mpc.time_horizon + 2.0)
    carry = loop.init_carry(q0)
    carry = loop.warmup(carry, target, ms, num_solves=25)
    chunk = max(1, int(0.25 * cfg.mpc.mpc_frequency))
    ee_hold = None
    x_start = None
    t_walk = None
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
        ms = gs.mode_schedule(max(0.0, float(carry.t) - 0.5),
                              float(carry.t) + cfg.mpc.time_horizon + 1.0)
        carry, m = loop.run(carry, target, ms, num_cycles=chunk)
    print(f"stalled at t={float(carry.t):.2f}, "
          f"x={float(carry.plant.q[0]) - x_start:+.4f}", flush=True)

    # --- frozen-plan phase: 2 Hz MPC (one solve per 0.5 s) ---
    frozen = ControlLoop(model, info, cfg,
                         LoopConfig(control_freq=1000.0, mpc_freq=2.0,
                                    plant=lcfg.plant))
    # re-issue the walking target once, then hold it fixed
    rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
    x_obs = np.asarray(observation_from_rbd(model, info, rbd,
                                            carry.last_yaw))
    ee_state = np.asarray(rbd[48:55])
    target, _ = cmd_vel_to_target([speed, 0, 0, 0], ee_hold.copy(),
                                  float(carry.t), x_obs, ee_state,
                                  cfg.reference)
    print(f"{'t':>6} {'x_plant':>9} {'x_promis@.5':>11} {'ee_mm':>7} "
          f"{'alpha':>6}", flush=True)
    for k in range(4):
        x_before = float(carry.plant.q[0])
        carry, m = frozen.run(carry, target, ms, num_cycles=1)
        X = np.asarray(carry.X_warm)
        promised = X[min(int(round(0.5 / cfg.mpc.dt)), X.shape[0] - 1), 6] \
            - X[0, 6]
        achieved = float(carry.plant.q[0]) - x_before
        ee_mm = 1e3 * float(np.asarray(m.ee_pos_err)[-1])
        print(f"{float(carry.t):6.2f} {achieved:+9.4f} {promised:+11.4f} "
              f"{ee_mm:7.2f} {float(np.asarray(m.mpc_alpha)[-1]):6.3f}",
              flush=True)


if __name__ == "__main__":
    main()
