"""Run the traverse to the stall and snapshot the full loop carry to
/tmp/stall_carry.npz so per-tick probes can iterate without re-running
the 8 s closed loop each time.

Usage: JAX_PLATFORMS=cpu python tools/diag_save_stall.py [t_stop]
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
from qm_control_tpu.runtime.loop import ControlLoop


def run_to_stall(t_stop=8.0, speed=-0.1):
    cfg = _default_cfg()
    model, info, q0, s = _standing_setup(cfg)
    loop = ControlLoop(model, info, cfg, _loop_cfg(1000.0, 0.0))
    target = target_from_knots([0.0, 30.0], [s, s])
    gs = GaitSchedule(GAIT_LIBRARY["stance"])
    gs.insert_template(GAIT_LIBRARY["trot"], 0.5)
    horizon = cfg.mpc.time_horizon
    ms = gs.mode_schedule(0.0, horizon + 2.0)
    carry = loop.init_carry(q0)
    carry = loop.warmup(carry, target, ms, num_solves=25)
    chunk = max(1, int(0.25 * cfg.mpc.mpc_frequency))
    ee_hold = None
    x_start = 0.0
    t_walk = None
    while float(carry.t) < t_stop:
        rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
        x_obs = np.asarray(observation_from_rbd(model, info, rbd,
                                                carry.last_yaw))
        ee_state = np.asarray(rbd[48:55])
        if ee_hold is None and float(carry.t) >= 0.5:
            ee_hold = ee_state.copy()
            x_start = float(carry.plant.q[0])
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
                              float(carry.t) + horizon + 1.0)
        carry, m = loop.run(carry, target, ms, num_cycles=chunk)
    return carry, ee_hold, x_start, model, info, cfg, ms


def main():
    t_stop = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    carry, ee_hold, x_start, model, info, cfg, ms = run_to_stall(t_stop)
    np.savez("/tmp/stall_carry.npz",
             q=np.asarray(carry.plant.q), v=np.asarray(carry.plant.v),
             t_plant=np.asarray(carry.plant.t),
             anchors=np.asarray(carry.plant.anchors),
             ee_wrench=np.asarray(carry.plant.ee_wrench),
             buf_head=np.asarray(carry.plant.buf_head),
             **{f"cmd_{k}": np.asarray(getattr(carry.plant.cmd_buf, k))
                for k in ("pos_des", "vel_des", "kp", "kd", "ff")},
             W_warm=np.asarray(carry.W_warm),
             X_warm=np.asarray(carry.X_warm),
             input_last=np.asarray(carry.input_last),
             last_yaw=np.asarray(carry.last_yaw),
             t=np.asarray(carry.t), safe=np.asarray(carry.safe),
             ee_hold=ee_hold, x_start=x_start)
    print(f"saved stall at t={float(carry.t):.2f}, "
          f"x={float(carry.plant.q[0]) - x_start:+.4f}")


if __name__ == "__main__":
    main()
