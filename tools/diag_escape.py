"""Resume the closed loop FROM the stalled carry with the basin-escape
probe active: does the robot start walking?

Usage: JAX_PLATFORMS=cpu python tools/diag_escape.py [seconds] [speed]
"""
import os, sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qm_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from qm_control_tpu.experiments import _default_cfg, _loop_cfg, _standing_setup
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.ocp.reference import cmd_vel_to_target
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant)
from qm_control_tpu.runtime.loop import ControlLoop
from diag_tick_probe import load_carry

seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
speed = float(sys.argv[2]) if len(sys.argv) > 2 else -0.1
cfg = _default_cfg()
model, info, q0, s = _standing_setup(cfg)
loop = ControlLoop(model, info, cfg, _loop_cfg(1000.0, 0.0))
carry, ee_hold, x_start = load_carry()
gs = GaitSchedule(GAIT_LIBRARY["stance"])
gs.insert_template(GAIT_LIBRARY["trot"], 0.5)
horizon = cfg.mpc.time_horizon
chunk = max(1, int(0.25 * cfg.mpc.mpc_frequency))
t_end = float(carry.t) + seconds
n_escapes = 0
while float(carry.t) < t_end:
    rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
    x_obs = np.asarray(observation_from_rbd(model, info, rbd,
                                            carry.last_yaw))
    ee_state = np.asarray(rbd[48:55])
    target, _ = cmd_vel_to_target([speed, 0, 0, 0], ee_hold.copy(),
                                  float(carry.t), x_obs, ee_state,
                                  cfg.reference)
    ms = gs.mode_schedule(max(0.0, float(carry.t) - 0.5),
                          float(carry.t) + horizon + 1.0)
    carry, esc = loop.escape(carry, target, ms)
    n_escapes += int(esc)
    carry, m = loop.run(carry, target, ms, num_cycles=chunk)
    ee_err = float(np.max(np.asarray(m.ee_pos_err))) * 1e3
    print(f"t={float(carry.t):5.2f} x={float(carry.plant.q[0]) - x_start:+.4f}"
          f" esc={'Y' if esc else '.'} ee_err={ee_err:5.2f}mm"
          f" safe={bool(np.asarray(m.safe)[-1])}", flush=True)
    if not bool(np.asarray(m.safe)[-1]):
        break
print(f"escapes: {n_escapes}; final displacement "
      f"{float(carry.plant.q[0]) - x_start:+.4f} m")
