"""Traverse-stall mechanism hunt, part D: solver acceptance + actuation
saturation along the traverse.

Part C showed execution efficiency (achieved / planned displacement per
0.25 s) decaying 1.0 -> ~0.3 -> negative (retreat) as displacement grows,
with plan velocity == plant velocity at each re-solve and foot grip
spiking toward ~0.9 near the stall. Remaining suspects:

  1. SQP step acceptance: alpha collapsing (plan frozen, receding horizon
     re-promises but never integrates) — now observable via
     CycleMetrics.mpc_alpha / mpc_defect;
  2. leg torque saturation: the cantilevered arm loads the front legs;
     if |tau| pins at the URDF effort limit the WBC under-delivers the
     planned base acceleration — observable via CycleMetrics.torques;
  3. foot slip during specific gait phases (grip ~0.9 spikes).

Usage: JAX_PLATFORMS=cpu python tools/diag_traverse_wbc.py [speed]
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


def main():
    speed = float(sys.argv[1]) if len(sys.argv) > 1 else -0.1
    cfg = _default_cfg()
    model, info, q0, s = _standing_setup(cfg)
    loop = ControlLoop(model, info, cfg, _loop_cfg(1000.0, 0.0))
    tau_max = np.asarray(model.joint_effort)   # (18,)

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
    x_prev = float(carry.plant.q[0])
    print(f"{'t':>5} {'x_plant':>8} {'ach':>7} {'alpha':>6} {'a_min':>6} "
          f"{'defect':>8} {'tau_leg':>7} {'tau_arm':>7} {'worst_j':>7}")
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
        alphas = np.asarray(m.mpc_alpha)
        defects = np.asarray(m.mpc_defect)
        taus = np.asarray(m.torques)            # (chunk, 18)
        frac = np.abs(taus) / tau_max[None, :]
        leg_sat = float(frac[:, :12].max())
        arm_sat = float(frac[:, 12:].max())
        worst_j = int(np.unravel_index(np.argmax(frac), frac.shape)[1])
        achieved = float(carry.plant.q[0]) - x_prev
        print(f"{float(carry.t):5.2f} {x_now - (x_start or 0):8.4f} "
              f"{achieved:7.4f} {alphas.mean():6.3f} {alphas.min():6.3f} "
              f"{defects.max():8.2e} {leg_sat:7.2f} {arm_sat:7.2f} "
              f"{worst_j:7d}", flush=True)
        x_prev = float(carry.plant.q[0])


if __name__ == "__main__":
    main()
