"""Traverse-stall mechanism hunt, part F: per-tick force accounting at
the stalled state (loads /tmp/stall_carry.npz from diag_save_stall.py).

Per 1 kHz tick over several MPC cycles, records:
  - plan:  x_des base x / vx (what the MPC wants executed now)
  - WBC:   desired base-x acceleration actually solved (vdot[0]) and the
           commanded net contact force x (sum F_x of the WBC solution)
  - plant: achieved base x / vx / net ground tangential force x, and the
           per-foot grip saturation |f_t|/(mu f_n)

The question: when the base should accelerate in -x, does the WBC ask
for it (vdot[0] < 0, net F_x < 0), and does the plant's ground deliver
it? Whoever breaks the chain is the leash.

Usage: JAX_PLATFORMS=cpu python tools/diag_tick_probe.py [num_cycles]
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
from qm_control_tpu.gaits.gait import contact_flags_from_mode
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.mpc.mpc import evaluate_policy, mpc_step
from qm_control_tpu.ocp.problem import make_ocp
from qm_control_tpu.ocp.reference import cmd_vel_to_target
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant,
                                              rbd_to_qv)
from qm_control_tpu.runtime.loop import CycleCarry
from qm_control_tpu.runtime.plant import (HybridCommand, PlantState,
                                          contact_forces, make_plant_step,
                                          push_command)
from qm_control_tpu.solver.sqp import SqpSettings
from qm_control_tpu.wbc.wbc import hierarchical_wbc_update


def load_carry():
    z = np.load("/tmp/stall_carry.npz")
    buf = HybridCommand(*[jnp.asarray(z[f"cmd_{k}"])
                          for k in ("pos_des", "vel_des", "kp", "kd", "ff")])
    plant = PlantState(q=jnp.asarray(z["q"]), v=jnp.asarray(z["v"]),
                       t=jnp.asarray(z["t_plant"]), cmd_buf=buf,
                       buf_head=jnp.asarray(z["buf_head"]),
                       anchors=jnp.asarray(z["anchors"]),
                       ee_wrench=jnp.asarray(z["ee_wrench"]))
    carry = CycleCarry(plant=plant, W_warm=jnp.asarray(z["W_warm"]),
                       X_warm=jnp.asarray(z["X_warm"]),
                       input_last=jnp.asarray(z["input_last"]),
                       last_yaw=jnp.asarray(z["last_yaw"]),
                       t=jnp.asarray(z["t"]), safe=jnp.asarray(z["safe"]))
    return carry, z["ee_hold"], float(z["x_start"])


def main():
    num_cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    speed = -0.1
    cfg = _default_cfg()
    model, info, q0, s = _standing_setup(cfg)
    lcfg = _loop_cfg(1000.0, 0.0)
    carry, ee_hold, x_start = load_carry()
    ms = GaitSchedule(GAIT_LIBRARY["stance"])
    ms.insert_template(GAIT_LIBRARY["trot"], 0.5)
    ms = ms.mode_schedule(max(0.0, float(carry.t) - 0.5), float(carry.t) + 3.0)  # receding window

    ocp = make_ocp(model, info, cfg)
    settings = SqpSettings(num_iterations=cfg.mpc.num_iterations)
    solve = jax.jit(lambda t, x, tg, W, X: mpc_step(
        ocp, model, info, cfg, settings, t, x, tg, ms, W, X,
        jnp.float32(1.0 / lcfg.mpc_freq), jnp.asarray(False)))
    wbc = jax.jit(lambda xd, ud, il, q, v, fl, t: hierarchical_wbc_update(
        model, info, cfg.wbc, jnp.asarray(model.joint_effort, jnp.float32),
        xd, ud, il, q, v, fl, jnp.float32(1e-3), t, fused_cascade=False))
    pstep = jax.jit(make_plant_step(model, lcfg.plant))
    tick_dt = 1.0 / lcfg.control_freq
    ticks = int(round(lcfg.control_freq / lcfg.mpc_freq))

    print(f"{'t':>7} {'x':>8} {'vx':>7} {'xdes':>8} {'vxdes':>7} "
          f"{'vdot0':>7} {'Fx_wbc':>7} {'Fx_gnd':>7} {'grip':>5} "
          f"{'mode':>4}")
    for cyc in range(num_cycles):
        rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
        x_obs = observation_from_rbd(model, info, rbd, carry.last_yaw)
        ee_state = np.asarray(rbd[48:55])
        target, _ = cmd_vel_to_target([speed, 0, 0, 0], ee_hold.copy(),
                                      float(carry.t), np.asarray(x_obs),
                                      ee_state, cfg.reference)
        policy = solve(carry.t, x_obs, target, carry.W_warm, carry.X_warm)
        plant = carry.plant
        t = carry.t
        input_last = carry.input_last
        for k in range(ticks):
            rbd_t = rbd_state_from_plant(model, plant.q, plant.v)
            x_des, u_des, mode = evaluate_policy(policy, t)
            q_meas, v_meas = rbd_to_qv(rbd_t)
            flags = contact_flags_from_mode(mode).astype(jnp.float32)
            r = wbc(x_des, u_des, input_last, q_meas, v_meas, flags, t)
            pos_des = x_des[12:30]
            vel_des = u_des[12:30]
            kp = jnp.concatenate([jnp.zeros(12),
                                  jnp.float32(cfg.wbc.kp_arm_wbc)
                                  * jnp.ones(6)])
            kd = jnp.concatenate([3.0 * jnp.ones(12),
                                  jnp.float32(cfg.wbc.kd_arm_wbc)
                                  * jnp.ones(6)])
            cmd = HybridCommand(pos_des=pos_des,
                                vel_des=jnp.concatenate(
                                    [vel_des[:12], jnp.zeros(6)]),
                                kp=kp.astype(jnp.float32),
                                kd=kd.astype(jnp.float32),
                                ff=r.torques)
            plant = push_command(plant, cmd)
            plant, fc_step = pstep(plant)
            if k % 2 == 0:
                fc, _, _, _ = contact_forces(model, lcfg.plant, plant.q,
                                             plant.v, plant.anchors)
                fc = np.asarray(fc)
                grip = float(np.max(
                    np.linalg.norm(fc[:, :2], axis=1)
                    / np.maximum(lcfg.plant.friction_mu * fc[:, 2], 1e-6)))
                print(f"{float(t):7.3f} {float(plant.q[0]) - x_start:8.4f} "
                      f"{float(plant.v[0]):7.3f} "
                      f"{float(x_des[6]) - x_start:8.4f} "
                      f"{float(u_des[12] * 0 + x_des[0]):7.3f} "
                      f"{float(r.vdot[0]):7.3f} "
                      f"{float(np.asarray(r.forces).reshape(4, 3)[:, 0].sum()):7.2f} "
                      f"{fc[:, 0].sum():7.2f} {grip:5.2f} "
                      f"{int(mode):4d}", flush=True)
            input_last = u_des
            t = t + tick_dt
        carry = carry._replace(plant=plant, W_warm=policy.W,
                               X_warm=policy.X, input_last=input_last,
                               t=t)


if __name__ == "__main__":
    main()
