"""Diagnostic v2: decompose the trot-in-place EE limit cycle.

Per MPC cycle (100 Hz) logs:
  - measured EE pos, desired (policy-evaluated) EE pos FK(x_des), target
  - base pose (xy + rpy) and x_des base pose  -> base execution error
  - plant foot heights + scheduled contact flags -> touchdown timing
Writes /tmp/diag_trot_exec.npz and prints a summary.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import dataclasses

import jax.numpy as jnp
import numpy as np

from qm_control_tpu.config import MpcConfig, QmConfig
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.gaits.gait import mode_at_time, contact_flags_from_mode
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models import kinematics as K
from qm_control_tpu.models import load_model
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.ocp.reference import target_from_knots
from qm_control_tpu.runtime.estimator import rbd_state_from_plant
from qm_control_tpu.runtime.loop import ControlLoop, LoopConfig


def fk_ee(model, x30):
    q = C.state_to_q(jnp.asarray(x30, jnp.float32))
    cache = K.fk(model, q)
    p, _ = K.frame_pose(model, cache, "j2n6s300_end_effector")
    return np.asarray(p)


def main():
    cfg = QmConfig().with_(mpc=MpcConfig(time_horizon=1.0, dt=0.015,
                                         num_iterations=1))
    cfg = cfg.with_(wbc=dataclasses.replace(cfg.wbc, arm_settling_time=0.0))
    model = load_model()
    info = C.make_centroidal_info(model)
    q0 = jnp.asarray(default_q(base_pos=(0, 0, 0.38)), dtype=jnp.float32)
    s = np.zeros(37)
    s[6:30] = np.asarray(q0)
    s[8] = 0.4
    s[30:33] = [0.52, 0.09, 0.78]
    s[33:37] = [0.5, -0.5, 0.5, -0.5]

    loop = ControlLoop(model, info, cfg, LoopConfig())
    target = target_from_knots([0.0, 20.0], [s, s])
    gs = GaitSchedule(GAIT_LIBRARY["stance"])
    gs.insert_template(GAIT_LIBRARY["trot"], 0.5)
    ms = gs.mode_schedule(0.0, 20.0)
    carry = loop.init_carry(q0)
    carry = loop.warmup(carry, target, ms, num_solves=25)
    carry, _ = loop.run(carry, target, ms, num_cycles=50)
    rbd0 = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
    s = s.copy()
    s[30:37] = np.asarray(rbd0[48:55])
    target = target_from_knots([float(carry.t), 20.0], [s, s])

    recs = {k: [] for k in ("t", "ee", "ee_des", "ee_ref", "base",
                            "base_des", "feet_z", "flags_sched",
                            "forces")}
    for i in range(200):
        carry, m = loop.run(carry, target, ms, num_cycles=1)
        x_des = np.asarray(m.x_des)[0]
        recs["t"].append(float(carry.t))
        recs["ee"].append(np.asarray(m.ee_pos)[0])
        recs["ee_des"].append(fk_ee(model, x_des))
        recs["ee_ref"].append(np.asarray(m.ee_ref)[0])
        recs["base"].append(np.asarray(carry.plant.q[:6]))
        recs["base_des"].append(np.asarray(x_des[6:12]))
        recs["feet_z"].append(np.asarray(m.feet_pos)[0][:, 2])
        mode = mode_at_time(ms, carry.t)
        recs["flags_sched"].append(
            np.asarray(contact_flags_from_mode(mode), dtype=np.float32))
        recs["forces"].append(np.asarray(m.forces)[0])
    arr = {k: np.array(v) for k, v in recs.items()}
    np.savez("/tmp/diag_trot_exec.npz", **arr)

    ee, eed, eer = arr["ee"], arr["ee_des"], arr["ee_ref"]
    base, based = arr["base"], arr["base_des"]
    sl = slice(50, None)
    def stats(name, err):
        err = err[sl]
        print(f"{name}: max {1e3*np.abs(err).max(0)} mm  "
              f"rms {1e3*np.sqrt((err**2).mean(0))} mm")
    print("\nper-axis EE errors (x, y, z):")
    stats("total  (ee - ref)", ee - eer)
    stats("des    (ee_des - ref)", eed - eer)
    stats("exec   (ee - ee_des)", ee - eed)
    print("\nbase execution error (xy):")
    stats("base exec (q - x_des)", base[:, :2] - based[:, :2])
    print("\nbase rpy exec error (zyx order as state):")
    stats("base ang exec", base[:, 3:6] - based[:, 3:6])
    # contact timing: feet below 5 mm => physically in contact
    phys = (arr["feet_z"] < 0.005).astype(float)
    mismatch = np.abs(phys - arr["flags_sched"]).mean(0)
    print(f"\ncontact schedule/physical mismatch rate per foot: {mismatch}")


if __name__ == "__main__":
    main()
