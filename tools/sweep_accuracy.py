"""Closed-loop accuracy A/B sweep (VERDICT round-3 item #1).

Round-2/3 diagnostics established: WBC/plant execution error is sub-mm;
the EE limit cycle (~5 mm trot-in-place) lives in the MPC plan itself.
This sweep runs the same trot-in-place hold under candidate config
variants to find what moves the planned limit cycle, with the reference
values (task.info / gait.info) as the baseline.

Run one variant:   python tools/sweep_accuracy.py <variant>
Run all (forked):  python tools/sweep_accuracy.py
"""
import json
import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

VARIANTS = [
    "baseline",          # reference task.info values, trot, WBC 500 Hz
    "wbc_1khz",          # control loop at 1 kHz (reference update() rate)
    "standing_trot",     # gait with stance interludes
    "ee_mu_x2",          # doubled EE pose penalty
    "sqp_iters3",        # more SQP convergence per cycle
    "r_arm_x0.1",        # cheaper arm velocity (R_arm 1.0 -> 0.1)
    # round-3 second wave: combined closed-loop levers
    "khz_mu2",           # 1 kHz + doubled EE penalty
    "khz_simdt05",       # 1 kHz + 0.5 ms physics substeps
    "khz_mu2_simdt05",   # both
    "khz_soft",          # 1 kHz + softer ground (gentler touchdowns)
    "khz_mu4",           # 1 kHz + 4x EE penalty
]


def run_variant(name: str) -> dict:
    import jax.numpy as jnp
    import numpy as np

    from qm_control_tpu.config import CostConfig, MpcConfig, QmConfig
    from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
    from qm_control_tpu.models import centroidal as C
    from qm_control_tpu.models import kinematics as K
    from qm_control_tpu.models import load_model
    from qm_control_tpu.models.spec import default_q
    from qm_control_tpu.ocp.reference import target_from_knots
    from qm_control_tpu.runtime.estimator import rbd_state_from_plant
    from qm_control_tpu.runtime.loop import ControlLoop, LoopConfig

    cfg = QmConfig().with_(mpc=MpcConfig(time_horizon=1.0, dt=0.015,
                                         num_iterations=1))
    cfg = cfg.with_(wbc=dataclasses.replace(cfg.wbc, arm_settling_time=0.0))
    loop_cfg = LoopConfig()
    gait = "trot"

    if name == "wbc_1khz":
        loop_cfg = LoopConfig(control_freq=1000.0)
    elif name == "standing_trot":
        gait = "standing_trot"
    elif name == "ee_mu_x2":
        cfg = cfg.with_(cost=dataclasses.replace(
            cfg.cost, ee_mu_position=4000.0, ee_mu_orientation=2000.0,
            final_ee_mu_position=4000.0, final_ee_mu_orientation=2000.0))
    elif name == "sqp_iters3":
        cfg = cfg.with_(mpc=dataclasses.replace(cfg.mpc, num_iterations=3))
    elif name == "r_arm_x0.1":
        r = list(cfg.cost.r_diag)
        r[24:30] = [100.0] * 6
        cfg = cfg.with_(cost=dataclasses.replace(cfg.cost, r_diag=tuple(r)))
    elif name.startswith("khz"):
        from qm_control_tpu.runtime.plant import PlantConfig
        plant = PlantConfig()
        if "simdt05" in name:
            plant = plant._replace(sim_dt=0.0005)
        if "soft" in name:
            plant = plant._replace(contact_kp=15000.0, contact_kd=1200.0)
        loop_cfg = LoopConfig(control_freq=1000.0, plant=plant)
        mu = 2.0 if "mu2" in name else (4.0 if "mu4" in name else 1.0)
        if mu != 1.0:
            cfg = cfg.with_(cost=dataclasses.replace(
                cfg.cost, ee_mu_position=2000.0 * mu,
                ee_mu_orientation=1000.0 * mu,
                final_ee_mu_position=2000.0 * mu,
                final_ee_mu_orientation=1000.0 * mu))

    model = load_model()
    info = C.make_centroidal_info(model)
    q0 = jnp.asarray(default_q(base_pos=(0, 0, 0.38)), dtype=jnp.float32)
    s = np.zeros(37)
    s[6:30] = np.asarray(q0)
    s[8] = 0.4
    s[30:33] = [0.52, 0.09, 0.78]
    s[33:37] = [0.5, -0.5, 0.5, -0.5]

    loop = ControlLoop(model, info, cfg, loop_cfg)
    target = target_from_knots([0.0, 20.0], [s, s])
    gs = GaitSchedule(GAIT_LIBRARY["stance"])
    gs.insert_template(GAIT_LIBRARY[gait], 0.5)
    ms = gs.mode_schedule(0.0, 20.0)
    carry = loop.init_carry(q0)
    carry = loop.warmup(carry, target, ms, num_solves=25)
    carry, _ = loop.run(carry, target, ms, num_cycles=50)
    # hold target re-anchored at the settled observed EE pose
    rbd0 = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
    s = s.copy()
    s[30:37] = np.asarray(rbd0[48:55])
    target = target_from_knots([float(carry.t), 20.0], [s, s])

    pos_errs, ori_errs = [], []
    for i in range(250):
        carry, m = loop.run(carry, target, ms, num_cycles=1)
        pos_errs.append(float(np.asarray(m.ee_pos_err)[0]))
        ori_errs.append(float(np.asarray(m.ee_ori_err)[0]))
    pe = np.array(pos_errs[100:])   # skip 1 s of limit-cycle settling
    oe = np.array(ori_errs[100:])
    return {
        "variant": name,
        "ee_pos_err_max_mm": 1e3 * float(pe.max()),
        "ee_pos_err_rms_mm": 1e3 * float(np.sqrt((pe ** 2).mean())),
        "ee_ori_err_max_deg": float(np.degrees(oe.max())),
        "safe": bool(np.asarray(carry.safe)),
    }


def main():
    if len(sys.argv) > 1:
        print(json.dumps(run_variant(sys.argv[1])), flush=True)
        return
    procs = {}
    for v in VARIANTS:
        procs[v] = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), v],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    for v, p in procs.items():
        out, _ = p.communicate()
        line = out.strip().splitlines()[-1] if out.strip() else "{}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
