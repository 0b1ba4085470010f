"""Traverse-stall mechanism hunt, part A: the kinematic reach curve.

Question (VERDICT round-3 item #1, hypothesis c): when the base stands at
displacement d behind the held EE pose, what is the MINIMUM achievable EE
pose error, minimizing over the 6 arm joints (base pose fixed at the
walking nominal: z = com_height tradeoff height, zero roll/pitch)?

If e_min(d) stays ~0 out to d >= 0.3 m the stall at 0.10-0.15 m is NOT a
kinematic wall and must be a cost-gradient equilibrium elsewhere (arm
barriers / Q tradeoff / target semantics). Also reports which arm joints
approach their URDF limits along the curve, and the arm-limit barrier +
EE-penalty cost along the minimizer — the two candidate resisting terms.

Run: JAX_PLATFORMS=cpu python tools/diag_traverse_reach.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax
import jax.numpy as jnp
import numpy as np

from qm_control_tpu.config import QmConfig
from qm_control_tpu.models import load_model
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.models.rotations import R_to_quat, quat_distance
from qm_control_tpu.ocp.costs import ee_pose, arm_limit_cost


def main():
    model = load_model()
    cfg = QmConfig()
    # the hold pose the experiments capture: EE settled above the stance
    p_hold = jnp.asarray([0.52, 0.09, 0.78])
    q_hold = jnp.asarray([-0.5, 0.5, -0.5, 0.5])  # wxyz nominal tool quat

    q0 = jnp.asarray(default_q(base_pos=(0, 0, 0.38)), dtype=jnp.float64)
    arm0 = q0[18:24]
    lo = jnp.asarray(model.joint_lower[12:], dtype=jnp.float64)
    hi = jnp.asarray(model.joint_upper[12:], dtype=jnp.float64)
    print("arm limits lo:", np.asarray(lo))
    print("arm limits hi:", np.asarray(hi))
    print("arm default  :", np.asarray(arm0))

    def err(d, arm):
        q = q0.at[0].add(-d).at[18:24].set(arm)
        p, R = ee_pose(model, q)
        e_pos = p - p_hold
        e_ori = quat_distance(R_to_quat(R), q_hold)
        return e_pos, e_ori

    def objective(arm, d):
        e_pos, e_ori = err(d, arm)
        return (jnp.sum(e_pos ** 2) + jnp.sum(e_ori ** 2))

    g = jax.grad(objective)

    @jax.jit
    def minimize(arm, d, iters=4000, lr=0.05):
        # projected gradient descent, scanned (jit-compiled once)
        def step(a, _):
            a = jnp.clip(a - lr * g(a, d), lo + 1e-6, hi - 1e-6)
            return a, None
        arm, _ = jax.lax.scan(step, jnp.asarray(arm), None, length=iters)
        return arm

    print(f"{'d[m]':>6} {'e_pos[mm]':>10} {'e_ori[deg]':>10} "
          f"{'barrier':>10} {'ee_cost':>10}  joint margins [rad]")
    arm = arm0
    rows = []
    for d in np.linspace(0.0, 0.45, 19):
        arm = minimize(arm, float(d))
        e_pos, e_ori = err(float(d), arm)
        ep = float(jnp.linalg.norm(e_pos)) * 1e3
        eo = float(np.degrees(jnp.linalg.norm(e_ori)))
        # candidate resisting costs at the minimizer
        x = jnp.zeros(30, dtype=jnp.float64)
        x = x.at[6:30].set(q0.at[0].add(-float(d)).at[18:24].set(arm)[:24])
        # state layout: x[6:12]=base pose, x[12:24]=leg, x[24:30]=arm
        x = x.at[6:12].set(q0[:6].at[0].add(-float(d)))
        x = x.at[12:24].set(q0[6:18])
        x = x.at[24:30].set(arm)
        bar = float(arm_limit_cost(model, x, jnp.zeros(30, dtype=jnp.float64),
                                   cfg.joint_limits))
        mu = cfg.cost.ee_mu_position
        muo = cfg.cost.ee_mu_orientation
        eec = float(0.5 * mu * jnp.sum(e_pos ** 2)
                    + 0.5 * muo * jnp.sum(e_ori ** 2))
        margin = np.minimum(np.asarray(arm - lo), np.asarray(hi - arm))
        margin = np.where(np.abs(np.asarray(lo)) > 1e6, np.inf, margin)
        print(f"{d:6.3f} {ep:10.2f} {eo:10.2f} {bar:10.3f} {eec:10.3f}  "
              + " ".join(f"{m:6.3f}" for m in margin))
        rows.append((float(d), ep, eo, bar, eec))
    return rows


if __name__ == "__main__":
    main()
