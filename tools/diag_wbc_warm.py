"""Warm-start accuracy probe: how many IP iterations does a warm cascade
need to match the cold 20-iteration deployed accuracy?

Protocol: stack A at a trot state, stack B at the state ~one 1 kHz tick
later (small q/v drift). Solve B cold at 40 iters (truth proxy), cold at
20 (deployed), and warm-from-A at k in {4,6,8,10,12}; report max |dtau|
vs truth. Run on CPU.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import qm_control_tpu  # noqa: F401
from qm_control_tpu.kernels import hoqp_fused as HF
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models import load_model
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.wbc import tasks as T
from qm_control_tpu.wbc.tasks import recover_torques


def build(model, info, x, vq, flags, tau_max):
    m_, d_ = T.compute_wbc_data(model, info, x, jnp.zeros(30),
                                jnp.zeros(30), x[6:30], vq, flags,
                                jnp.asarray(0.002, jnp.float32))
    t0 = (T.floating_base_eom_task(m_)
          + T.torque_limits_task(m_, tau_max)
          + T.no_contact_motion_task(m_)
          + T.friction_cone_task(m_, 0.5))
    t1 = (T.base_height_task(m_, d_, 100., 10.)
          + T.base_angular_task(m_, d_, 100., 10.)
          + T.ee_linear_task(m_, d_, 100., 10.)
          + T.ee_angular_task(m_, d_, 100., 10.)
          + T.swing_leg_task(m_, d_, 100., 10.).scaled(100.))
    t2 = (T.contact_force_task(m_, jnp.zeros(30))
          + T.base_linear_task(m_, d_, 100., 10.))
    return m_, (t0, t1, t2)


def main():
    model = load_model()
    info = C.make_centroidal_info(model)
    tau_max = jnp.asarray(model.joint_effort, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    xA = np.zeros(30, dtype=np.float32)
    xA[6:30] = default_q(base_pos=(0, 0, 0.4))
    vqA = np.zeros(24, dtype=np.float32)
    for name, flags in (("trot", [1., 0., 0., 1.]),
                        ("stance", [1., 1., 1., 1.])):
        flags = jnp.asarray(flags)
        # one-tick drift: ~1 mm/0.002 rad state motion, small velocities
        xB = xA.copy()
        xB[6:30] += rng.normal(0, 2e-3, 24).astype(np.float32)
        vqB = rng.normal(0, 5e-2, 24).astype(np.float32)
        mA, stA = build(model, info, jnp.asarray(xA), jnp.asarray(vqA),
                        flags, tau_max)
        mB, stB = build(model, info, jnp.asarray(xB), jnp.asarray(vqB),
                        flags, tau_max)
        _, warmA = HF.fused_hoqp_reference(*stA, qp_iters=20,
                                           return_warm=True)

        def objectives(x):
            """Per-level lexicographic objectives + worst inequality
            violation (torques wander ~1-2 Nm at degenerate trot optima
            — the referee's own conditioning floor — so optimality is
            judged on what the cascade actually minimizes)."""
            t0, t1, t2 = stB
            viol = float(jnp.max(jnp.maximum(t0.D @ x - t0.f, 0.0)))
            return [float(jnp.linalg.norm(t.A @ x - t.b))
                    for t in (t0, t1, t2)] + [viol]

        x20 = HF.fused_hoqp_reference(*stB, qp_iters=20)
        o20 = objectives(x20)
        tau20 = np.asarray(recover_torques(mB, x20))
        print(f"[{name}] cold@20 objectives: "
              + " ".join(f"{v:.5f}" for v in o20))
        for k in (4, 6, 8, 10, 12):
            xw = HF.fused_hoqp_reference(*stB, qp_iters=k, warm=warmA)
            ow = objectives(xw)
            dw = np.abs(np.asarray(recover_torques(mB, xw)) - tau20).max()
            rel = " ".join(f"{(a - b):+.5f}" for a, b in zip(ow, o20))
            print(f"[{name}] warm@{k:2d}: dobj {rel}   dtau {dw:7.3f} Nm")


if __name__ == "__main__":
    main()
