"""Diagnostic: WBC cascade f32 noise vs the f64 referee across numeric
configurations (VERDICT round-2 weak #4 / next-round #5).

Compares, on realistic stance/trot/transient stacks:
  A. damped projector (current default)
  B. exact QR kernel basis (USE_QR_BASIS=True)
  C. exact QR basis + carried-slack clamp h_q = max(h_q, 0)

against tests/helpers_f64.hoqp64, at the torque level.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax.numpy as jnp
import numpy as np

from helpers_f64 import hoqp64
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models import load_model
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.wbc import hoqp
from qm_control_tpu.wbc import tasks as T
from qm_control_tpu.wbc.tasks import recover_torques


def build(model, info, tau_max, flags, vq, vbase=None):
    x = np.zeros(30, dtype=np.float32)
    x[6:30] = default_q(base_pos=(0, 0, 0.4))
    x = jnp.asarray(x)
    v = jnp.asarray(vq, jnp.float32)
    m_, d_ = T.compute_wbc_data(model, info, x, jnp.zeros(30),
                                jnp.zeros(30), x[6:30], v, flags,
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
    rng = np.random.default_rng(7)

    cases = [
        ("stance", jnp.ones(4), np.zeros(24)),
        ("trot", jnp.asarray([1., 0., 0., 1.]), 0.05 * np.ones(24)),
        ("trot2", jnp.asarray([0., 1., 1., 0.]),
         0.1 * rng.standard_normal(24)),
        ("trans", jnp.asarray([1., 1., 0., 1.]),
         0.2 * rng.standard_normal(24)),
    ]

    for name, flags, vq in cases:
        m_, (t0, t1, t2) = build(model, info, tau_max, flags, vq)
        tasks64 = [(np.asarray(t.A, np.float64), np.asarray(t.b, np.float64),
                    np.asarray(t.D, np.float64), np.asarray(t.f, np.float64))
                   for t in (t0, t1, t2)]
        x64 = hoqp64(tasks64)
        tau64 = np.asarray(recover_torques(m_, jnp.asarray(x64, jnp.float32)))
        line = f"[{name}]"
        for label, qr, iters in (("proj", False, 15),
                                 ("proj30", False, 30),
                                 ("qr", True, 15)):
            hoqp.USE_QR_BASIS = qr
            try:
                x32 = np.asarray(hoqp.hoqp_solve([t0, t1, t2],
                                                 qp_iters=iters))
                tau32 = np.asarray(recover_torques(m_, jnp.asarray(x32)))
                err = float(np.max(np.abs(tau64 - tau32)))
                line += f"  {label}: {err:7.3f} Nm"
            except Exception as e:  # noqa: BLE001
                line += f"  {label}: FAIL {type(e).__name__}"
        hoqp.USE_QR_BASIS = False
        try:
            from qm_control_tpu.kernels.hoqp_fused import \
                fused_hoqp_reference
            xf = np.asarray(fused_hoqp_reference(t0, t1, t2))
            tauf = np.asarray(recover_torques(m_, jnp.asarray(xf)))
            line += f"  fused: {float(np.max(np.abs(tau64 - tauf))):7.3f} Nm"
        except Exception as e:  # noqa: BLE001
            line += f"  fused: FAIL {type(e).__name__}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
