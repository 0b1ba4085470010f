"""Run the fused Pallas WBC cascade through Mosaic on REAL TPU silicon,
validate against the XLA cascade, and time both paths (B=1 differential
chaining + batched).

VERDICT round-2 item #2: the kernel had only ever run in interpreter
mode; this script is the silicon proof. Emits a JSON summary to stdout
(last line) and human-readable progress to stderr.

Usage:  python tools/tpu_kernel_bench.py          # on the TPU host
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _ensure_live_backend
_ensure_live_backend()

import jax
import jax.numpy as jnp
import numpy as np

import qm_control_tpu  # noqa: F401
from qm_control_tpu.config import QmConfig, WbcGains
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models import load_model
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.wbc import tasks as T
from qm_control_tpu.wbc.hoqp import hoqp_solve
from qm_control_tpu.wbc.tasks import recover_torques

K1, K2, REPS = 5, 55, 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def chain_latency_ms(make_chain, *args):
    t1 = _time(make_chain(K1), *args)
    t2 = _time(make_chain(K2), *args)
    return max(t2 - t1, 0.0) / (K2 - K1) * 1e3


def build_stacks():
    model = load_model()
    info = C.make_centroidal_info(model)
    x = np.zeros(30, dtype=np.float32)
    x[6:30] = default_q(base_pos=(0, 0, 0.4))
    x = jnp.asarray(x)
    tau_max = jnp.asarray(model.joint_effort, dtype=jnp.float32)

    def build(flags, vq):
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

    stance = build(jnp.ones(4), jnp.zeros(24, dtype=jnp.float32))
    trot = build(jnp.asarray([1., 0., 0., 1.]),
                 jnp.zeros(24, dtype=jnp.float32))
    return model, stance, trot


def main():
    from qm_control_tpu.kernels import hoqp_fused as HF
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} (platform {dev.platform}, "
        f"backend {jax.default_backend()})")
    on_tpu = jax.default_backend() in ("tpu", "axon")
    result = {"device": dev.device_kind, "mosaic": False}

    model, (m_st, st), (m_tr, tr) = build_stacks()

    # --- 1. Mosaic lowering + execution of the real pallas_call ---
    fused = jax.jit(lambda a, b, c: HF.fused_hoqp(a, b, c))
    x_fused = np.asarray(fused(*st))
    log(f"fused_hoqp executed; backend={jax.default_backend()}, "
        f"pallas (Mosaic) path taken: {on_tpu}")
    result["mosaic"] = bool(on_tpu)

    # --- 2. numerical cross-check vs the XLA cascade, torque level ---
    xla = jax.jit(lambda a, b, c: hoqp_solve([a, b, c]))
    for name, (m_, stacks) in (("stance", (m_st, st)), ("trot", (m_tr, tr))):
        xf = np.asarray(fused(*stacks))
        xx = np.asarray(xla(*stacks))
        tf = np.asarray(recover_torques(m_, jnp.asarray(xf)))
        tx = np.asarray(recover_torques(m_, jnp.asarray(xx)))
        dtau = float(np.max(np.abs(tf - tx)))
        log(f"[{name}] max |dtau| fused-vs-XLA: {dtau:.4f} Nm")
        result[f"dtau_{name}_nm"] = round(dtau, 4)

    # --- 3. B=1 latency, differential chaining (both paths) ---
    def make_chain(solver):
        def mk(K):
            @jax.jit
            def chain(t0, t1, t2):
                def body(c, _):
                    x = solver(Task_nudge(t0, c), t1, t2)
                    return jnp.sum(x) * 1e-12, jnp.max(jnp.abs(x))
                _, xs = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                                     None, length=K)
                return xs
            return chain
        return mk

    from qm_control_tpu.wbc.tasks import Task

    def Task_nudge(t, c):
        return Task(t.A + c, t.b, t.D, t.f)

    lat_fused = chain_latency_ms(make_chain(
        lambda a, b, c: HF.fused_hoqp(a, b, c)), *st)
    lat_xla = chain_latency_ms(make_chain(
        lambda a, b, c: hoqp_solve([a, b, c])), *st)
    log(f"B=1 cascade latency: fused {lat_fused:.3f} ms, "
        f"XLA {lat_xla:.3f} ms")
    result["b1_fused_ms"] = round(lat_fused, 3)
    result["b1_xla_ms"] = round(lat_xla, 3)

    # --- 4. batched throughput (vmap over nudged copies) ---
    B = 256
    def batch_ops(t):
        return Task(jnp.tile(t.A[None], (B, 1, 1)),
                    jnp.tile(t.b[None], (B, 1)),
                    jnp.tile(t.D[None], (B, 1, 1)),
                    jnp.tile(t.f[None], (B, 1)))
    bst = tuple(batch_ops(t) for t in st)
    from qm_control_tpu.kernels.cascade_exact import cascade_exact
    for name, solver in (("fused", lambda a, b, c: HF.fused_hoqp(a, b, c)),
                         ("xla", lambda a, b, c: hoqp_solve([a, b, c])),
                         ("xla_math",
                          lambda a, b, c: HF.fused_hoqp_reference(a, b, c)),
                         ("exact",
                          lambda a, b, c: cascade_exact(a, b, c))):
        f = jax.jit(jax.vmap(solver))
        dt = _time(f, *bst)
        log(f"batched B={B} {name}: {dt*1e3:.2f} ms -> "
            f"{B/dt:.0f} solves/s")
        result[f"batched_{name}_solves_per_s"] = round(B / dt, 1)

    print(json.dumps(result))
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'KERNEL_BENCH.json')
    with open(path, 'w') as f:
        json.dump(result, f, indent=1)



if __name__ == "__main__":
    main()
