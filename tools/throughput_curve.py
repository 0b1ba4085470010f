"""Batched-MPC throughput curve + roofline estimate (VERDICT r2 #7).

Sweeps the scenario batch size on the attached TPU, reports solves/s per
chip at each point, locates the peak, and derives a roofline-style
bottleneck statement from XLA's compiled cost analysis (flops + bytes
accessed per solve vs the chip's peak compute and HBM bandwidth).

Writes THROUGHPUT.json at the repo root and prints it.

Usage: python tools/throughput_curve.py            # on the TPU host
       BATCHES="256,1024" python tools/throughput_curve.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _ensure_live_backend
_ensure_live_backend()

import jax
import jax.numpy as jnp
import numpy as np

import qm_control_tpu  # noqa: F401
from qm_control_tpu.config import QmConfig
from qm_control_tpu.parallel.batch import BatchScenario, make_batched_mpc_step
from __graft_entry__ import _setup

# TPU v5e (v5 lite) public peak numbers; used only for the roofline
# RATIO statement, not for any pass/fail gate.
PEAK = {
    "TPU v5 lite": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "TPU v5e": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_step(step, batch, iters):
    batch2, policy = step(batch)
    jax.block_until_ready(policy.cost)
    batch2, policy = step(batch2)
    jax.block_until_ready(policy.cost)
    t0 = time.perf_counter()
    b = batch2
    for _ in range(iters):
        b, policy = step(b)
    jax.block_until_ready(policy.cost)
    return (time.perf_counter() - t0) / iters


def main():
    cfg, model, info, x0, target, ms = _setup(QmConfig())
    N = cfg.mpc.num_nodes
    dev = jax.devices()[0]
    batches = [int(b) for b in os.environ.get(
        "BATCHES", "128,256,512,1024,2048").split(",")]
    iters = int(os.environ.get("ITERS", "5"))

    points = []
    cost_info = None
    for B in batches:
        tile = lambda a: jnp.tile(jnp.asarray(a)[None],
                                  (B,) + (1,) * jnp.ndim(a))
        batch = BatchScenario(
            t=jnp.zeros(B, dtype=jnp.float32),
            x=tile(x0),
            target=jax.tree_util.tree_map(tile, target),
            ms=jax.tree_util.tree_map(tile, ms),
            W_warm=jnp.zeros((B, N, 30), dtype=jnp.float32),
            X_warm=tile(jnp.tile(x0[None], (N + 1, 1))),
        )
        fn = jax.jit(make_batched_mpc_step(model, info, cfg))
        try:
            lowered = fn.lower(batch)
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            if ca and B == batches[0]:
                cost_info = {
                    "flops_per_step": float(ca.get("flops", 0.0)),
                    "bytes_per_step": float(
                        ca.get("bytes accessed", 0.0)),
                }
            step = compiled
        except Exception as e:  # noqa: BLE001 - cost analysis is best-effort
            log(f"cost_analysis unavailable ({type(e).__name__}: {e})")
            step = fn
        try:
            dt = time_step(step, batch, iters)
        except Exception as e:  # noqa: BLE001 - HBM OOM ends the sweep
            log(f"B={B}: {type(e).__name__} (likely HBM OOM) — sweep ends")
            points.append({"batch": B, "error": type(e).__name__})
            break
        sps = B / dt
        log(f"B={B:5d}: {dt * 1e3:8.2f} ms/step -> {sps:8.0f} solves/s")
        points.append({"batch": B, "step_ms": round(dt * 1e3, 2),
                       "solves_per_s": round(sps, 1)})

    best = max((p for p in points if "solves_per_s" in p),
               key=lambda p: p["solves_per_s"])
    out = {
        "device": dev.device_kind,
        "horizon_nodes": N,
        "points": points,
        "peak": best,
        "vs_reference_100hz": round(best["solves_per_s"] / 100.0, 1),
    }

    if cost_info and cost_info["flops_per_step"] > 0:
        B0 = batches[0]
        flops_per_solve = cost_info["flops_per_step"] / B0
        bytes_per_solve = cost_info["bytes_per_step"] / B0
        ai = (flops_per_solve / bytes_per_solve
              if bytes_per_solve else float("nan"))
        pk = PEAK.get(dev.device_kind)
        out["roofline"] = {
            "flops_per_solve": flops_per_solve,
            "bytes_per_solve": bytes_per_solve,
            "arithmetic_intensity_flops_per_byte": round(ai, 3),
        }
        if pk:
            # achieved fractions at the peak point
            p0 = next(p for p in points if p["batch"] == B0)
            ach_flops = flops_per_solve * p0["solves_per_s"]
            ach_bytes = bytes_per_solve * p0["solves_per_s"]
            ridge = pk["bf16_tflops"] * 1e12 / (pk["hbm_gbps"] * 1e9)
            out["roofline"].update({
                "achieved_tflops": round(ach_flops / 1e12, 4),
                "achieved_hbm_gbps": round(ach_bytes / 1e9, 2),
                "mfu_vs_bf16_peak": round(
                    ach_flops / (pk["bf16_tflops"] * 1e12), 5),
                "hbm_utilization": round(
                    ach_bytes / (pk["hbm_gbps"] * 1e9), 4),
                "ridge_intensity": round(ridge, 1),
                "bound": ("memory" if ai < ridge else "compute"),
            })

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "THROUGHPUT.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
