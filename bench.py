"""Benchmark: batched SLQ/SQP-MPC throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Metric per BASELINE.json: batched MPC solves/s/chip on the full reference
problem (1.0 s horizon, dt 0.015 -> 67 nodes, 1 SQP iteration per solve,
trot gait, EE-pose target). vs_baseline is against the reference's CPU MPC
rate of 100 solves/s (mpcDesiredFrequency, task.info:146 — one robot).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_SOLVES_PER_S = 100.0   # reference: 100 Hz MPC, one scenario


def _ensure_live_backend(probe_timeout_s: int = 90) -> None:
    """Fall back to CPU if the accelerator backend cannot initialize.

    The remote-TPU tunnel claims a device lease at first backend use; a
    stale lease (e.g. a previous process killed mid-claim) makes
    jax.devices() block indefinitely. Probe in a subprocess with a
    timeout BEFORE importing jax here, and re-point JAX_PLATFORMS at cpu
    when the probe fails, so the benchmark always produces its JSON line
    (flagged with "backend") instead of hanging the driver."""
    import subprocess
    if os.environ.get("JAX_PLATFORMS", "") in ("cpu", ""):
        return
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=probe_timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        print("bench: accelerator backend unreachable; falling back to "
              "CPU", file=sys.stderr)
        os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    _ensure_live_backend()
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp

    import qm_control_tpu  # noqa: F401
    from qm_control_tpu.config import QmConfig
    from qm_control_tpu.parallel.batch import (BatchScenario,
                                               make_batched_mpc_step)
    from __graft_entry__ import _setup

    cfg, model, info, x0, target, ms = _setup(QmConfig())
    N = cfg.mpc.num_nodes
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    B = int(os.environ.get("BENCH_BATCH", "256" if on_tpu else "8"))
    iters = int(os.environ.get("BENCH_ITERS", "10" if on_tpu else "3"))

    tile = lambda a: jnp.tile(jnp.asarray(a)[None], (B,) + (1,) * jnp.ndim(a))
    batch = BatchScenario(
        t=jnp.zeros(B, dtype=jnp.float32),
        x=tile(x0),
        target=jax.tree_util.tree_map(tile, target),
        ms=jax.tree_util.tree_map(tile, ms),
        W_warm=jnp.zeros((B, N, 30), dtype=jnp.float32),
        X_warm=tile(jnp.tile(x0[None], (N + 1, 1))),
    )
    step = jax.jit(make_batched_mpc_step(model, info, cfg))

    # compile + warm up (also converges the warm start, like the real loop)
    batch, policy = step(batch)
    jax.block_until_ready(policy.cost)
    batch, policy = step(batch)
    jax.block_until_ready(policy.cost)

    t0 = time.perf_counter()
    for _ in range(iters):
        batch, policy = step(batch)
    jax.block_until_ready(policy.cost)
    dt = (time.perf_counter() - t0) / iters

    solves_per_s = B / dt
    result = {
        "metric": "batched_sqp_mpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": f"solves/s (B={B}, N={N}, 1 SQP iter, {dev.device_kind})",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
    }
    if dev.platform == "cpu" and os.environ.get("JAX_PLATFORMS") == "cpu":
        result["note"] = ("CPU fallback: remote TPU lease unreachable at "
                          "bench time; last TPU v5e measurement was "
                          "1131-1141 solves/s (BENCH_r01.json, PARITY.md)")

    # --- B=1 real-time latencies (VERDICT r2 #3: make the 10 ms MPC /
    # 2 ms WBC deadline evidence a driver-captured artifact, reference
    # task.info:146-147). Differential chaining cancels the fixed
    # host->device dispatch cost (see bench_latency.py docstring). ---
    if on_tpu and os.environ.get("BENCH_SKIP_LATENCY", "") != "1":
        try:
            from bench_latency import measure_latencies
            lat = measure_latencies(cfg, model, info, x0, target, ms)
            result.update(lat)
            result["mpc_deadline_10ms_met"] = bool(
                lat["mpc_b1_ms"] <= 10.0)
            result["wbc_deadline_2ms_met"] = bool(
                lat["wbc_b1_fused_ms"] <= 2.0)
        except Exception as e:  # noqa: BLE001 - never lose the line
            result["latency_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
