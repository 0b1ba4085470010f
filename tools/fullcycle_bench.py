"""Batched FULL-cycle throughput: 1 MPC solve + (control_freq/mpc_freq)
WBC ticks + plant substeps per scenario per step (VERDICT r3 #5 — the
BASELINE north-star counts MPC+WBC scenarios, not MPC solves alone).

Appends a "full_cycle" section into THROUGHPUT.json.

Usage (TPU host): python tools/fullcycle_bench.py
      FC_BATCHES="64,128,256" python tools/fullcycle_bench.py
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

from qm_control_tpu.config import QmConfig
from qm_control_tpu.parallel.batch import make_batched_cycle
from __graft_entry__ import _setup


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg, model, info, x0, target, ms = _setup(QmConfig())
    from qm_control_tpu.models.spec import default_q
    q0 = jnp.asarray(default_q(base_pos=(0, 0, 0.38)), jnp.float32)
    batches = [int(b) for b in os.environ.get(
        "FC_BATCHES", "64,128,256").split(",")]
    iters = int(os.environ.get("ITERS", "3"))

    vcycle, make_carries = make_batched_cycle(model, info, cfg)
    points = []
    for B in batches:
        tile = lambda a: jnp.tile(jnp.asarray(a)[None],
                                  (B,) + (1,) * jnp.ndim(a))
        carries = make_carries(q0, B)
        targetB = jax.tree_util.tree_map(tile, target)
        msB = jax.tree_util.tree_map(tile, ms)
        from qm_control_tpu.config import WbcGains
        gains = WbcGains()
        fn = jax.jit(vcycle)
        try:
            carries2, m = fn(carries, targetB, msB, gains)
            jax.block_until_ready(m.mpc_cost)
            carries2, m = fn(carries2, targetB, msB, gains)
            jax.block_until_ready(m.mpc_cost)
            t0 = time.perf_counter()
            c = carries2
            for _ in range(iters):
                c, m = fn(c, targetB, msB, gains)
            jax.block_until_ready(m.mpc_cost)
            dt = (time.perf_counter() - t0) / iters
        except Exception as e:  # noqa: BLE001 - OOM ends the sweep
            log(f"B={B}: {type(e).__name__} — sweep ends")
            points.append({"batch": B, "error": type(e).__name__})
            break
        cps = B / dt
        log(f"B={B:5d}: {dt*1e3:8.2f} ms/cycle -> {cps:8.0f} "
            f"full cycles/s (1 MPC + "
            f"{int(round(1 / (cfg.mpc.mpc_frequency * 0.002)))} ticks)")
        points.append({"batch": B, "cycle_ms": round(dt * 1e3, 2),
                       "cycles_per_s": round(cps, 1)})

    best = max((p for p in points if "cycles_per_s" in p),
               key=lambda p: p["cycles_per_s"], default=None)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "THROUGHPUT.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    out["full_cycle"] = {
        "note": ("one closed-loop cycle = 1 MPC solve + "
                 "control ticks (WBC @ 1 kHz for one MPC period) + "
                 "plant physics; batched over scenarios, XLA cascade "
                 "math WBC"),
        "points": points, "peak": best,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["full_cycle"]))


if __name__ == "__main__":
    main()
