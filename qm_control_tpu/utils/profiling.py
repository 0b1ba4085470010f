"""Tracing / profiling (SURVEY.md §5).

The reference's only instrumentation is benchmark::RepeatedTimer around
the MPC and WBC calls (LeggedRobotSqpMpc.cpp / WbcBase timers). Here:

- `device_trace(...)`: context manager around `jax.profiler.trace` —
  captures an XLA device trace (op-level timeline, HBM usage) viewable
  in TensorBoard / xprof. This is the TPU-native answer to "where does
  the cycle's time go": the fused control cycle is ONE device program,
  so host-side timers cannot see inside it; the device trace can.
- `stage_latencies(...)`: differential-chained per-stage latency
  measurement (the methodology of bench_latency.py as a library: the
  fixed host-dispatch cost of the remote-TPU tunnel cancels exactly
  between two chain lengths).
- `RepeatedTimer` (re-exported from .timers): host-side p50/p99 around
  whole dispatches, used by runtime.loop.ControlLoop.
"""
import contextlib
import time
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .timers import RepeatedTimer  # noqa: F401  (re-export)


@contextlib.contextmanager
def device_trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler device trace into `log_dir` (view with
    TensorBoard's profile plugin or xprof)."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=False,
                             create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _time_chain(chain, reps: int) -> float:
    out = chain()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def chained_latency(step_fn: Callable, k1: int = 10, k2: int = 110,
                    reps: int = 5) -> float:
    """On-device per-call latency of `step_fn(carry) -> carry` via
    differential chaining: time jitted scans of k1 and k2 dependent
    calls and return (T2 - T1) / (k2 - k1) seconds. Cancels the fixed
    host-dispatch cost (measured ~2-40 ms on the remote-TPU tunnel).

    step_fn must map a pytree carry to a like-structured carry; the
    initial carry is built by calling step_fn.init() if present, else
    step_fn must close over its own inputs and take/return a scalar.
    """
    def make(k):
        @jax.jit
        def chain():
            def body(c, _):
                return step_fn(c), ()
            init = getattr(step_fn, "init", lambda: jnp.float32(0.0))()
            c, _ = jax.lax.scan(body, init, None, length=k)
            return c
        return chain

    t1 = _time_chain(make(k1), reps)
    t2 = _time_chain(make(k2), reps)
    return max(t2 - t1, 0.0) / (k2 - k1)


def stage_latencies(stages: Dict[str, Callable], k1: int = 10,
                    k2: int = 110, reps: int = 5) -> Dict[str, float]:
    """Per-stage on-device latencies in seconds: {name: step_fn} ->
    {name: per-call s}. The per-stage decomposition of the control
    cycle the reference gets from its RepeatedTimers, measured with
    tunnel-dispatch-free chaining."""
    return {name: chained_latency(fn, k1, k2, reps)
            for name, fn in stages.items()}
