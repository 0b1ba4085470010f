"""MRT: real-time MPC <-> tracking decoupling with an async solver thread.

Replaces OCS2's MPC_MRT_Interface + the MPC worker thread (reference
QMController.cpp:309-334 spawns the thread; :133-141 exchanges
observation/policy through the interface's internal buffer):

  - the solver thread runs MpcSolver.solve paced to mpcDesiredFrequency,
    reading the latest observation from a lock-free slot;
  - the control thread publishes observations and reads the newest policy
    through a double buffer (the realtime_tools::RealtimeBuffer pattern,
    SURVEY.md §2.3 item 4);
  - evaluate() interpolates the current policy at (t, x) — the
    evaluatePolicy equivalent.

Device-side note: the jitted solve itself releases the GIL while XLA runs,
so the control thread keeps ticking during solves.
"""
import threading
import time
from typing import Optional

import jax
import numpy as np

from ..mpc.mpc import MpcPolicy, MpcSolver


def evaluate_policy_np(policy, t):
    """Host-side (numpy) policy interpolation — identical semantics to
    mpc.evaluate_policy but free of device dispatch, so the real-time
    thread's evaluate stays in the microsecond range even while the
    solver thread is busy (measured: eager jnp evaluate p99 was ~370 ms
    under solver contention)."""
    tn = policy.t_nodes
    idx = int(np.clip(np.searchsorted(tn, t, side="right") - 1, 0,
                      tn.shape[0] - 2))
    t0, t1 = tn[idx], tn[idx + 1]
    a = float(np.clip((t - t0) / max(t1 - t0, 1e-9), 0.0, 1.0))
    x = (1 - a) * policy.X[idx] + a * policy.X[idx + 1]
    u = (1 - a) * policy.U[idx] + a * policy.U[idx + 1]
    return x, u, int(policy.modes[idx])


class _Slot:
    """Single-value lock-free-ish exchange (mutex-guarded swap; the writes
    are tiny host structs, matching realtime_tools::RealtimeBuffer)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._value = None
        self._version = 0

    def write(self, value):
        with self._lock:
            self._value = value
            self._version += 1

    def read(self):
        with self._lock:
            return self._value, self._version


class _NativePolicySlot:
    """Policy exchange through the native seqlock PolicyBuffer
    (native/qm_native.cpp): the real-time reader never blocks on the
    writer. Policies are flattened to one float32 vector; the pytree
    structure is captured from the first write."""

    def __init__(self):
        from .. import native as _native
        self._native = _native
        self._buf = None
        self._treedef = None
        self._shapes = None

    def write(self, policy):
        import jax
        leaves, treedef = jax.tree_util.tree_flatten(policy)
        flat = np.concatenate(
            [np.asarray(l, dtype=np.float32).reshape(-1) for l in leaves])
        if self._buf is None:
            self._shapes = [np.asarray(l).shape for l in leaves]
            self._dtypes = [np.asarray(l).dtype for l in leaves]
            self._treedef = treedef
            self._buf = self._native.PolicyBuffer(flat.size)
        self._buf.write(flat, stamp=float(policy.t_nodes[0]))

    def read(self):
        if self._buf is None:
            return None, 0
        res = self._buf.read()
        if res is None:
            return None, 0
        flat, _ = res
        import jax
        leaves = []
        ofs = 0
        for shp, dt in zip(self._shapes, self._dtypes):
            n = int(np.prod(shp)) if shp else 1
            leaves.append(flat[ofs:ofs + n].reshape(shp).astype(dt))
            ofs += n
        return jax.tree_util.tree_unflatten(self._treedef, leaves), \
            self._buf.version


class MpcMrtInterface:
    """Async MPC runner + policy double buffer."""

    def __init__(self, solver: MpcSolver, mpc_frequency: float = None,
                 use_native: bool = True):
        self.solver = solver
        self.freq = mpc_frequency or solver.cfg.mpc.mpc_frequency
        self._obs = _Slot()       # (t, x, target, mode_schedule)
        from .. import native as _native
        if use_native and _native.AVAILABLE:
            self._policy = _NativePolicySlot()   # seqlock (C++)
        else:
            self._policy = _Slot()               # mutex fallback
        self._thread: Optional[threading.Thread] = None
        self._running = threading.Event()
        self._solve_count = 0
        self._error: Optional[BaseException] = None

    # -- control-thread API -------------------------------------------------
    def set_current_observation(self, t, x, target, ms):
        self._obs.write((t, x, target, ms))

    def initial_policy_received(self) -> bool:
        return self._policy.read()[0] is not None

    def evaluate(self, t, x):
        """(x_des, u_des, mode) from the newest policy (evaluatePolicy);
        numpy arrays, computed host-side."""
        policy, _ = self._policy.read()
        if policy is None:
            raise RuntimeError("no policy yet — call start() and wait for "
                               "initial_policy_received()")
        return evaluate_policy_np(policy, t)

    def get_policy(self) -> Optional[MpcPolicy]:
        return self._policy.read()[0]

    # -- solver thread ------------------------------------------------------
    def start(self):
        if self._thread is not None:
            return
        self._running.set()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="mpc-worker")
        self._thread.start()

    def stop(self):
        self._running.clear()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None
        if self._error is not None:
            # the reference's MPC-thread exception trap halts the
            # controller (QMController.cpp:327-330)
            raise self._error

    def _loop(self):
        period = 1.0 / self.freq
        while self._running.is_set():
            tick = time.perf_counter()
            obs, _ = self._obs.read()
            if obs is not None:
                t, x, target, ms = obs
                try:
                    policy = self.solver.solve(t, x, target, ms)
                except BaseException as e:     # trap -> surface on stop()
                    self._error = e
                    self._running.clear()
                    return
                # one device->host transfer per solve; evaluate() then
                # never touches the device
                host_policy = jax.tree_util.tree_map(np.asarray, policy)
                self._policy.write(host_policy)
                self._solve_count += 1
            # executeAndSleep pacing (OCS2 helper the reference uses)
            remaining = period - (time.perf_counter() - tick)
            if remaining > 0:
                time.sleep(remaining)

    @property
    def solve_count(self):
        return self._solve_count
