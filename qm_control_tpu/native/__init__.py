"""ctypes bindings for the native host-runtime library (native/qm_native.cpp).

Provides PolicyBuffer (seqlock policy snapshots), DelayLine (timestamped
command replay), RatePacer (absolute-deadline loop pacing) and
set_realtime_priority. Builds the .so on first import if the toolchain is
available; otherwise `AVAILABLE` is False and callers use the pure-Python
equivalents (runtime/mrt.py's mutex slot, plant.py's device delay line,
time.sleep pacing).
"""
import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libqm_native.so")

AVAILABLE = False
_lib = None


def _load():
    global AVAILABLE, _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return
    u64, dbl, vp = ctypes.c_uint64, ctypes.c_double, ctypes.c_void_p
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    lib.policy_buffer_create.restype = vp
    lib.policy_buffer_create.argtypes = [u64]
    lib.policy_buffer_destroy.argtypes = [vp]
    lib.policy_buffer_write.argtypes = [vp, u8p, u64, dbl]
    lib.policy_buffer_read.restype = ctypes.c_int
    lib.policy_buffer_read.argtypes = [vp, u8p, u64,
                                       ctypes.POINTER(dbl)]
    lib.policy_buffer_version.restype = u64
    lib.policy_buffer_version.argtypes = [vp]
    lib.delay_line_create.restype = vp
    lib.delay_line_create.argtypes = [u64, u64]
    lib.delay_line_destroy.argtypes = [vp]
    lib.delay_line_push.argtypes = [vp, dbl, u8p]
    lib.delay_line_read.restype = ctypes.c_int
    lib.delay_line_read.argtypes = [vp, dbl, dbl, u8p]
    lib.rate_pacer_create.restype = vp
    lib.rate_pacer_create.argtypes = [dbl]
    lib.rate_pacer_destroy.argtypes = [vp]
    lib.rate_pacer_sleep.restype = u64
    lib.rate_pacer_sleep.argtypes = [vp]
    lib.rate_pacer_overruns.restype = u64
    lib.rate_pacer_overruns.argtypes = [vp]
    lib.set_realtime_priority.restype = ctypes.c_int
    lib.set_realtime_priority.argtypes = [ctypes.c_int]
    _lib = lib
    AVAILABLE = True


_load()


def _as_u8(buf: np.ndarray):
    return buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


class PolicyBuffer:
    """Lock-free (seqlock) snapshot buffer for flat float32 payloads."""

    def __init__(self, num_floats: int):
        assert AVAILABLE, "native library unavailable"
        self.num_floats = num_floats
        self._h = _lib.policy_buffer_create(4 * num_floats)
        self._scratch = np.empty(num_floats, dtype=np.float32)

    def write(self, arr: np.ndarray, stamp: float = 0.0):
        flat = np.ascontiguousarray(arr, dtype=np.float32).reshape(-1)
        assert flat.size == self.num_floats, (flat.size, self.num_floats)
        _lib.policy_buffer_write(self._h, _as_u8(flat), 4 * flat.size,
                                 float(stamp))

    def read(self):
        """(array, stamp) of the newest consistent snapshot, or None.

        Allocates the destination per call: the C++ seqlock read is
        consistent, but a shared scratch would let two reader threads
        tear each other's snapshots at the Python layer."""
        stamp = ctypes.c_double()
        out = np.empty(self.num_floats, dtype=np.float32)
        ok = _lib.policy_buffer_read(self._h, _as_u8(out),
                                     4 * self.num_floats,
                                     ctypes.byref(stamp))
        if not ok:
            return None
        return out, stamp.value

    @property
    def version(self):
        return int(_lib.policy_buffer_version(self._h))

    def __del__(self):
        if _lib is not None and getattr(self, "_h", None):
            _lib.policy_buffer_destroy(self._h)
            self._h = None


class DelayLine:
    """Timestamped ring buffer replaying float32 records `delay` s old."""

    def __init__(self, num_floats: int, capacity: int = 256):
        assert AVAILABLE, "native library unavailable"
        self.num_floats = num_floats
        self._h = _lib.delay_line_create(4 * num_floats, capacity)
        self._scratch = np.empty(num_floats, dtype=np.float32)

    def push(self, stamp: float, rec: np.ndarray):
        flat = np.ascontiguousarray(rec, dtype=np.float32).reshape(-1)
        assert flat.size == self.num_floats
        _lib.delay_line_push(self._h, float(stamp), _as_u8(flat))

    def read(self, now: float, delay: float):
        ok = _lib.delay_line_read(self._h, float(now), float(delay),
                                  _as_u8(self._scratch))
        return self._scratch.copy() if ok else None

    def __del__(self):
        if _lib is not None and getattr(self, "_h", None):
            _lib.delay_line_destroy(self._h)
            self._h = None


class RatePacer:
    """Drift-free loop pacing via clock_nanosleep(TIMER_ABSTIME)."""

    def __init__(self, frequency_hz: float):
        assert AVAILABLE, "native library unavailable"
        self._h = _lib.rate_pacer_create(float(frequency_hz))

    def sleep(self) -> int:
        """Sleep to the next absolute deadline; returns missed periods."""
        return int(_lib.rate_pacer_sleep(self._h))

    @property
    def overruns(self) -> int:
        return int(_lib.rate_pacer_overruns(self._h))

    def __del__(self):
        if _lib is not None and getattr(self, "_h", None):
            _lib.rate_pacer_destroy(self._h)
            self._h = None


def set_realtime_priority(priority: int = 50) -> bool:
    """Try to switch this thread to SCHED_FIFO (reference threadPriority
    50, task.info:38). Returns False without privileges."""
    if not AVAILABLE:
        return False
    return _lib.set_realtime_priority(int(priority)) == 0
