"""Native host-runtime library (C++ via ctypes): seqlock buffer, delay
line, rate pacer — including a writer/reader race soak."""
import os
import threading
import time

import numpy as np
import pytest

from qm_control_tpu import native

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="native toolchain unavailable")


def test_policy_buffer_roundtrip():
    pb = native.PolicyBuffer(64)
    assert pb.read() is None
    data = np.arange(64, dtype=np.float32)
    pb.write(data, stamp=1.5)
    out, stamp = pb.read()
    np.testing.assert_array_equal(out, data)
    assert stamp == 1.5
    assert pb.version == 1


def test_policy_buffer_concurrent_consistency():
    """Writer spins at full speed; every read must be a consistent
    snapshot (all elements equal — a torn read would mix values)."""
    n = 1024
    pb = native.PolicyBuffer(n)
    stop = threading.Event()

    def writer():
        i = 0
        while not stop.is_set():
            pb.write(np.full(n, float(i % 1000), dtype=np.float32),
                     stamp=float(i))
            i += 1

    th = threading.Thread(target=writer, daemon=True)
    th.start()
    try:
        deadline = time.time() + 2.0
        reads = 0
        while time.time() < deadline:
            res = pb.read()
            if res is None:
                continue
            arr, _ = res
            assert (arr == arr[0]).all(), "torn read!"
            reads += 1
        assert reads > 100
    finally:
        stop.set()
        th.join(timeout=2)


def test_delay_line_replays_old_records():
    dl = native.DelayLine(4, capacity=32)
    assert dl.read(0.0, 0.0) is None
    # binary-exact stamps (i * 0.25) avoid float boundary ambiguity
    for i in range(10):
        dl.push(i * 0.25, np.full(4, i, dtype=np.float32))
    # at t=2.25 with delay 1.25 -> newest stamp <= 1.0 = rec 4
    out = dl.read(2.25, 1.25)
    np.testing.assert_array_equal(out, np.full(4, 4, dtype=np.float32))
    # zero delay -> newest
    out = dl.read(2.25, 0.0)
    np.testing.assert_array_equal(out, np.full(4, 9, dtype=np.float32))
    # delay older than everything -> oldest held
    out = dl.read(2.25, 100.0)
    np.testing.assert_array_equal(out, np.full(4, 0, dtype=np.float32))


def test_rate_pacer_paces():
    hz = 200.0
    p = native.RatePacer(hz)
    t0 = time.perf_counter()
    for _ in range(50):
        p.sleep()
    elapsed = time.perf_counter() - t0
    # 50 periods at 200 Hz = 0.25 s (allow generous jitter in CI)
    assert 0.2 < elapsed < 0.6, elapsed


def test_rate_pacer_counts_overruns():
    p = native.RatePacer(1000.0)
    time.sleep(0.05)     # miss ~50 periods
    missed = p.sleep()
    assert missed >= 10
    assert p.overruns >= missed


def test_set_realtime_priority_no_crash():
    # may fail without privileges; must not raise either way
    ok = native.set_realtime_priority(50)
    assert ok in (True, False)


@pytest.mark.heavy
def test_tsan_soak():
    """ThreadSanitizer soak of the seqlock PolicyBuffer (SURVEY.md §5
    race detection — the round-2 VERDICT's last 'partial' row).

    Builds native/tsan_soak.cpp with -fsanitize=thread (instrumenting
    the exact qm_native.cpp the ctypes .so ships), runs a writer + two
    readers, and asserts: no torn snapshot escaped the seqlock protocol
    AND no TSan report fired (TSAN_OPTIONS exitcode=66; the known
    benign-by-design payload copies are suppressed via
    tsan_suppressions.txt — see the rationale there)."""
    import shutil
    import subprocess
    import tempfile
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("no g++ on this host")
    src_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")
    with tempfile.TemporaryDirectory() as td:
        exe = os.path.join(td, "tsan_soak")
        build = subprocess.run(
            [gxx, "-std=c++17", "-O1", "-g", "-fsanitize=thread",
             "-pthread", "-o", exe, "tsan_soak.cpp"],
            cwd=src_dir, capture_output=True, text=True, timeout=300)
        if build.returncode != 0:
            if "fsanitize=thread" in build.stderr:
                pytest.skip("toolchain lacks TSan runtime")
            raise AssertionError(build.stderr[-2000:])
        env = dict(os.environ)
        env["TSAN_OPTIONS"] = ("suppressions="
                               + os.path.join(src_dir,
                                              "tsan_suppressions.txt")
                               + " exitcode=66")
        run = subprocess.run([exe], env=env, capture_output=True,
                             text=True, timeout=300)
        assert run.returncode != 66, ("TSan report:\n"
                                      + run.stderr[-3000:])
        assert run.returncode == 0, run.stdout + run.stderr[-2000:]
        assert "OK" in run.stdout
