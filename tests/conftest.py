"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths (pjit/shard_map over a Mesh) are exercised in CI
without TPU hardware, per SURVEY.md §4 (multi-host tests without a cluster).
"""
import os

# Force CPU: the session environment may preset JAX_PLATFORMS to a real
# TPU backend (remote-compile tunnels make test compiles pathologically
# slow); unit tests always run on the virtual CPU mesh. NOTE: jax may
# already be imported by a sitecustomize hook, so the env var alone is NOT
# enough — jax.config.update below is the authoritative switch (it works
# as long as no backend has been initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qm_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.devices()

import pytest  # noqa: E402
import numpy as np  # noqa: E402

import qm_control_tpu  # noqa: E402,F401  (sets matmul precision)
from qm_control_tpu.models import load_model  # noqa: E402


@pytest.fixture(scope="session")
def model():
    return load_model()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
