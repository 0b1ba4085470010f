"""Run the flagship traverse experiment (README 30 cm EE-hold walk) and
print the result dict as JSON.

Usage: JAX_PLATFORMS=cpu python tools/run_traverse.py [speed] [max_time]
Env:   TRAVERSE_KW='{"delay_s": 0.009}' for extra kwargs.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qm_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

# env alone is NOT enough: a sitecustomize hook may have imported jax
# already and pinned the axon/TPU platform (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.devices()


def main():
    from qm_control_tpu import experiments as E
    speed = float(sys.argv[1]) if len(sys.argv) > 1 else -0.03
    max_time = float(sys.argv[2]) if len(sys.argv) > 2 else 12.0
    kw = json.loads(os.environ.get("TRAVERSE_KW", "{}"))
    r = E.traverse_ee_hold(speed=speed, max_time=max_time, **kw)
    r.pop("log", None)
    print(json.dumps(r, indent=1, default=str), flush=True)


if __name__ == "__main__":
    main()
