"""QMMpcController-variant loop (runtime.mpc_loop): legs via
HierarchicalMpcWbc hybrid commands, arm under position control fed
integrated MPC joint velocities (reference QMController.cpp:368-445)."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from qm_control_tpu.config import MpcConfig, QmConfig
from qm_control_tpu.experiments import mpc_variant_standing, _default_cfg


@pytest.mark.slow
def test_mpc_variant_standing():
    cfg = _default_cfg(horizon=0.4, dt=0.04)
    r = mpc_variant_standing(cfg, duration=1.0, warmup=10, transient=0.3)
    assert r["safe"]
    # base holds height (stance, no locomotion commanded)
    assert r["base_height_err_max_mm"] < 60.0
    # the position-controlled arm tracks its integrated command closely
    # (p=5000 PID on a ~1 kg-m^2 joint settles well under one MPC period)
    assert r["arm_track_err_max_rad"] < 0.2
    # EE stays near the held pose (coarse CPU horizon -> loose bound)
    assert r["ee_pos_err_max_mm"] < 120.0
