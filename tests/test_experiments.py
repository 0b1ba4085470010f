"""Smoke tests for the canonical experiments (reduced fidelity for CI)."""
import dataclasses

import numpy as np
import pytest

from qm_control_tpu import experiments as E
from qm_control_tpu.config import MpcConfig, QmConfig


def _ci_cfg():
    cfg = QmConfig().with_(mpc=MpcConfig(time_horizon=0.5, dt=0.025,
                                         num_iterations=1))
    return cfg.with_(wbc=dataclasses.replace(cfg.wbc, arm_settling_time=0.0))


@pytest.mark.slow
def test_standing_ee_hold_smoke():
    r = E.standing_ee_hold(cfg=_ci_cfg(), gait="stance", duration=1.0,
                           warmup=10, transient=0.4)
    assert r["safe"]
    assert r["ee_pos_err_max_mm"] < 30.0


@pytest.mark.slow
def test_disturbance_rejection_smoke():
    # smoke config: a 0.4 s release window on a shrunk-horizon CI
    # config cannot settle into the canonical 5 mm band — the smoke
    # test checks the machinery with a coarse band; the canonical
    # experiment (defaults) owns the tight criterion
    r = E.disturbance_rejection(cfg=_ci_cfg(), ee_force=20.0,
                                settle=0.3, hold=0.5, release=0.4,
                                warmup=10, settle_band_mm=25.0)
    assert r["recovered"]
    assert r["lateral_displacement_m"] < 0.3
    assert np.isfinite(r["ee_pos_err_under_load_mm"])


@pytest.mark.slow
def test_wrench_feedthrough_beats_wbc_only_at_25N():
    """The wrench-aware MPC (LoopConfig.mpc_wrench_feedthrough) must
    brace a sustained 25 N lateral EE force that collapses the arm when
    only the WBC sees the wrench (round-3 envelope: 280+ mm, not
    recovered). Asserts ON is finite and strictly out-braces OFF on the
    identical scenario."""
    kw = dict(cfg=_ci_cfg(), ee_force=25.0, settle=0.3, hold=0.5,
              release=0.4, warmup=10, settle_band_mm=25.0)
    on = E.disturbance_rejection(mpc_wrench_feedthrough=True, **kw)
    off = E.disturbance_rejection(mpc_wrench_feedthrough=False, **kw)
    assert np.isfinite(on["ee_excursion_max_mm"])
    assert np.isfinite(on["ee_pos_err_end_mm"])
    assert on["ee_excursion_max_mm"] < off["ee_excursion_max_mm"]


@pytest.mark.slow
def test_batched_rollouts_smoke():
    r = E.batched_rollouts(cfg=_ci_cfg(), batch=4, num_steps=2)
    assert r["finite_fraction"] == 1.0
    assert np.isfinite(r["cost_mean"])
