"""Config system: INFO parsing + reference-file ingestion parity."""
import os

import numpy as np

from qm_control_tpu.config import (QmConfig, info_matrix, load_task_config,
                                   parse_info)

REF_TASK = "/root/reference/qm_controllers/config/task.info"
REF_REFERENCE = "/root/reference/qm_controllers/config/reference.info"

SAMPLE = """
; a comment
top_value   3.5
group
{
  name        "quoted string"   ; trailing comment
  flag        true              // c++ comment
  mat
  {
    scaling 1e-3
    (0,0) 1.0
    (1,0) 2.0
  }
}
"""


def test_parse_info_basic():
    t = parse_info(SAMPLE)
    assert t["top_value"] == "3.5"
    assert t["group"]["name"] == "quoted string"
    assert t["group"]["flag"] == "true"
    m = info_matrix(t["group"]["mat"], 2)
    np.testing.assert_allclose(m, [1.0, 2.0])


def test_defaults_match_reference_values():
    cfg = QmConfig()
    assert cfg.mpc.num_nodes == 67  # round(1.0 / 0.015)
    assert cfg.mpc.dt == 0.015
    assert cfg.cost.q_diag[8] == 3000.0   # p_base_z
    assert cfg.cost.r_diag[12] == 5000.0  # foot velocity weight
    assert cfg.friction.friction_coefficient == 0.3
    assert cfg.joint_limits.arm_velocity_upper[3] == 0.837
    assert cfg.wbc.kp_swing == 350.0


def test_ingest_reference_info_files():
    if not (os.path.exists(REF_TASK) and os.path.exists(REF_REFERENCE)):
        import pytest
        pytest.skip("reference checkout not available")
    cfg = load_task_config(REF_TASK, REF_REFERENCE)
    default = QmConfig()
    # ingested values must equal the built-in defaults (they ARE the
    # reference values)
    assert cfg.mpc == default.mpc
    np.testing.assert_allclose(cfg.cost.q_diag, default.cost.q_diag)
    np.testing.assert_allclose(cfg.cost.r_diag, default.cost.r_diag)
    assert cfg.cost.r_scaling == 1e-3
    assert cfg.friction == default.friction
    np.testing.assert_allclose(cfg.joint_limits.arm_velocity_lower,
                               default.joint_limits.arm_velocity_lower)
    assert cfg.swing == default.swing
    np.testing.assert_allclose(cfg.reference.default_joint_state,
                               default.reference.default_joint_state)
    assert cfg.reference.com_height == 0.4
