"""Golden-value regression fixtures (SURVEY.md §4 'golden-value
integration'): the standing-MPC solution and WBC torques on the canonical
scenario are pinned; unintended numerical drift in the model/solver stack
fails these tests.

The stored values were produced by this framework (the reference stack is
not runnable in this environment); they serve as cross-round regression
anchors, with physical invariants asserted alongside.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_control_tpu.config import MpcConfig, QmConfig
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.mpc.mpc import MpcSolver
from qm_control_tpu.ocp.reference import target_from_knots

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_standing.json")


def _scenario():
    cfg = QmConfig().with_(mpc=MpcConfig(time_horizon=0.5, dt=0.025,
                                         num_iterations=3))
    q0 = default_q(base_pos=(0, 0, 0.38))
    s = np.zeros(37)
    s[6:30] = q0
    s[8] = 0.4
    s[30:33] = [0.52, 0.09, 0.78]
    s[33:37] = [0.5, -0.5, 0.5, -0.5]
    target = target_from_knots([0.0, 10.0], [s, s])
    ms = GaitSchedule(GAIT_LIBRARY["stance"]).mode_schedule(0.0, 10.0)
    x0 = jnp.asarray(s[:30], dtype=jnp.float32).at[8].set(0.38)
    return cfg, x0, target, ms


@pytest.fixture(scope="module")
def solution(model):
    info = C.make_centroidal_info(model)
    cfg, x0, target, ms = _scenario()
    mpc = MpcSolver(model, info, cfg)
    pol = mpc.solve(0.0, x0, target, ms)
    return pol


@pytest.mark.heavy
def test_golden_standing_solution(solution):
    probe = {
        "cost": float(solution.cost),
        "x_mid": np.asarray(solution.X[10]).round(5).tolist(),
        "u_first": np.asarray(solution.U[0]).round(4).tolist(),
        "u_mid": np.asarray(solution.U[10]).round(4).tolist(),
    }
    if not os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH, "w") as f:
            json.dump(probe, f, indent=1)
        pytest.skip("golden file created; rerun to compare")
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    assert abs(probe["cost"] - golden["cost"]) <= \
        1e-3 * max(1.0, abs(golden["cost"]))
    np.testing.assert_allclose(probe["x_mid"], golden["x_mid"],
                               atol=2e-3)
    np.testing.assert_allclose(probe["u_first"], golden["u_first"],
                               atol=0.5)      # forces in N
    np.testing.assert_allclose(probe["u_mid"], golden["u_mid"], atol=0.5)


def test_golden_physical_invariants(solution, model):
    """Invariants that must hold regardless of numerical details."""
    U = np.asarray(solution.U)
    fz = U[:, 2] + U[:, 5] + U[:, 8] + U[:, 11]
    np.testing.assert_allclose(fz[:-1].mean(), model.total_mass * 9.81,
                               rtol=0.05)
    X = np.asarray(solution.X)
    assert 0.37 < X[-1, 8] < 0.41          # rises toward 0.4
    assert np.abs(U[:, 12:24]).max() < 2.0  # leg joint velocities sane
