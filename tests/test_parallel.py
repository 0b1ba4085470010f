"""Scenario batching + mesh sharding (8 virtual CPU devices, conftest)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_control_tpu.config import MpcConfig, QmConfig
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.ocp.reference import target_from_knots
from qm_control_tpu.parallel.batch import (BatchScenario,
                                           make_batched_mpc_step)
from qm_control_tpu.parallel.mesh import (DP_AXIS, make_mesh,
                                          shard_scenarios, sharded_mpc_step)


@pytest.fixture(scope="module")
def info(model):
    return C.make_centroidal_info(model)


@pytest.fixture(scope="module")
def small_cfg():
    return QmConfig().with_(mpc=MpcConfig(time_horizon=0.12, dt=0.04,
                                          num_iterations=1))


def _make_batch(B, cfg):
    q0 = default_q(base_pos=(0, 0, 0.38))
    s = np.zeros(37)
    s[6:30] = q0
    s[8] = 0.4
    s[30:33] = [0.52, 0.09, 0.78]
    s[33:37] = [0.5, -0.5, 0.5, -0.5]
    target = target_from_knots([0.0, 10.0], [s, s])
    ms = GaitSchedule(GAIT_LIBRARY["trot"]).mode_schedule(0.0, 10.0)
    x0 = jnp.asarray(s[:30], dtype=jnp.float32).at[8].set(0.38)
    N = cfg.mpc.num_nodes
    tile = lambda a: jnp.tile(jnp.asarray(a)[None], (B,) + (1,) * jnp.ndim(a))
    # vary initial height per scenario so solutions differ
    xs = tile(x0).at[:, 8].add(jnp.linspace(-0.01, 0.01, B))
    return BatchScenario(
        t=jnp.zeros(B, dtype=jnp.float32), x=xs,
        target=jax.tree_util.tree_map(tile, target),
        ms=jax.tree_util.tree_map(tile, ms),
        W_warm=jnp.zeros((B, N, 30), dtype=jnp.float32),
        X_warm=tile(jnp.tile(x0[None], (N + 1, 1))))


@pytest.mark.heavy
def test_batched_mpc_matches_per_scenario(model, info, small_cfg):
    B = 4
    batch = _make_batch(B, small_cfg)
    step = jax.jit(make_batched_mpc_step(model, info, small_cfg))
    new_batch, policy = step(batch)
    costs = np.asarray(policy.cost)
    assert costs.shape == (B,)
    assert np.isfinite(costs).all()
    # scenarios differ -> costs differ
    assert np.unique(np.round(costs, 6)).size > 1
    # warm starts updated
    assert not np.allclose(np.asarray(new_batch.W_warm),
                           np.asarray(batch.W_warm))


@pytest.mark.heavy
def test_sharded_step_over_mesh(model, info, small_cfg):
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    mesh = make_mesh(jax.devices()[:8])
    B = 16
    batch = _make_batch(B, small_cfg)
    run = sharded_mpc_step(mesh, make_batched_mpc_step(model, info,
                                                       small_cfg))
    new_batch, policy, mean_cost = run(batch)
    assert np.isfinite(float(mean_cost))
    # output stays sharded over the dp axis
    shard_devs = {s.device for s in policy.cost.addressable_shards}
    assert len(shard_devs) == 8
    np.testing.assert_allclose(float(mean_cost),
                               np.asarray(policy.cost).mean(), rtol=1e-5)


def test_shard_scenarios_placement(model, info, small_cfg):
    mesh = make_mesh(jax.devices()[:8])
    batch = _make_batch(8, small_cfg)
    sharded = shard_scenarios(mesh, batch)
    assert len({s.device for s in sharded.x.addressable_shards}) == 8
