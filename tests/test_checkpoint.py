"""Checkpoint/resume round trips."""
import jax.numpy as jnp
import numpy as np

from qm_control_tpu.runtime.plant import init_plant_state
from qm_control_tpu.utils.checkpoint import (RunCheckpointer, load_pytree,
                                             save_pytree)


def test_pytree_roundtrip(tmp_path, model):
    state = init_plant_state(jnp.arange(24, dtype=jnp.float32) * 0.1,
                             model=model)
    p = str(tmp_path / "snap.npz")
    save_pytree(p, state)
    restored = load_pytree(p, state)
    np.testing.assert_array_equal(np.asarray(restored.q),
                                  np.asarray(state.q))
    np.testing.assert_array_equal(np.asarray(restored.anchors),
                                  np.asarray(state.anchors))
    assert restored.buf_head == state.buf_head


def test_run_checkpointer_retention(tmp_path):
    ck = RunCheckpointer(str(tmp_path / "ckpts"), keep=2)
    tree = {"a": jnp.ones(3), "b": (jnp.zeros(2), 5.0)}
    for step in (10, 20, 30, 40):
        ck.save(step, tree)
    ckpts = ck._list()
    assert [s for s, _ in ckpts] == [30, 40]
    step, restored = ck.restore_latest(tree)
    assert step == 40
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.ones(3))
    assert float(restored["b"][1]) == 5.0


def test_load_rejects_structure_drift(tmp_path):
    import jax.numpy as jnp
    import pytest
    from qm_control_tpu.utils.checkpoint import load_pytree, save_pytree
    path = str(tmp_path / "snap.npz")
    save_pytree(path, {"a": jnp.zeros(3), "b": jnp.ones(2)})
    # same leaf count, different structure -> treedef mismatch
    with pytest.raises(ValueError, match="treedef mismatch"):
        load_pytree(path, {"a": jnp.zeros(3), "c": jnp.ones(2)})
    # different leaf count
    with pytest.raises(ValueError, match="leaves"):
        load_pytree(path, {"a": jnp.zeros(3)})
