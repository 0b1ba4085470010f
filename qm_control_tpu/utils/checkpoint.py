"""Checkpoint / resume for long batched runs.

The reference persists nothing at runtime except its CppAD compile cache
(SURVEY.md §5 'Checkpoint/resume') — the analog of the JAX persistent
compilation cache (enabled via JAX_COMPILATION_CACHE_DIR). For long
batched scenario runs this module adds state snapshots: any pytree of
arrays (CycleCarry, BatchScenario, MpcPolicy, ...) round-trips through a
single .npz with its tree structure stored alongside.
"""
import json
import os

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    """Serialize a pytree of arrays/scalars to `path` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(_treedef_repr(treedef)).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_pytree(path: str, like):
    """Load a snapshot saved by save_pytree; `like` supplies the pytree
    structure (its leaf values are ignored).

    The stored treedef string and leaf count are validated against
    `like` so structure drift between the writing and reading program
    versions fails loudly instead of silently misassigning leaves."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    n_stored = sum(1 for k in data.files if k.startswith("leaf_"))
    if n_stored != n:
        raise ValueError(
            f"checkpoint {path} has {n_stored} leaves but the supplied "
            f"structure expects {n}")
    if "__treedef__" in data.files:
        stored = json.loads(bytes(data["__treedef__"]).decode())
        if stored != _treedef_repr(treedef):
            raise ValueError(
                f"checkpoint {path} treedef mismatch:\n  stored:   "
                f"{stored}\n  expected: {_treedef_repr(treedef)}")
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _treedef_repr(treedef) -> str:
    return str(treedef)


class RunCheckpointer:
    """Periodic snapshots with retention for long runs."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def save(self, step: int, tree) -> str:
        path = os.path.join(self.directory, f"ckpt_{step:09d}.npz")
        save_pytree(path, tree)
        self._prune()
        return path

    def latest(self):
        """(step, path) of the newest checkpoint, or None."""
        ckpts = self._list()
        return ckpts[-1] if ckpts else None

    def restore_latest(self, like):
        latest = self.latest()
        if latest is None:
            return None, None
        step, path = latest
        return step, load_pytree(path, like)

    def _list(self):
        out = []
        for f in sorted(os.listdir(self.directory)):
            if f.startswith("ckpt_") and f.endswith(".npz"):
                out.append((int(f[5:-4]), os.path.join(self.directory, f)))
        return out

    def _prune(self):
        ckpts = self._list()
        for step, path in ckpts[:-self.keep]:
            os.remove(path)
