"""Checkpoint / resume for solver state (SURVEY.md §5).

Solver state is tiny (the padded iterate plus a few scalars/vectors), so
checkpoints are plain .npz files of the flattened state pytree, one per
host.  Multi-host jobs are gang-scheduled with no elasticity; recovery is
restart-and-resume from the last checkpoint — the fault-injection test
kills a solve mid-run and resumes it (tests/test_harness.py).
"""
from __future__ import annotations

import os
import tempfile
from typing import Any

import jax
import numpy as np

__all__ = ["save_state", "load_state", "latest_checkpoint"]


def save_state(path: str, state: Any, meta: dict | None = None) -> None:
    """Atomic save of a solver-state pytree (+ JSON-able meta) to .npz."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["treedef"] = np.asarray(str(treedef))
    if meta:
        import json

        payload["meta"] = np.asarray(json.dumps(meta))
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz")
    os.close(fd)
    try:
        np.savez(tmp, **payload)  # keeps the name (already ends in .npz)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_state(path: str, like: Any):
    """Load a state pytree saved by save_state, shaped like ``like``.

    Returns (state, meta_dict).
    """
    raw = np.load(path, allow_pickle=False)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    leaves = [raw[f"leaf_{i}"] for i in range(n)]
    for i, (a, b) in enumerate(zip(leaves, leaves_like)):
        if tuple(a.shape) != tuple(np.shape(b)):
            raise ValueError(
                f"checkpoint leaf {i} shape {a.shape} != expected {np.shape(b)}"
            )
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    meta = {}
    if "meta" in raw:
        import json

        meta = json.loads(str(raw["meta"]))
    return state, meta


def latest_checkpoint(path: str) -> str | None:
    return path if os.path.exists(path) else None
