"""Checkpoint / resume for solver state (SURVEY.md §5).

Solver state is tiny (the padded iterate plus a few scalars/vectors), so
checkpoints are plain .npz files of the flattened state pytree.  Pod-ready
semantics:

  * **Per-host shard dumps** — each process writes only its *addressable*
    shards of every sharded leaf (keyed by global offset), to its own
    ``<stem>.procK.npz`` file; nothing is gathered across hosts at save
    time.  On load the global array is reassembled from every proc file
    present.  A single-process multi-device mesh (e.g. the 8-virtual-CPU
    test mesh) exercises the same shard-keyed format.
  * **Rotation** — ``save_state(..., keep=K)`` writes an
    iteration-stamped sibling ``<stem>.itNNNNNNNNN[.procK].npz`` and prunes
    all but the newest ``K``; ``latest_checkpoint`` resolves the newest
    stamped step (falling back to the plain path).
  * **Atomicity** — every file is written to a temp name in the target
    directory and ``os.replace``d, so a SIGKILL mid-save never corrupts the
    previous checkpoint (fault-injection test: tests/test_harness.py kills
    a solver subprocess mid-run and resumes).

Multi-host jobs are gang-scheduled with no elasticity; recovery is
restart-and-resume from the last checkpoint.
"""
from __future__ import annotations

import glob
import json
import os
import re
import tempfile
from typing import Any

import jax
import numpy as np

__all__ = ["save_state", "load_state", "latest_checkpoint"]

_STAMP_RE = re.compile(r"\.it(\d{9})(?:\.proc\d+)?\.npz$")


def _stem(path: str) -> str:
    return path[:-4] if path.endswith(".npz") else path


def _proc_suffix() -> str:
    return f".proc{jax.process_index()}" if jax.process_count() > 1 else ""


def _is_sharded(x) -> bool:
    # shard-dump path for any non-replicated placement: multiple local
    # shards OR shards on other hosts (a pod with 1 device per host has
    # exactly one addressable shard yet must NOT be np.asarray'd)
    return (
        isinstance(x, jax.Array)
        and not x.is_fully_replicated
        and (len(x.addressable_shards) > 1 or not x.is_fully_addressable)
    )


def _atomic_write(target: str, payload: dict) -> None:
    d = os.path.dirname(os.path.abspath(target)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz")
    os.close(fd)
    try:
        np.savez(tmp, **payload)  # keeps the name (already ends in .npz)
        os.replace(tmp, target)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def save_state(path: str, state: Any, meta: dict | None = None, keep: int = 0) -> None:
    """Atomic save of a solver-state pytree (+ JSON-able meta) to .npz.

    Sharded leaves are dumped shard-by-shard (this process's addressable
    shards only, keyed by global offset).  ``keep > 0`` writes an
    iteration-stamped file (meta must carry ``iteration``) and rotates old
    stamps; ``keep == 0`` overwrites ``path`` itself.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload: dict = {"treedef": np.asarray(str(treedef))}
    for i, x in enumerate(leaves):
        if _is_sharded(x):
            payload[f"leaf_{i}_shape"] = np.asarray(x.shape, np.int64)
            seen = set()
            for j, sh in enumerate(x.addressable_shards):
                starts = tuple(int(s.start or 0) for s in sh.index)
                if starts in seen:  # replicated-over-an-axis duplicates
                    continue
                seen.add(starts)
                payload[f"leaf_{i}_s{j}"] = np.asarray(sh.data)
                payload[f"leaf_{i}_o{j}"] = np.asarray(starts, np.int64)
        else:
            payload[f"leaf_{i}"] = np.asarray(x)
    if meta:
        payload["meta"] = np.asarray(json.dumps(meta))

    if keep > 0:
        it = int((meta or {}).get("iteration", 0))
        target = f"{_stem(path)}.it{it:09d}{_proc_suffix()}.npz"
        _atomic_write(target, payload)
        _prune(path, keep)
    else:
        _atomic_write(f"{_stem(path)}{_proc_suffix()}.npz", payload)


def _prune(path: str, keep: int) -> None:
    stamped = sorted(
        f for f in glob.glob(f"{_stem(path)}.it*.npz") if _STAMP_RE.search(f)
    )
    # group by iteration stamp so proc siblings rotate together
    steps = sorted({_STAMP_RE.search(f).group(1) for f in stamped})
    for step in steps[:-keep] if keep else []:
        for f in stamped:
            if f".it{step}" in f:
                try:
                    os.remove(f)
                except OSError:
                    pass


def _proc_files(resolved: str) -> list[str]:
    """All per-process siblings of a resolved checkpoint file (itself if
    single-process)."""
    m = re.search(r"\.proc\d+\.npz$", resolved)
    if not m:
        return [resolved]
    base = resolved[: m.start()]
    return sorted(glob.glob(f"{base}.proc*.npz"))


def load_state(path: str, like: Any):
    """Load a state pytree saved by save_state, shaped like ``like``.

    Validates both shapes and dtypes against ``like`` (a dtype mismatch
    would silently retrace the jitted chunk under the wrong signature).
    Returns (state, meta_dict).
    """
    files = _proc_files(path)
    raws = [np.load(f, allow_pickle=False) for f in files]
    raw0 = raws[0]
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    leaves = []
    for i, ref in enumerate(leaves_like):
        want_shape = tuple(np.shape(ref))
        # NB: getattr's default is evaluated eagerly — np.asarray there
        # would fetch sharded leaves (fails on non-addressable shards)
        dt = getattr(ref, "dtype", None)
        want_dtype = np.dtype(dt) if dt is not None else np.asarray(ref).dtype
        if f"leaf_{i}" in raw0.files:
            a = raw0[f"leaf_{i}"]
        else:
            shape = tuple(raw0[f"leaf_{i}_shape"].tolist())
            a = None
            for raw in raws:
                pat = re.compile(rf"leaf_{i}_s(\d+)$")
                for key in raw.files:
                    m = pat.match(key)
                    if not m:
                        continue
                    data = raw[key]
                    if a is None:
                        a = np.zeros(shape, data.dtype)
                    starts = raw[f"leaf_{i}_o{m.group(1)}"].tolist()
                    sl = tuple(
                        slice(int(s), int(s) + d) for s, d in zip(starts, data.shape)
                    )
                    a[sl] = data
            if a is None:
                raise ValueError(f"checkpoint {path} missing data for leaf {i}")
        if tuple(a.shape) != want_shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {a.shape} != expected {want_shape}"
            )
        if np.dtype(a.dtype) != want_dtype:
            raise ValueError(
                f"checkpoint leaf {i} dtype {a.dtype} != expected {want_dtype}"
            )
        leaves.append(a)
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    meta = {}
    if "meta" in raw0.files:
        meta = json.loads(str(raw0["meta"]))
    return state, meta


def latest_checkpoint(path: str) -> str | None:
    """Resolve the newest checkpoint for ``path``: highest iteration-stamped
    sibling if rotation was used, else the plain file (with per-process
    suffix when running multi-host)."""
    stamped = [f for f in glob.glob(f"{_stem(path)}.it*.npz") if _STAMP_RE.search(f)]
    if stamped:
        best = max(_STAMP_RE.search(f).group(1) for f in stamped)
        mine = f"{_stem(path)}.it{best}{_proc_suffix()}.npz"
        if os.path.exists(mine):
            return mine
        sibs = [f for f in stamped if f".it{best}" in f]
        return sorted(sibs)[0] if sibs else None
    cand = f"{_stem(path)}{_proc_suffix()}.npz"
    if os.path.exists(cand):
        return cand
    return path if os.path.exists(path) else None
