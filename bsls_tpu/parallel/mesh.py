"""Mesh construction: ('block', 'scenario') axes over a TPU slice.

The 'block' axis shards the block dimension (x, projections, A columns);
the 'scenario' axis shards the multi-RHS batch (BASELINE.json:10).  On a
multi-host pod slice, call ``init_distributed()`` first so jax sees all
processes' devices (ICI within a slice, DCN across; SURVEY.md §5).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

__all__ = ["BLOCK_AXIS", "SCENARIO_AXIS", "make_mesh", "init_distributed"]

BLOCK_AXIS = "block"
SCENARIO_AXIS = "scenario"


def make_mesh(
    block: Optional[int] = None,
    scenario: int = 1,
    devices: Optional[Sequence] = None,
) -> jax.sharding.Mesh:
    """Build a ('block', 'scenario') mesh.

    Defaults: all visible devices on the block axis.  ``block * scenario``
    must equal the device count used.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if block is None:
        block = n // scenario
    if block * scenario != n:
        raise ValueError(f"block({block}) * scenario({scenario}) != devices({n})")
    arr = np.asarray(devices).reshape(block, scenario)
    return jax.sharding.Mesh(arr, (BLOCK_AXIS, SCENARIO_AXIS))


def init_distributed(coordinator_address: Optional[str] = None, **kw) -> None:
    """Multi-host bootstrap (gang-scheduled pod slice).

    Thin wrapper over jax.distributed.initialize; no-op if already
    initialised or single-process.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kw)
    except (RuntimeError, ValueError):
        pass  # already initialised or single-process environment
