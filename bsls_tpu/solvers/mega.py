"""Dispatch for the whole-chunk PGD megakernel (ops/pallas/megastep_kernel).

Status: VALIDATED BUT OPT-IN (BSLS_MEGA=1).  The kernel is bit-identical
to the XLA pgd/exact path on-chip and runs 1000 fused iterations per
pallas_call at 28.7 µs/iter.  It was built against the round-1 belief that
tiny-dense was dispatch-bound at 125 µs/iter — but that number turned out
to be per-chunk HOST READBACKS (~25 ms/roundtrip, 4 per chunk), not device
dispatch: with the async chunk loop (solvers/base.py) the plain XLA scan
chunk measures 7.2 µs/iter of true device compute, 4x FASTER than this
kernel (its per-slot w x (m,B)@(B,1) HIGHEST-precision contractions waste
127/128 MXU lanes, while XLA fuses the whole step with full-width
matmuls).  Measurements in BASELINE.md.  Kept as a validated Pallas
megakernel pattern + cross-check; not worth dispatching by default.

The runner consumes and produces the same ``PGDState`` the XLA path uses,
so chunk-loop stopping, checkpointing, resume, certify and the final
extraction all work unchanged.  The FW-gap certificate is computed once
per chunk boundary; within a chunk ``trace_gap`` replicates the boundary
value.

Eligibility (all required; anything else falls back to the XLA path):
  method pgd + exact line search in x-space, single RHS, dense A, one
  width bucket, unsharded, fp32, and the two per-slot A copies fitting in
  ~10 MB of VMEM.  Gate: BSLS_MEGA=1 enables (interpret mode off-TPU, for
  testing); default OFF everywhere.
"""
from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import layout as L, quadratic as Q

__all__ = ["make_mega_runner", "mega_eligible", "use_mega"]

MAX_VMEM_BYTES = 10 << 20


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@lru_cache(maxsize=1)
def use_mega() -> bool:
    if os.environ.get("BSLS_NO_MEGA", "") == "1":
        return False
    # opt-in only: the async chunk loop made the XLA path 4x faster than
    # this kernel (see module docstring)
    return os.environ.get("BSLS_MEGA", "") == "1"


def mega_eligible(dp, method: str, opts) -> bool:
    from ..ops.pallas.megastep_kernel import mega_vmem_bytes

    if not use_mega():
        return False
    if method != "pgd" or opts.line_search != "exact" or opts.space != "x":
        return False
    if dp.b.ndim != 1 or dp.col_axis or dp.row_axis:
        return False
    if not isinstance(dp.A, L.DeviceDense) or len(dp.buckets) != 1:
        return False
    if dp.b.dtype != jnp.float32:
        return False
    B, w = dp.buckets[0].mask.shape
    return mega_vmem_bytes(dp.num_rows, B, w) <= MAX_VMEM_BYTES


def make_mega_runner(dp, method: str, opts, L_est, chunk: int) -> Optional[object]:
    """Return run(state) -> (state, (trace_f, trace_gap)), or None if the
    megakernel does not apply to this (problem, options) combination."""
    if not mega_eligible(dp, method, opts):
        return None

    from ..ops.pallas.megastep_kernel import pgd_chunk_fused, split_slots
    from .base import fw_gap
    from .pgd import PGDState

    bk = dp.buckets[0]
    B, w = bk.mask.shape
    A3, At3 = split_slots(dp.A.data, B, w)
    t0 = (jnp.asarray(opts.step_size, dp.b.dtype) if opts.step_size > 0
          else jnp.asarray(1.0, dp.b.dtype) / L_est)
    interp = not _on_tpu()

    @jax.jit
    def _boundary(x_bw):
        """Exact residual/objective/certificate at the chunk boundary."""
        x_flat = L.padded_to_flat(dp, (x_bw,))
        r = Q.residual(dp, x_flat)
        f = Q.objective_from_residual(dp, r)
        g_flat = Q.grad_flat(dp, r)
        gp = L.flat_to_padded(dp, g_flat)
        gap = fw_gap(dp, g_flat, x_flat, gp)
        return r, f, gap, x_flat, g_flat

    def run(state):
        x_new, tf = pgd_chunk_fused(
            A3, At3, dp.b, state.xp[0], bk.sizes, bk.radius, t0,
            steps=chunk, interpret=interp,
        )
        r, f, gap, x_flat, g_flat = _boundary(x_new)
        tg = jnp.broadcast_to(gap, (chunk,))
        st = PGDState(xp=(x_new,), r=r, f=f, gap=gap, k=state.k + chunk,
                      x_prev=x_flat, g_prev=g_flat)
        return st, (tf, tg)

    return run
