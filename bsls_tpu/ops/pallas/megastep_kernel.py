"""Whole-chunk fused PGD megakernel for small dense instances.

The tiny-dense config is dispatch-bound, not compute-bound: the measured
125 µs/iteration against a 21.6 µs memory roofline (BASELINE.md audit) is
almost entirely per-op overhead — the instance is 4 MB and every operand
fits in VMEM.  This kernel runs ``steps`` complete projected-gradient
iterations (matvec, gradient, projection by bisection, exact quadratic
line search, residual update) in ONE pallas_call, so the op overhead is
paid once per chunk instead of ~30 times per iteration.

Layout contract: x is carried as a (B, w) padded block rectangle; the
dense A is passed pre-permuted as (m, B*w) whose column order is the
row-major raster of (B, w) — so the only in-kernel layout change is the
(B, w) <-> (1, B*w) reshape (a relayout of a few KB).  All reductions are
full-tile sums; the bisection projection is the on-chip-validated pattern
from projection_kernel.

Scope (by design, not limitation): single-RHS, dense A, one bucket,
VMEM-resident (m * n <= ~12 MB).  Larger instances keep the chunked XLA
path, which is already memory-bound there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pgd_chunk_fused"]

_BIG = 3.0e38
_N_BISECT = 40


def _proj_bw(v, widths_col, radius_col):
    """Bisection projection on a (B, w) tile (widths/radius as (B, 1))."""
    B, w = v.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, w), 1)
    valid = lane < widths_col
    vm_lo = jnp.where(valid, v, _BIG)
    vm_hi = jnp.where(valid, v, -_BIG)
    lo0 = jnp.min(vm_lo, axis=1, keepdims=True) - radius_col
    hi0 = jnp.max(vm_hi, axis=1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        s = jnp.sum(jnp.where(valid, jnp.maximum(v - mid, 0.0), 0.0), axis=1,
                    keepdims=True)
        too_low = s > radius_col
        return jnp.where(too_low, mid, lo), jnp.where(too_low, hi, mid)

    lo, hi = jax.lax.fori_loop(0, _N_BISECT, body, (lo0, hi0), unroll=1)
    tau = 0.5 * (lo + hi)
    out = jnp.maximum(v - tau, 0.0)
    ssum = jnp.sum(jnp.where(valid, out, 0.0), axis=1, keepdims=True)
    nsup = jnp.sum(jnp.where(valid & (out > 0), 1.0, 0.0), axis=1, keepdims=True)
    tau = tau + (ssum - radius_col) / jnp.maximum(nsup, 1.0)
    return jnp.where(valid, jnp.maximum(v - tau, 0.0), 0.0)


def _mega_kernel(A_ref, b_ref, x0_ref, widths_ref, radius_ref, t0_ref,
                 x_out_ref, f_out_ref, *, steps: int, B: int, w: int):
    A = A_ref[...]  # (m, B*w), columns in (B, w) raster order
    b = b_ref[...]  # (1, m)
    widths = widths_ref[...]  # (B, 1) int32
    radius = radius_ref[...]  # (B, 1)
    t0 = t0_ref[0, 0]

    def step(i, x):
        x_flat = x.reshape(1, B * w)
        r = (
            jax.lax.dot_general(x_flat, A, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            - b
        )  # (1, m)
        g = jax.lax.dot_general(r, A, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (1, B*w)
        gbw = g.reshape(B, w)
        xhat = _proj_bw(x - t0 * gbw, widths, radius)
        d = xhat - x
        Ad = jax.lax.dot_general(d.reshape(1, B * w), A, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (1, m)
        g_dot_d = jnp.sum(gbw * d)
        den = jnp.sum(Ad * Ad)
        t = jnp.clip(-g_dot_d / jnp.maximum(den, 1e-30), 0.0, 1.0)
        x_new = x + t * d
        r_new = r + t * Ad
        f = 0.5 * jnp.sum(r_new * r_new)
        f_out_ref[0, pl.ds(i, 1)] = f.reshape(1)
        return x_new

    x = jax.lax.fori_loop(0, steps, step, x0_ref[...], unroll=1)
    x_out_ref[...] = x


@functools.partial(jax.jit, static_argnames=("steps", "interpret"))
def pgd_chunk_fused(A_perm, b, x0_bw, widths, radius, t0, steps: int,
                    interpret: bool = False):
    """Run ``steps`` fused PGD/exact-LS iterations.

    A_perm: (m, B*w) with columns in (B, w) raster order (zero columns on
    padding slots); b: (m,); x0_bw: (B, w); widths: (B,) int32; radius:
    (B,); t0: scalar initial step (1/L).  Returns (x_bw, f_trace (steps,)).
    """
    m = A_perm.shape[0]
    B, w = x0_bw.shape
    x_out, f_out = pl.pallas_call(
        functools.partial(_mega_kernel, steps=steps, B=B, w=w),
        out_shape=(
            jax.ShapeDtypeStruct((B, w), x0_bw.dtype),
            jax.ShapeDtypeStruct((1, steps), x0_bw.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        A_perm,
        b.reshape(1, -1),
        x0_bw,
        widths.reshape(-1, 1).astype(jnp.int32),
        radius.reshape(-1, 1).astype(x0_bw.dtype),
        jnp.asarray(t0, x0_bw.dtype).reshape(1, 1),
    )
    return x_out, f_out[0]
