"""Fused Pallas TPU kernel: batched bounded isotonic regression (PAVA).

TPU-native equivalent of the reference's C ``isotonic_regression_multi_c``
(SURVEY.md §2c native ledger; §7 hard part 1).  Instead of the inherently
sequential pool-adjacent-violators chain, each block evaluates the exact
minimax characterisation

    yhat_i = min_{k>=i} max_{j<=i} mean(y[j..k])

with a w-step loop of (TB, w) vector ops: prefix sums via a masked-lane
accumulation loop (tiny (w,w) matmuls and the cumsum primitive mis-lower
on this image's Mosaic — see the kernel comment), then per-step running
max over segment means and a masked lane-min reduction.  O(w^2) VPU work
per block, no (B, w, w) intermediate ever touches HBM (unlike the XLA
fallback in ops.isotonic).  Uniform [0, radius] bounds commute with the
monotone projection and are applied as a final clip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pava_pallas", "pava_pallas_t"]

_BIG = 3.0e38


def _pava_tile_kernel(y_ref, width_ref, radius_ref, out_ref, *, w: int):
    # Uses only constructs validated on this image's Mosaic (same shapes and
    # patterns as the on-chip-verified projection kernel): elementwise ops,
    # masked lane reductions, and fori_loop with unroll=1.  No matmul (tiny
    # (w,w) dot_generals mis-lower), no cumsum (unimplemented primitive),
    # no roll (wraps across physical lane padding).
    y = y_ref[...]  # (TB, w)
    width = width_ref[...]  # (TB, 1) int32
    radius = radius_ref[...]  # (TB, 1) f32
    TB = y.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, w), 1)
    valid = lane < width
    y0 = jnp.where(valid, y, 0.0)

    # inclusive prefix sums css[:, k] = sum_{t<=k} y0[:, t], via a w-step loop
    def pbody(i, css):
        E = jnp.sum(jnp.where(lane == i, y0, 0.0), axis=1, keepdims=True)
        return css + jnp.where(lane >= i, E, 0.0)

    css = jax.lax.fori_loop(0, w, pbody, jnp.zeros((TB, w), y.dtype), unroll=1)

    def body(i, carry):
        runmax, out = carry
        # E = sum_{t<i} y_t  (exclusive prefix at i)
        E = jnp.sum(jnp.where(lane == i, css - y0, 0.0), axis=1, keepdims=True)
        denom = jnp.maximum(lane - i + 1, 1).astype(y.dtype)
        Mi = (css - E) / denom  # mean(y[i..k]) for k >= i
        Mi = jnp.where(lane >= i, Mi, -_BIG)
        runmax = jnp.maximum(runmax, Mi)  # A[i, k] = max_{j<=i} mean(j..k)
        cand = jnp.where((lane >= i) & valid, runmax, _BIG)
        mn = jnp.min(cand, axis=1, keepdims=True)
        out = jnp.where(lane == i, mn, out)
        return runmax, out

    runmax0 = jnp.full((TB, w), -_BIG, y.dtype)
    out0 = jnp.zeros((TB, w), y.dtype)
    _, out = jax.lax.fori_loop(0, w, body, (runmax0, out0), unroll=1)
    out = jnp.clip(out, 0.0, radius)
    out_ref[...] = jnp.where(valid, out, 0.0)


def _pava_tile_kernel_t(y_ref, width_ref, radius_ref, out_ref, *, w: int):
    """Lane-major tile: (w, TN) — blocks on LANES (full VPU width), slot
    index on sublanes.  Same minimax evaluation as the row-major kernel
    with every reduction flipped to the sublane axis."""
    y = y_ref[...]  # (w, TN)
    width = width_ref[...]  # (1, TN) int32
    radius = radius_ref[...]  # (1, TN) f32
    TN = y.shape[1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (w, TN), 0)
    valid = sub < width
    y0 = jnp.where(valid, y, 0.0)

    # inclusive prefix sums css[k, :] = sum_{t<=k} y0[t, :], via a w-step loop
    def pbody(i, css):
        E = jnp.sum(jnp.where(sub == i, y0, 0.0), axis=0, keepdims=True)
        return css + jnp.where(sub >= i, E, 0.0)

    css = jax.lax.fori_loop(0, w, pbody, jnp.zeros((w, TN), y.dtype), unroll=1)

    def body(i, carry):
        runmax, out = carry
        # E = sum_{t<i} y_t  (exclusive prefix at i)
        E = jnp.sum(jnp.where(sub == i, css - y0, 0.0), axis=0, keepdims=True)
        denom = jnp.maximum(sub - i + 1, 1).astype(y.dtype)
        Mi = (css - E) / denom  # mean(y[i..k]) for k >= i
        Mi = jnp.where(sub >= i, Mi, -_BIG)
        runmax = jnp.maximum(runmax, Mi)  # A[i, k] = max_{j<=i} mean(j..k)
        cand = jnp.where((sub >= i) & valid, runmax, _BIG)
        mn = jnp.min(cand, axis=0, keepdims=True)
        out = jnp.where(sub == i, mn, out)
        return runmax, out

    runmax0 = jnp.full((w, TN), -_BIG, y.dtype)
    out0 = jnp.zeros((w, TN), y.dtype)
    _, out = jax.lax.fori_loop(0, w, body, (runmax0, out0), unroll=1)
    out = jnp.clip(out, 0.0, radius)
    out_ref[...] = jnp.where(valid, out, 0.0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pava_pallas_tw(
    yT: jnp.ndarray,
    widths_row: jnp.ndarray,
    radius_row: jnp.ndarray,
    tile: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Wide-layout lane-major bounded PAVA: yT (w, N), widths/radius (1, N)
    -> (w, N).  See proj_simplex_pallas_tw for why the wide layout is
    load-bearing (narrow pallas operands force 128/w-padded tiled copies
    that poison the surrounding program's layouts)."""
    w, N = yT.shape
    tile = min(tile, max(128, N))
    pad = (-N) % tile
    if pad:
        yT = jnp.pad(yT, ((0, 0), (0, pad)))
        widths_row = jnp.pad(widths_row, ((0, 0), (0, pad)))
        radius_row = jnp.pad(radius_row, ((0, 0), (0, pad)))
    Np = N + pad
    out = pl.pallas_call(
        functools.partial(_pava_tile_kernel_t, w=w),
        out_shape=jax.ShapeDtypeStruct((w, Np), yT.dtype),
        grid=(Np // tile,),
        in_specs=[
            pl.BlockSpec((w, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((w, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(yT, widths_row.astype(jnp.int32), radius_row.astype(yT.dtype))
    return out[:, :N]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pava_pallas_t(
    y: jnp.ndarray,
    widths: jnp.ndarray,
    radius: jnp.ndarray,
    tile: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Lane-major batched bounded PAVA (blocks on VPU lanes)."""
    out = pava_pallas_tw(
        y.T, widths.reshape(1, -1), radius.reshape(1, -1), tile=tile,
        interpret=interpret,
    )
    return out.T


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pava_pallas(
    y: jnp.ndarray,
    widths: jnp.ndarray,
    radius: jnp.ndarray,
    tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """[0, radius]-bounded nondecreasing isotonic fit of each row's first
    ``widths`` slots.  y: (B, w); widths: (B,) int32; radius: (B,) float."""
    B, w = y.shape
    tile = min(tile, max(8, B))
    pad = (-B) % tile
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0)))
        widths = jnp.pad(widths, (0, pad))
        radius = jnp.pad(radius, (0, pad))
    Bp = B + pad
    out = pl.pallas_call(
        functools.partial(_pava_tile_kernel, w=w),
        out_shape=jax.ShapeDtypeStruct((Bp, w), y.dtype),
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y, widths.reshape(-1, 1).astype(jnp.int32), radius.reshape(-1, 1).astype(y.dtype))
    return out[:B]
