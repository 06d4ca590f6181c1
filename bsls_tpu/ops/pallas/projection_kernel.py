"""Fused Pallas TPU kernel: batched block-simplex projection.

TPU-native equivalent of the reference's C ``proj_multi_simplex_c``
(SURVEY.md §2c native ledger).  Instead of the reference's sort-based
pivot search — sorting networks mis-lower on this image's Mosaic when the
logical lane width < 128 (pltpu.roll wraps across physical lane padding) —
the kernel solves for the threshold tau directly by **bisection** on the
monotone function s(t) = sum_i max(v_i - t, 0):

    s is continuous, strictly decreasing where positive; tau* solves
    s(tau*) = radius.  40 halvings shrink the bracket below fp32 eps.

Everything is elementwise + masked lane reductions on a (TB, w) tile in
VMEM — one HBM round trip, no sort, no gather, no roll.  The sort-based
XLA implementation (ops.projection) remains the cross-check; both match
the arXiv:1101.6081 algorithm's output to fp32 precision.
`interpret=True` runs the same kernel on CPU for tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["proj_simplex_pallas", "proj_simplex_pallas_t"]

_BIG = 3.0e38
_N_BISECT = 40


def _proj_tile_kernel(v_ref, width_ref, radius_ref, out_ref, *, w: int):
    v = v_ref[...]  # (TB, w)
    width = width_ref[...]  # (TB, 1) int32
    radius = radius_ref[...]  # (TB, 1) f32
    TB = v.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, w), 1)
    valid = lane < width
    vm_lo = jnp.where(valid, v, _BIG)
    vm_hi = jnp.where(valid, v, -_BIG)
    vmin = jnp.min(vm_lo, axis=1, keepdims=True)  # (TB, 1)
    vmax = jnp.max(vm_hi, axis=1, keepdims=True)

    # bracket: s(vmin - radius) >= radius, s(vmax) = 0 <= radius
    lo0 = vmin - radius
    hi0 = vmax

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        s = jnp.sum(jnp.where(valid, jnp.maximum(v - mid, 0.0), 0.0), axis=1, keepdims=True)
        too_low = s > radius  # threshold too small -> move lo up
        lo = jnp.where(too_low, mid, lo)
        hi = jnp.where(too_low, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _N_BISECT, body, (lo0, hi0), unroll=1)
    tau = 0.5 * (lo + hi)
    out = jnp.maximum(v - tau, 0.0)
    # Newton polish: once the support set is pinned down (bracket below the
    # inter-value gap), the exact threshold is tau + (s(tau)-radius)/|support|
    ssum = jnp.sum(jnp.where(valid, out, 0.0), axis=1, keepdims=True)
    nsup = jnp.sum(jnp.where(valid & (out > 0), 1.0, 0.0), axis=1, keepdims=True)
    tau = tau + (ssum - radius) / jnp.maximum(nsup, 1.0)
    out = jnp.maximum(v - tau, 0.0)
    out_ref[...] = jnp.where(valid, out, 0.0)


def _proj_tile_kernel_t(v_ref, width_ref, radius_ref, out_ref, *, w: int):
    """Transposed tile: (w, TN) — blocks on LANES (full VPU width), block
    width w on sublanes.  Same bisection+Newton-polish algorithm as the
    row-major kernel; reductions run over the sublane axis."""
    v = v_ref[...]  # (w, TN)
    width = width_ref[...]  # (1, TN) int32
    radius = radius_ref[...]  # (1, TN) f32
    TN = v.shape[1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (w, TN), 0)
    valid = sub < width
    vm_lo = jnp.where(valid, v, _BIG)
    vm_hi = jnp.where(valid, v, -_BIG)
    vmin = jnp.min(vm_lo, axis=0, keepdims=True)  # (1, TN)
    vmax = jnp.max(vm_hi, axis=0, keepdims=True)

    lo0 = vmin - radius
    hi0 = vmax

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        s = jnp.sum(jnp.where(valid, jnp.maximum(v - mid, 0.0), 0.0), axis=0,
                    keepdims=True)
        too_low = s > radius
        lo = jnp.where(too_low, mid, lo)
        hi = jnp.where(too_low, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _N_BISECT, body, (lo0, hi0), unroll=1)
    tau = 0.5 * (lo + hi)
    out = jnp.maximum(v - tau, 0.0)
    ssum = jnp.sum(jnp.where(valid, out, 0.0), axis=0, keepdims=True)
    nsup = jnp.sum(jnp.where(valid & (out > 0), 1.0, 0.0), axis=0, keepdims=True)
    tau = tau + (ssum - radius) / jnp.maximum(nsup, 1.0)
    out = jnp.maximum(v - tau, 0.0)
    out_ref[...] = jnp.where(valid, out, 0.0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def proj_simplex_pallas_tw(
    vT: jnp.ndarray,
    widths_row: jnp.ndarray,
    radius_row: jnp.ndarray,
    tile: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Wide-layout lane-major projection: vT (w, N), widths/radius (1, N)
    -> (w, N).  The wide layout is load-bearing, not cosmetic: a narrow
    (N, w) pallas operand forces an (8,128)-tiled copy padded 128/w-fold
    — which both wastes memory directly AND propagates tiled layouts into
    the surrounding solver program (measured: the 1M-block config OOM'd
    by 8+ GB of 16-21x padded copies).  (w, N) is exactly one sublane
    group per slot index: zero padding."""
    w, N = vT.shape
    tile = min(tile, max(128, N))
    pad = (-N) % tile
    if pad:
        vT = jnp.pad(vT, ((0, 0), (0, pad)))
        widths_row = jnp.pad(widths_row, ((0, 0), (0, pad)))
        radius_row = jnp.pad(radius_row, ((0, 0), (0, pad)))
    Np = N + pad
    out = pl.pallas_call(
        functools.partial(_proj_tile_kernel_t, w=w),
        out_shape=jax.ShapeDtypeStruct((w, Np), vT.dtype),
        grid=(Np // tile,),
        in_specs=[
            pl.BlockSpec((w, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((w, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vT, widths_row.astype(jnp.int32), radius_row.astype(vT.dtype))
    return out[:, :N]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def proj_simplex_pallas_t(
    v: jnp.ndarray,
    widths: jnp.ndarray,
    radius: jnp.ndarray,
    tile: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Lane-major batched projection: rows of v (B, w) projected onto their
    radius-scaled simplices, with the BLOCK axis mapped to VPU lanes (the
    row-major kernel wastes (128-w)/128 of each vector op for the small
    block widths this problem has)."""
    B, w = v.shape
    out = proj_simplex_pallas_tw(
        v.T, widths.reshape(1, -1), radius.reshape(1, -1), tile=tile,
        interpret=interpret,
    )
    return out.T


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def proj_simplex_pallas(
    v: jnp.ndarray,
    widths: jnp.ndarray,
    radius: jnp.ndarray,
    tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Project rows of v (B, w) onto radius-scaled simplices of their first
    ``widths`` slots.  widths: (B,) int32; radius: (B,) float.
    """
    B, w = v.shape
    tile = min(tile, max(8, B))
    pad = (-B) % tile
    if pad:
        v = jnp.pad(v, ((0, pad), (0, 0)))
        widths = jnp.pad(widths, (0, pad))
        radius = jnp.pad(radius, (0, pad))
    Bp = B + pad
    grid = (Bp // tile,)
    out = pl.pallas_call(
        functools.partial(_proj_tile_kernel, w=w),
        out_shape=jax.ShapeDtypeStruct((Bp, w), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(v, widths.reshape(-1, 1).astype(jnp.int32), radius.reshape(-1, 1).astype(v.dtype))
    return out[:B]
