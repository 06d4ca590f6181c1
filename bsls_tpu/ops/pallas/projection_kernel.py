"""Fused Pallas TPU kernel: batched block-simplex projection.

TPU-native equivalent of the reference's C ``proj_multi_simplex_c``
(SURVEY.md §2c native ledger).  One kernel invocation per tile of TB blocks:

  * descending odd-even transposition sort network over the block width
    (w passes of masked lane-neighbour max/min — pure VPU; no XLA sort)
  * prefix sums via a (TB,w)x(w,w) upper-triangular matmul (MXU)
  * pivot search, threshold and clip — all in VMEM, one HBM round trip.

Padding slots enter as -inf and sink to the tail of the sort; dummy rows
(width 0) emit zeros.  Works for any w <= 128 (the benchmark configs use
w in 2..64).  `interpret=True` runs the same kernel on CPU for tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["proj_simplex_pallas"]

_NEG = -3.0e38


def _proj_tile_kernel(v_ref, width_ref, radius_ref, out_ref, *, w: int):
    v = v_ref[...]  # (TB, w)
    width = width_ref[...]  # (TB, 1) int32
    radius = radius_ref[...]  # (TB, 1) f32
    TB = v.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, w), 1)
    valid = lane < width
    u = jnp.where(valid, v, _NEG)

    # descending odd-even transposition sort (w passes)
    def sort_pass(p, u):
        s = p % 2
        nxt = pltpu.roll(u, w - 1, 1)  # u[:, j+1] (wraps; masked below)
        prv = pltpu.roll(u, 1, 1)  # u[:, j-1]
        par = (lane - s) % 2
        left = (par == 0) & (lane + 1 < w)
        right = (par == 1) & (lane >= 1)
        return jnp.where(left, jnp.maximum(u, nxt), jnp.where(right, jnp.minimum(u, prv), u))

    u = jax.lax.fori_loop(0, w, sort_pass, u, unroll=True)

    # prefix sums of the sorted values: css[:, k] = sum_{i<=k} u[:, i]
    u0 = jnp.where(u > 0.5 * _NEG, u, 0.0)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    ).astype(v.dtype)
    css = jax.lax.dot_general(
        u0, tri, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    kf = (lane + 1).astype(v.dtype)
    cond = (u0 * kf > css - radius) & valid
    rho = jnp.max(jnp.where(cond, lane, -1), axis=1, keepdims=True)
    css_rho = jnp.sum(jnp.where(lane == rho, css, 0.0), axis=1, keepdims=True)
    tau = (css_rho - radius) / jnp.maximum(rho + 1, 1).astype(v.dtype)
    out = jnp.maximum(v - tau, 0.0)
    out_ref[...] = jnp.where(valid, out, 0.0)


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
