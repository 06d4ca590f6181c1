"""Whole-chunk fused PGD megakernel for small dense instances.

The tiny-dense config is dispatch-bound, not compute-bound: the measured
125 µs/iteration against a 21.6 µs memory roofline (BASELINE.md audit) is
almost entirely per-op overhead — the instance is 4 MB and every operand
fits in VMEM.  This kernel runs ``steps`` complete projected-gradient
iterations (matvec, gradient, projection by bisection, exact quadratic
line search, incremental residual update) in ONE pallas_call, so the op
overhead is paid once per chunk instead of ~30 times per iteration.

Layout contract (Mosaic-safe, no reshapes): x is carried as the (B, w)
padded block rectangle the solver already uses, and A is passed as two
per-slot tensors

    A3  (w, m, B):  A3[j][:, b] = A[:, b*w + j]   (drives A @ x)
    At3 (w, B, m):  At3[j] = A3[j].T              (drives A^T r)

so the matvec is a static python loop of w (m,B)@(B,1) contractions and
the gradient w (B,m)@(m,1) contractions — Mosaic lowers plain 2-D
dot_generals, while the (B, w) <-> (1, B*w) flat reshape is an
"unsupported shape cast" on this stack (measured on-chip; recorded in
BASELINE.md round-2 lessons).  Column extraction x[:, j] uses a masked
lane reduction and g is assembled by masked broadcast-accumulate — both
from the known-good lowering envelope (CLAUDE.md Pallas notes).

Scope (by design, not limitation): single-RHS, dense A, one bucket,
VMEM-resident (2*m*B*w*4 bytes <= ~10 MB).  Larger instances keep the
chunked XLA path, which is already memory-bound there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pgd_chunk_fused", "split_slots", "mega_vmem_bytes"]

_BIG = 3.0e38
_N_BISECT = 40


def mega_vmem_bytes(m: int, B: int, w: int) -> int:
    """VMEM footprint of the two A copies (the dominant operands)."""
    return 2 * m * B * w * 4


@functools.partial(jax.jit, static_argnames=("B", "w"))
def split_slots(A_perm: jnp.ndarray, B: int, w: int):
    """Host/XLA-side prep: (m, B*w) raster-ordered dense A -> (A3, At3)."""
    m = A_perm.shape[0]
    A3 = A_perm.reshape(m, B, w).transpose(2, 0, 1)  # (w, m, B)
    At3 = A3.transpose(0, 2, 1)  # (w, B, m)
    return A3, At3


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


def _mega_kernel(A3_ref, At3_ref, b_ref, x0_ref, widths_ref, radius_ref,
                 t0_ref, x_out_ref, f_out_ref, *, steps: int, B: int, w: int):
    b = b_ref[...]  # (m, 1)
    widths = widths_ref[...]  # (B, 1) int32
    radius = radius_ref[...]  # (B, 1)
    t0 = t0_ref[0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, w), 1)

    def col(v, j):
        """v (B, w) -> column j as (B, 1), via masked lane reduction."""
        return jnp.sum(jnp.where(lane == j, v, 0.0), axis=1, keepdims=True)

    def matvec(v):
        """(B, w) -> A @ v as (m, 1): w static per-slot contractions."""
        acc = None
        for j in range(w):
            part = jax.lax.dot_general(
                A3_ref[j], col(v, j), (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        return acc

    def grad(r):
        """(m, 1) -> A^T r as (B, w): per-slot contraction, masked scatter."""
        g = jnp.zeros((B, w), jnp.float32)
        for j in range(w):
            gj = jax.lax.dot_general(
                At3_ref[j], r, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)  # (B, 1)
            g = g + jnp.where(lane == j, gj, 0.0)
        return g

    x0 = x0_ref[...]
    r0 = matvec(x0) - b

    def step(i, carry):
        x, r = carry
        g = grad(r)
        xhat = _proj_bw(x - t0 * g, widths, radius)
        d = xhat - x
        Ad = matvec(d)  # (m, 1)
        g_dot_d = jnp.sum(g * d)
        den = jnp.sum(Ad * Ad)
        t = jnp.clip(-g_dot_d / jnp.maximum(den, 1e-30), 0.0, 1.0)
        x_new = x + t * d
        r_new = r + t * Ad
        f = 0.5 * jnp.sum(r_new * r_new)
        f_out_ref[pl.ds(i, 1), :] = jnp.full((1, 1), f, jnp.float32)
        return x_new, r_new

    x, _ = jax.lax.fori_loop(0, steps, step, (x0, r0), unroll=1)
    x_out_ref[...] = x


@functools.partial(jax.jit, static_argnames=("steps", "interpret"))
def pgd_chunk_fused(A3, At3, b, x0_bw, widths, radius, t0, steps: int,
                    interpret: bool = False):
    """Run ``steps`` fused PGD/exact-LS iterations.

    A3: (w, m, B) and At3: (w, B, m) from ``split_slots`` (zero columns on
    padding slots); b: (m,); x0_bw: (B, w); widths: (B,) int32; radius:
    (B,); t0: scalar trial step (1/L).  Returns (x_bw, f_trace (steps,)).
    """
    w, m, B = A3.shape
    x_out, f_out = pl.pallas_call(
        functools.partial(_mega_kernel, steps=steps, B=B, w=w),
        out_shape=(
            jax.ShapeDtypeStruct((B, w), x0_bw.dtype),
            jax.ShapeDtypeStruct((steps, 1), x0_bw.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
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
        A3,
        At3,
        b.reshape(-1, 1),
        x0_bw,
        widths.reshape(-1, 1).astype(jnp.int32),
        radius.reshape(-1, 1).astype(x0_bw.dtype),
        jnp.asarray(t0, x0_bw.dtype).reshape(1, 1),
    )
    return x_out, f_out[:, 0]
