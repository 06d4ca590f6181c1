"""Pallas kernels for the banded-split layout (ops/banded.py).

XLA lowers the banded contractions — a batch of Mp tiny GEMVs
(1,C)@(C,W) — to per-batch-element loops with fixed overhead each, which
measured ~300x slower than the stream bound on this stack (and compiled
pathologically).  These kernels stream the band tiles through VMEM with a
sequential grid over the Mp pages and do the contraction as a
broadcast-multiply + reduction (S=1) or an MXU dot (S>1), which is the
shape the hardware actually wants:

    Z[g]  = X[g] @ band[g]        (S, C) @ (C, W) -> (S, W)   [matvec]
    G[g]  = R[g] @ band[g]^T      (S, W) @ (W, C) -> (S, C)   [rmatvec]

The cheap overlap-add / window-slice glue stays in XLA (static shifted
adds — see ops/banded.py).  Grid steps are pipelined by the Pallas
emitter (band tile DMA overlaps compute).  Only validated-on-this-Mosaic
constructs are used: elementwise ops, axis reductions, jnp.dot with
preferred_element_type.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["band_zmv_pallas", "band_grmv_pallas"]


def _zmv_kernel(x_ref, band_ref, out_ref, *, S: int):
    band = band_ref[0]  # (C, W)
    x = x_ref[0]  # (S, C)
    if S == 1:
        out_ref[0] = jnp.sum(band * x.reshape(-1, 1), axis=0, keepdims=True)
    else:
        # HIGHEST: default bf16 MXU passes cap fp32 dots at ~2e-3 relative
        # error, stalling 1e-6 convergence (BASELINE.md precision law)
        out_ref[0] = jnp.dot(x, band, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)


def _grmv_kernel(r_ref, band_ref, out_ref, *, S: int):
    band = band_ref[0]  # (C, W)
    r = r_ref[0]  # (S, W)
    if S == 1:
        out_ref[0] = jnp.sum(band * r, axis=1, keepdims=True).reshape(1, -1)
    else:
        out_ref[0] = jnp.dot(r, band.T, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("interpret",))
def band_zmv_pallas(band: jnp.ndarray, xg: jnp.ndarray, interpret: bool = False):
    """Z = batched (S,C)@(C,W) over the page axis.

    band: (Mp, C, W); xg: (S, Mp, C) -> (S, Mp, W).  S is static shape.
    """
    S, Mp, C = xg.shape
    W = band.shape[2]
    xt = jnp.swapaxes(xg, 0, 1)  # (Mp, S, C)
    out = pl.pallas_call(
        functools.partial(_zmv_kernel, S=S),
        out_shape=jax.ShapeDtypeStruct((Mp, S, W), band.dtype),
        grid=(Mp,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, W), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, W), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xt, band)
    return jnp.swapaxes(out, 0, 1)  # (S, Mp, W)


@functools.partial(jax.jit, static_argnames=("interpret",))
def band_grmv_pallas(band: jnp.ndarray, rw: jnp.ndarray, interpret: bool = False):
    """G = batched (S,W)@(W,C) over the page axis.

    band: (Mp, C, W); rw: (S, Mp, W) -> (S, Mp, C).
    """
    S, Mp, W = rw.shape
    C = band.shape[1]
    rt = jnp.swapaxes(rw, 0, 1)  # (Mp, S, W)
    out = pl.pallas_call(
        functools.partial(_grmv_kernel, S=S),
        out_shape=jax.ShapeDtypeStruct((Mp, S, C), band.dtype),
        grid=(Mp,),
        in_specs=[
            pl.BlockSpec((1, S, W), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, W), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rt, band)
    return jnp.swapaxes(out, 0, 1)  # (S, Mp, C)
