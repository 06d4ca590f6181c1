"""Entropic mirror descent / exponentiated gradient solver.

The EG update x <- x * exp(-t g), renormalised per block, needs no
projection kernel at all (SURVEY.md §2 #10).  Modes:
  exact (default) — EG proposal, then closed-form quadratic step along the
                    segment d = x_eg - x (monotone descent)
  fixed           — classic EG with constant step (opts.step_size or 1/L)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import layout as L, quadratic as Q
from ..ops.simplex import eg_update
from .base import SolveOptions, fw_gap

__all__ = ["EGState", "init", "step", "refresh"]


class EGState(NamedTuple):
    xp: tuple
    r: jnp.ndarray
    f: jnp.ndarray
    gap: jnp.ndarray
    k: jnp.ndarray


# sharding protocol (parallel.sharding.state_specs): field -> kind
EGState.SHARD_KINDS = {
    "xp": "x", "r": "r", "f": "scalar", "gap": "scalar", "k": "scalar",
}


def init(dp: L.DeviceProblem, L_est, opts: SolveOptions, xp0=None) -> EGState:
    xp = xp0 if xp0 is not None else L.feasible_init(dp)
    r = Q.residual(dp, L.padded_to_flat(dp, xp))
    return EGState(
        xp=xp, r=r, f=Q.objective_from_residual(dp, r),
        gap=jnp.asarray(jnp.inf, r.dtype), k=jnp.asarray(0, jnp.int32),
    )


def refresh(dp, st: EGState, L_est, opts: SolveOptions) -> EGState:
    r = Q.residual(dp, L.padded_to_flat(dp, st.xp))
    return st._replace(r=r, f=Q.objective_from_residual(dp, r))


def step(dp, st: EGState, L_est, opts: SolveOptions) -> EGState:
    x_flat = L.padded_to_flat(dp, st.xp)
    g_flat = Q.grad_flat(dp, st.r)
    gp = L.flat_to_padded(dp, g_flat)
    gap = fw_gap(dp, g_flat, x_flat, gp)

    if opts.step_size > 0:
        t0 = jnp.asarray(opts.step_size, x_flat.dtype)
    else:
        t0 = jnp.asarray(1.0, x_flat.dtype) / L_est
    x_eg = eg_update(st.xp, gp, t0, dp.buckets)
    dxp = tuple(xe - x for xe, x in zip(x_eg, st.xp))
    d_flat = L.padded_to_flat(dp, dxp)
    Ad = L.matvec_ps(dp, d_flat)
    if opts.line_search == "fixed":
        t = jnp.asarray(1.0, x_flat.dtype)
    else:
        t = Q.exact_step(dp, L.xdot(dp, g_flat, d_flat), Ad, 0.0, 1.0)

    xp_new = tuple(x + t * d for x, d in zip(st.xp, dxp))
    r_new = st.r + t * Ad
    return EGState(
        xp=xp_new, r=r_new, f=Q.objective_from_residual(dp, r_new), gap=gap, k=st.k + 1
    )
