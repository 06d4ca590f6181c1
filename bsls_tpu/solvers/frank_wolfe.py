"""Frank-Wolfe (conditional gradient) solver.

LMO on a product of simplices is the per-block vertex argmin; the duality
gap g.(x - s) falls out for free and is the convergence certificate
(SURVEY.md §2 #11).  Step via the closed-form quadratic line search
(default) or the classic 2/(k+2) schedule (line_search="fixed").
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import layout as L, quadratic as Q
from ..ops.simplex import fw_vertex
from .base import SolveOptions

__all__ = ["FWState", "init", "step", "refresh"]


class FWState(NamedTuple):
    xp: tuple
    r: jnp.ndarray
    f: jnp.ndarray
    gap: jnp.ndarray
    k: jnp.ndarray


def init(dp: L.DeviceProblem, L_est, opts: SolveOptions, xp0=None) -> FWState:
    xp = xp0 if xp0 is not None else L.feasible_init(dp)
    r = Q.residual(dp, L.padded_to_flat(dp, xp))
    return FWState(
        xp=xp, r=r, f=Q.objective_from_residual(dp, r),
        gap=jnp.asarray(jnp.inf, r.dtype), k=jnp.asarray(0, jnp.int32),
    )


def refresh(dp, st: FWState, L_est, opts: SolveOptions) -> FWState:
    r = Q.residual(dp, L.padded_to_flat(dp, st.xp))
    return st._replace(r=r, f=Q.objective_from_residual(dp, r))


def step(dp, st: FWState, L_est, opts: SolveOptions) -> FWState:
    g_flat = Q.grad_flat(dp, st.r)
    gp = L.flat_to_padded(dp, g_flat)
    sp = fw_vertex(gp, dp.buckets)
    dxp = tuple(s - x for s, x in zip(sp, st.xp))
    d_flat = L.padded_to_flat(dp, dxp)
    g_dot_d = L.xdot(dp, g_flat, d_flat)
    # exact FW duality gap: g.(x - s) = -g.d
    gap = -g_dot_d
    Ad = L.matvec_ps(dp, d_flat)
    if opts.line_search == "fixed":
        t = 2.0 / (st.k.astype(g_flat.dtype) + 2.0)
    else:
        t = Q.exact_step(dp, g_dot_d, Ad, 0.0, 1.0)
    xp_new = tuple(x + t * d for x, d in zip(st.xp, dxp))
    r_new = st.r + t * Ad
    return FWState(
        xp=xp_new, r=r_new, f=Q.objective_from_residual(dp, r_new), gap=gap, k=st.k + 1
    )
