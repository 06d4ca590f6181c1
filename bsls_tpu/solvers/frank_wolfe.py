"""Frank-Wolfe (conditional gradient) solver, plus the pairwise/away variant.

LMO on a product of simplices is the per-block vertex argmin; the duality
gap g.(x - s) falls out for free and is the convergence certificate
(SURVEY.md §2 #11).  Step via the closed-form quadratic line search
(default) or the classic 2/(k+2) schedule (line_search="fixed").

``method="afw"`` (aliases "pairwise", "pairwise_fw") runs **pairwise
Frank-Wolfe**: weight moves from the per-block away vertex (worst support
coordinate) to the FW vertex, which restores linear convergence on
polytopes (Lacoste-Julien & Jaggi, arXiv:1511.05932) where plain FW
zig-zags sublinearly.  On a simplex the active set is just supp(x), so the
away vertex costs one masked argmax per block — no vertex bookkeeping, no
dynamic shapes, vmappable (see ops.simplex.pairwise_direction_padded for
the per-block pre-scaling that keeps one global line search feasible).
Plain-FW steps are mixed in every ``_FW_MIX`` iterations to retain FW's
global-progress guarantee when the support is badly initialised (e.g. the
uniform feasible start puts weight everywhere; pairwise alone only moves
one coordinate pair per block per step).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import layout as L, quadratic as Q
from ..ops.simplex import fw_vertex, pairwise_direction
from .base import SolveOptions

__all__ = ["FWState", "init", "step", "refresh"]

_FW_MIX = 8  # in afw mode, take a plain-FW step every _FW_MIX iterations


class FWState(NamedTuple):
    xp: tuple
    r: jnp.ndarray
    f: jnp.ndarray
    gap: jnp.ndarray
    k: jnp.ndarray


# sharding protocol (parallel.sharding.state_specs): field -> kind
FWState.SHARD_KINDS = {
    "xp": "x", "r": "r", "f": "scalar", "gap": "scalar", "k": "scalar",
}


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
    pairwise = opts.method in ("afw", "pairwise", "pairwise_fw")
    g_flat = Q.grad_flat(dp, st.r)
    gp = L.flat_to_padded(dp, g_flat)
    sp = fw_vertex(gp, dp.buckets)
    d_fw = tuple(s - x for s, x in zip(sp, st.xp))
    d_fw_flat = L.padded_to_flat(dp, d_fw)
    g_dot_dfw = L.xdot(dp, g_flat, d_fw_flat)
    # exact FW duality gap: g.(x - s) = -g.d — valid certificate either way
    gap = -g_dot_dfw

    if pairwise:
        qp = Q.diag_quad(dp)  # cheap (one squared reduction); CSE'd by XLA
        d_pw = pairwise_direction(st.xp, gp, dp.buckets, qp)
        # periodic plain-FW step keeps global progress when the away steps
        # alone would shuffle weight pair-by-pair within blocks
        use_fw = (st.k % _FW_MIX) == (_FW_MIX - 1)
        dxp = tuple(jnp.where(use_fw, df, dp_) for df, dp_ in zip(d_fw, d_pw))
        d_flat = L.padded_to_flat(dp, dxp)
        g_dot_d = jnp.where(use_fw, g_dot_dfw, L.xdot(dp, g_flat, d_flat))
    else:
        dxp, d_flat, g_dot_d = d_fw, d_fw_flat, g_dot_dfw

    Ad = L.matvec_ps(dp, d_flat)
    if opts.line_search == "fixed" and not pairwise:
        t = 2.0 / (st.k.astype(g_flat.dtype) + 2.0)
    else:
        t = Q.exact_step(dp, g_dot_d, Ad, 0.0, 1.0)
    xp_new = tuple(x + t * d for x, d in zip(st.xp, dxp))
    r_new = st.r + t * Ad
    return FWState(
        xp=xp_new, r=r_new, f=Q.objective_from_residual(dp, r_new), gap=gap, k=st.k + 1
    )
