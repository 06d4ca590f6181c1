"""Accelerated projected gradient (monotone FISTA with restart).

Nesterov momentum over the projected-gradient map, with a monotone
safeguard: a candidate that increases f is rejected and the momentum is
restarted from the current iterate.  Residuals at both the iterate x and
the extrapolated point y are carried incrementally (r is affine in x), so
one iteration costs the same two matvec-equivalents as plain PGD while
converging O(1/k^2) — this is the solver that beats the reference's plain
PGD on ill-conditioned instances.  (New capability, [ABSENT] in the
reference per SURVEY.md; the float64 CPU oracle uses the same scheme.)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import layout as L, projection, quadratic as Q
from .base import SolveOptions, fw_gap

__all__ = ["APGDState", "init", "step", "refresh"]


class APGDState(NamedTuple):
    xp: tuple  # current iterate x_k
    yp: tuple  # extrapolated point y_k
    r: jnp.ndarray  # residual at x_k
    ry: jnp.ndarray  # residual at y_k
    f: jnp.ndarray  # f(x_k)
    gap: jnp.ndarray
    k: jnp.ndarray
    t_mom: jnp.ndarray  # momentum parameter


# sharding protocol (parallel.sharding.state_specs): field -> kind
APGDState.SHARD_KINDS = {
    "xp": "x", "yp": "x", "r": "r", "ry": "r",
    "f": "scalar", "gap": "scalar", "k": "scalar", "t_mom": "scalar",
}


def init(dp: L.DeviceProblem, L_est, opts: SolveOptions, xp0=None) -> APGDState:
    # APGD steps with the fixed 1/L (or opts.step_size) FISTA step; the PGD
    # line-search modes would silently not apply, so reject them up front
    if opts.line_search in ("bb", "pava"):
        raise ValueError(
            f"method 'apgd' does not support line_search={opts.line_search!r}; "
            "use 'exact'/'fixed' (both mean the FISTA 1/L step) or method 'pgd'"
        )
    if opts.space != "x":
        raise ValueError("method 'apgd' supports space='x' only")
    xp = xp0 if xp0 is not None else L.feasible_init(dp)
    r = Q.residual(dp, L.padded_to_flat(dp, xp))
    f = Q.objective_from_residual(dp, r)
    return APGDState(
        xp=xp, yp=xp, r=r, ry=r, f=f,
        gap=jnp.asarray(jnp.inf, f.dtype),
        k=jnp.asarray(0, jnp.int32),
        t_mom=jnp.asarray(1.0, f.dtype),
    )


def refresh(dp, st: APGDState, L_est, opts: SolveOptions) -> APGDState:
    r = Q.residual(dp, L.padded_to_flat(dp, st.xp))
    ry = Q.residual(dp, L.padded_to_flat(dp, st.yp))
    return st._replace(r=r, ry=ry, f=Q.objective_from_residual(dp, r))


def step(dp, st: APGDState, L_est, opts: SolveOptions) -> APGDState:
    dt = st.r.dtype
    g_flat = Q.grad_flat(dp, st.ry)  # gradient at y
    gp = L.flat_to_padded(dp, g_flat)
    y_flat = L.padded_to_flat(dp, st.yp)
    gap = fw_gap(dp, g_flat, y_flat, gp)

    step_t = (
        jnp.asarray(opts.step_size, dt) if opts.step_size > 0 else jnp.asarray(1.0, dt) / L_est
    )
    cand = tuple(y - step_t * g for y, g in zip(st.yp, gp))
    xhat = projection.proj_blocks(cand, dp.buckets)
    d_flat = L.padded_to_flat(dp, tuple(xh - y for xh, y in zip(xhat, st.yp)))
    r_cand = st.ry + L.matvec_ps(dp, d_flat)
    f_cand = Q.objective_from_residual(dp, r_cand)

    # monotone safeguard: keep the candidate only if it does not increase f
    accept = f_cand <= st.f
    xp_new = tuple(jnp.where(accept, xh, x) for xh, x in zip(xhat, st.xp))
    r_new = jnp.where(accept, r_cand, st.r)
    f_new = jnp.where(accept, f_cand, st.f)

    t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * st.t_mom * st.t_mom))
    beta = jnp.where(accept, (st.t_mom - 1.0) / t_next, 0.0)
    t_next = jnp.where(accept, t_next, 1.0)  # restart momentum on rejection

    yp_new = tuple(x + beta * (x - xo) for x, xo in zip(xp_new, st.xp))
    ry_new = r_new + beta * (r_new - st.r)  # r is affine in x

    return APGDState(
        xp=xp_new, yp=yp_new, r=r_new, ry=ry_new, f=f_new, gap=gap,
        k=st.k + 1, t_mom=t_next,
    )
