"""Projected L-BFGS solver (x-space sort-projection or z-space PAVA).

The quasi-Newton family the reference codebase pairs with its z-space
reparametrisation (SURVEY.md §1a solver table: "L-BFGS-in-z-space"
[UNVERIFIED — reference mount empty]; the TPU build implements both the
x-space and z-space variants).  Scheme per iteration:

  1. limited-memory two-loop recursion builds q ~= H g from the last M
     curvature pairs (s, y) (Nocedal & Wright, Numerical Optimization,
     ch. 7.2) with gamma = (s.y)/(y.y) scaling of H0;
  2. candidate = proj(x - q)  (sort-projection in x-space, bounded
     isotonic/PAVA in z-space) — the projection-arc direction
     d = candidate - x is tested for descent (g.d < 0) and otherwise
     replaced by the plain projected-gradient direction at step 1/L;
  3. exact quadratic line search along d (closed form, collective-aware
     inner products) — monotone descent by construction.

TPU-first shape choices: the pair history lives in two static (M, n_pf)
SHIFT buffers (newest pair at index M-1, advanced with a static
slice+concat each iteration), so the whole step stays a fixed-shape XLA
program under jit/scan/vmap/shard_map with NO scatters — a traced-index
ring buffer lowers to a scatter under scenario vmap, which serialises on
TPU (measured 2.3× step-cost inflation at S=32).  The two-loop is
unrolled over the static memory depth M (``SolveOptions.lbfgs_mem``) with
masked contributions for empty/rejected slots (rho = 0), and every
history access is a static index.  All dots go through ``layout.xdot``
so the mesh-sharded path psums them exactly like the first-order solvers.

On a convex quadratic the curvature condition s.y > 0 holds wherever
s != 0 (y = A^T A s), so pairs are only rejected at numerical noise
level; a rejected pair still shifts a zeroed (rho = 0) slot into the
buffers and both loops skip it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import isotonic, layout as L, projection, quadratic as Q, ztransform as Z
from .base import SolveOptions, fw_gap
from .pgd import _dz_forward

__all__ = ["LBFGSState", "init", "step", "refresh"]


class LBFGSState(NamedTuple):
    xp: tuple
    r: jnp.ndarray
    f: jnp.ndarray
    gap: jnp.ndarray
    k: jnp.ndarray
    u_prev: jnp.ndarray  # previous iterate, flat (x- or z-space)
    g_prev: jnp.ndarray  # previous gradient, flat (same space)
    s_hist: jnp.ndarray  # (M, n_pf) shift buffer of iterate differences (newest last)
    y_hist: jnp.ndarray  # (M, n_pf) shift buffer of gradient differences
    rho_hist: jnp.ndarray  # (M,) 1/(s.y), 0 marks an empty/rejected slot
    gamma: jnp.ndarray  # H0 scaling (s.y)/(y.y) of the newest pair


# sharding protocol (parallel.sharding.state_specs): field -> kind
LBFGSState.SHARD_KINDS = {
    "xp": "x", "r": "r", "f": "scalar", "gap": "scalar", "k": "scalar",
    "u_prev": "xflat", "g_prev": "xflat",
    "s_hist": "xflat_hist", "y_hist": "xflat_hist",
    "rho_hist": "hist", "gamma": "scalar",
}


def _two_loop(dp, g_flat, st: LBFGSState, M: int):
    """q ~= H g from the shift buffers; unrolled over the static depth M,
    newest pair (index M-1) first.  Slots with rho == 0 contribute
    nothing.  All indices are static — no gathers, no scatters."""
    q = g_flat
    stages = []
    for t in range(M):
        j = M - 1 - t
        s, y, rho = st.s_hist[j], st.y_hist[j], st.rho_hist[j]
        alpha = jnp.where(rho > 0, rho * L.xdot(dp, s, q), 0.0)
        q = q - alpha * y
        stages.append((j, alpha))
    q = st.gamma * q
    for j, alpha in reversed(stages):
        s, y, rho = st.s_hist[j], st.y_hist[j], st.rho_hist[j]
        beta = jnp.where(rho > 0, rho * L.xdot(dp, y, q), 0.0)
        q = q + s * (alpha - beta)
    return q


def init(dp: L.DeviceProblem, L_est, opts: SolveOptions, xp0=None) -> LBFGSState:
    if opts.line_search not in ("exact",):
        raise ValueError(
            f"method 'lbfgs' does not support line_search={opts.line_search!r}; "
            "the quasi-Newton arc always uses the exact quadratic line search"
        )
    if opts.step_size > 0:
        raise ValueError(
            "method 'lbfgs' ignores step_size; the trial step is H g from "
            "the curvature memory (use method='pgd' for fixed steps)"
        )
    xp = xp0 if xp0 is not None else L.feasible_init(dp)
    x_flat = L.padded_to_flat(dp, xp)
    r = Q.residual(dp, x_flat)
    f = Q.objective_from_residual(dp, r)
    M = max(int(opts.lbfgs_mem), 1)
    n = x_flat.shape[-1]
    dt = x_flat.dtype
    return LBFGSState(
        xp=xp, r=r, f=f,
        gap=jnp.asarray(jnp.inf, f.dtype),
        k=jnp.asarray(0, jnp.int32),
        u_prev=x_flat,
        g_prev=jnp.zeros_like(x_flat),
        s_hist=jnp.zeros((M, n), dt),
        y_hist=jnp.zeros((M, n), dt),
        rho_hist=jnp.zeros((M,), dt),
        gamma=jnp.asarray(1.0, dt) / L_est,
    )


def refresh(dp, st: LBFGSState, L_est, opts: SolveOptions) -> LBFGSState:
    x_flat = L.padded_to_flat(dp, st.xp)
    r = Q.residual(dp, x_flat)
    return st._replace(r=r, f=Q.objective_from_residual(dp, r))


def step(dp, st: LBFGSState, L_est, opts: SolveOptions) -> LBFGSState:
    M = max(int(opts.lbfgs_mem), 1)
    x_flat = L.padded_to_flat(dp, st.xp)
    g_flat = Q.grad_flat(dp, st.r)
    gp = L.flat_to_padded(dp, g_flat)
    gap = fw_gap(dp, g_flat, x_flat, gp)
    zspace = opts.space == "z"

    if zspace:
        # reparametrise: u = z (order simplex), grad_u = D^T g
        zp = tuple(Z.x_to_z_padded(x, bk.mask) for x, bk in zip(st.xp, dp.buckets))
        gzp = tuple(Z.dz_adjoint_padded(g, bk.mask) for g, bk in zip(gp, dp.buckets))
        u_flat = L.padded_to_flat(dp, zp)
        gu_flat = L.padded_to_flat(dp, gzp)
    else:
        zp = gzp = None
        u_flat, gu_flat = x_flat, g_flat

    # ---- curvature-pair update (s, y) from the previous iterate ----
    s = u_flat - st.u_prev
    y = gu_flat - st.g_prev
    sy = L.xdot(dp, s, y)
    ss = L.xdot(dp, s, s)
    yy = L.xdot(dp, y, y)
    valid = (st.k > 0) & (sy > 1e-10 * jnp.sqrt(ss * yy) + 1e-30)
    rho_new = jnp.where(valid, 1.0 / jnp.maximum(sy, 1e-30), 0.0)
    zero = jnp.zeros_like(s)
    # shift (drop oldest, append newest) — static slices, scatter-free
    s_hist = jnp.concatenate([st.s_hist[1:], jnp.where(valid, s, zero)[None]], axis=0)
    y_hist = jnp.concatenate([st.y_hist[1:], jnp.where(valid, y, zero)[None]], axis=0)
    rho_hist = jnp.concatenate([st.rho_hist[1:], rho_new[None]], axis=0)
    gamma = jnp.where(valid, sy / jnp.maximum(yy, 1e-30), st.gamma)
    st = st._replace(s_hist=s_hist, y_hist=y_hist, rho_hist=rho_hist, gamma=gamma)

    # ---- quasi-Newton projection-arc candidate ----
    q = _two_loop(dp, gu_flat, st, M)
    t0 = jnp.asarray(1.0, x_flat.dtype) / L_est
    if zspace:
        qp = L.flat_to_padded(dp, q)
        gz_t0 = tuple(t0 * g for g in gzp)
        zhat_qn = tuple(
            isotonic.pava_bounded(z - dq, jnp.maximum(bk.sizes - 1, 0), bk.radius)
            for z, dq, bk in zip(zp, qp, dp.buckets)
        )
        zhat_gd = tuple(
            isotonic.pava_bounded(z - g, jnp.maximum(bk.sizes - 1, 0), bk.radius)
            for z, g, bk in zip(zp, gz_t0, dp.buckets)
        )
        d_qn = _dz_forward(tuple(zh - z for zh, z in zip(zhat_qn, zp)), dp.buckets)
        d_gd = _dz_forward(tuple(zh - z for zh, z in zip(zhat_gd, zp)), dp.buckets)
    else:
        qp = L.flat_to_padded(dp, q)
        xhat_qn = projection.proj_blocks(
            tuple(x - dq for x, dq in zip(st.xp, qp)), dp.buckets)
        xhat_gd = projection.proj_blocks(
            tuple(x - t0 * g for x, g in zip(st.xp, gp)), dp.buckets)
        d_qn = tuple(xh - x for xh, x in zip(xhat_qn, st.xp))
        d_gd = tuple(xh - x for xh, x in zip(xhat_gd, st.xp))

    # descent safeguard: keep the QN arc only if it is a descent direction
    gd_qn = L.xdot(dp, g_flat, L.padded_to_flat(dp, d_qn))
    use_qn = gd_qn < -1e-30
    dxp = tuple(jnp.where(use_qn, a, b) for a, b in zip(d_qn, d_gd))

    # ---- exact quadratic line search along the chosen direction ----
    d_flat = L.padded_to_flat(dp, dxp)
    Ad = L.matvec_ps(dp, d_flat)
    t = Q.exact_step(dp, L.xdot(dp, g_flat, d_flat), Ad, 0.0, 1.0)

    xp_new = tuple(x + t * d for x, d in zip(st.xp, dxp))
    r_new = st.r + t * Ad
    f_new = Q.objective_from_residual(dp, r_new)
    return st._replace(
        xp=xp_new, r=r_new, f=f_new, gap=gap, k=st.k + 1,
        u_prev=u_flat, g_prev=gu_flat,
    )
