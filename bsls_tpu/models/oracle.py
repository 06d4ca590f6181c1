"""CPU float64 oracle solver: certified ground-truth objectives.

The reference validates solvers against CVX/QP baselines (SURVEY.md §2 #15,
[UNVERIFIED]).  With no CVX in this image, the oracle is an accelerated
projected-gradient (FISTA) solve in float64 with monotone restarts, whose
optimality is *certified* by the Frank-Wolfe duality gap

    f(x) - f*  <=  gap(x) = grad f(x) . (x - s),   s = per-block vertex argmin

which is exactly computable on a product of simplices.  For a convex QP the
certified optimum equals the reference solver's objective up to its own gap,
which is what BASELINE.json:5's parity clause operationally means (see
SURVEY.md §7 hard part 6).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..utils.refimpl import proj_blocks_np
from .problem import Problem

__all__ = ["OracleResult", "fw_gap_np", "oracle_solve"]


@dataclass
class OracleResult:
    x: np.ndarray
    objective: float
    gap: float  # FW duality gap certificate: f(x) - f* <= gap
    iterations: int


def fw_gap_np(g: np.ndarray, x: np.ndarray, sizes: np.ndarray) -> float:
    """Frank-Wolfe duality gap g.(x - s) with s the blockwise vertex argmin."""
    gap = 0.0
    off = 0
    for n in np.asarray(sizes, dtype=np.int64):
        gb, xb = g[off : off + n], x[off : off + n]
        gap += float(gb @ xb - gb.min())
        off += n
    return gap


def _power_iteration_sq_norm(A, n: int, iters: int = 60, seed: int = 0) -> float:
    """Estimate ||A||_2^2 (Lipschitz constant of the gradient)."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(n)
    v /= np.linalg.norm(v)
    lam = 1.0
    for _ in range(iters):
        w = A.rmatvec(A.matvec(v))
        lam = float(np.linalg.norm(w))
        if lam == 0.0:
            return 1.0
        v = w / lam
    return lam * 1.01  # small safety margin


def oracle_solve(
    problem: Problem,
    tol_gap: float = 1e-10,
    max_iter: int = 20000,
    scenario: int | None = None,
) -> OracleResult:
    """Solve one scenario of ``problem`` to FW-gap <= tol_gap (float64 FISTA).

    Equality constraints (problem.C) are NOT handled here; the
    equality-constrained oracle lives in the augmented-Lagrangian solver's
    test (it reuses this oracle on the augmented quadratic).
    """
    A = problem.A
    b = np.asarray(problem.b, dtype=np.float64)
    if b.ndim == 2:
        b = b[0 if scenario is None else scenario]
    sizes = problem.partition.sizes
    n = problem.partition.n_flat

    L = _power_iteration_sq_norm(A, n)
    step = 1.0 / L

    # feasible start: uniform on each block
    x = np.concatenate([np.full(int(s), 1.0 / s) for s in sizes])
    y = x.copy()
    t_mom = 1.0
    f_prev = np.inf
    gap = np.inf
    it = 0
    for it in range(1, max_iter + 1):
        r = A.matvec(y) - b
        g = A.rmatvec(r)
        x_new = proj_blocks_np(y - step * g, sizes)
        f_new = problem.objective_np(x_new)
        if f_new > f_prev:  # monotone restart
            y = x.copy()
            t_mom = 1.0
            r = A.matvec(y) - b
            g = A.rmatvec(r)
            x_new = proj_blocks_np(y - step * g, sizes)
            f_new = problem.objective_np(x_new)
        t_new = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t_mom * t_mom))
        y = x_new + ((t_mom - 1.0) / t_new) * (x_new - x)
        x, t_mom, f_prev = x_new, t_new, f_new
        if it % 25 == 0 or it == max_iter:
            gx = A.rmatvec(A.matvec(x) - b)
            gap = fw_gap_np(gx, x, sizes)
            if gap <= tol_gap:
                break
    return OracleResult(x=x, objective=problem.objective_np(x), gap=gap, iterations=it)
