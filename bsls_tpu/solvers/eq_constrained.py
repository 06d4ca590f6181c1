"""Equality-constrained block-simplex LSQ via augmented Lagrangian.

    minimize 0.5||Ax-b||^2  s.t.  x in product of simplices,  C x = d

Outer loop (host): with multiplier lam and penalty rho, the inner problem

    min 0.5||Ax-b||^2 + lam.(Cx-d) + rho/2 ||Cx-d||^2
  = min 0.5|| [A; sqrt(rho) C] x - [b; sqrt(rho)(d - lam/rho)] ||^2 + const

is a *standard* block-simplex LSQ on the stacked operator, so every inner
solve reuses the full solver stack unchanged (only the bottom RHS block and
the penalty scale change between outer iterations — no recompilation, the
scale is a traced leaf of DeviceVStack).  Multiplier update
lam += rho (Cx - d); rho grows when the violation stalls.

Design decision (SURVEY.md §2 #12 asked to document it): augmented
Lagrangian over null-space elimination, because elimination destroys the
block-simplex structure the fused kernels exploit, while AL keeps the inner
iteration identical to the unconstrained hot path.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.problem import Problem, ScaledMatrix, VStackMatrix
from ..ops import layout as L

__all__ = ["solve_equality_constrained"]


def solve_equality_constrained(
    problem: Problem,
    method: str = "pgd",
    tol: float = 1e-6,
    eq_tol: float = 1e-6,
    max_iter: int = 10_000,
    chunk: int = 100,
    line_search: str = "exact",
    step_size: float = 0.0,
    dtype=jnp.float32,
    rho0: float = 1.0,
    rho_growth: float = 4.0,
    outer_iters: int = 12,
    inner_iters: int = 2000,
    mesh=None,
):
    """Returns a SolveResult whose ``eq_violation`` records the relative
    ||Cx-d||_inf.  With ``mesh`` the inner solves run mesh-sharded (the
    stacked [A; sqrt(rho) C] operator shards like any other instance)."""
    from .base import solve

    if problem.C is None:
        raise ValueError("problem has no equality constraints")
    if np.asarray(problem.b).ndim != 1:
        raise NotImplementedError("multi-RHS equality-constrained solve: per-scenario loop")

    C, d = problem.C, np.asarray(problem.d, dtype=np.float64)
    b = np.asarray(problem.b, dtype=np.float64)
    m = problem.A.shape[0]
    p = C.shape[0]

    # scale rho by the ratio of squared column norms so the penalty term is
    # commensurate with the data term from the first outer iteration
    from ..ops.layout import _col_norms_sq

    a_scale = float(np.mean(_col_norms_sq(problem.A)))
    c_scale = float(np.mean(_col_norms_sq(C))) or 1.0
    # start with the penalty an order of magnitude below the data term so
    # early inners optimise the objective; rho grows as needed
    rho = 0.1 * float(rho0) * a_scale / c_scale
    lam = np.zeros(p)

    result = None
    viol = np.inf
    total_iters = 0
    ok_streak = 0
    for outer in range(outer_iters):
        sr = np.sqrt(rho)
        b_bot = sr * (d - lam / rho)
        # rebuild so the block equilibration reflects the current penalty
        # scale (same shapes/structure -> no recompilation, only new leaves)
        stacked = Problem(
            A=VStackMatrix(top=problem.A, bottom=ScaledMatrix(C, sr)),
            b=np.concatenate([b, b_bot]),
            partition=problem.partition,
            name=problem.name + "+eq",
        )
        x_prev = None if result is None else np.asarray(result.x)
        if mesh is not None:
            from ..parallel.sharding import solve_sharded

            result = solve_sharded(
                stacked, mesh, method=method, tol=tol, max_iter=inner_iters,
                chunk=chunk, line_search=line_search, step_size=step_size,
                dtype=dtype, x0=x_prev,
            )
        else:
            dp = L.prepare(stacked, dtype=dtype)
            result = solve(
                dp, method=method, tol=tol, max_iter=inner_iters, chunk=chunk,
                line_search=line_search, step_size=step_size, dtype=dtype,
                x0=x_prev,  # warm-start from the previous outer iterate
            )
        total_iters += result.iterations
        x = np.asarray(result.x, dtype=np.float64).reshape(-1)
        cx_d = C.matvec(x) - d
        # relative violation: ||Cx-d||_inf / max(1, ||d||_inf)
        dref = max(1.0, float(np.abs(d).max())) if p else 1.0
        new_viol = float(np.abs(cx_d).max()) / dref if p else 0.0
        lam = lam + rho * cx_d
        if new_viol > 0.25 * viol and new_viol > eq_tol:
            rho *= rho_growth
        viol = new_viol
        # stop only after two consecutive outers with constraints holding and
        # the inner subproblem solved to optimality (the second pass lets the
        # multiplier update settle the objective)
        ok_streak = ok_streak + 1 if (viol <= eq_tol and result.converged) else 0
        if ok_streak >= 2:
            break

    # report the ORIGINAL objective (not the augmented one)
    result.objective = problem.objective_np(np.asarray(result.x, np.float64))
    result.iterations = total_iters
    result.eq_violation = viol
    result.converged = bool(result.converged and viol <= eq_tol)
    return result
