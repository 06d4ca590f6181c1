"""Determinism: two identical solves produce bit-identical trajectories
(the nearest analog of a race detector for XLA's data-flow model —
SURVEY.md §5)."""
import numpy as np

import bsls_tpu as bsls
from bsls_tpu.models import synthetic


def test_solve_bitwise_deterministic():
    prob = synthetic.tiny_dense(seed=7, num_blocks=20, dim=6, m=120)
    r1 = bsls.solve(prob, method="pgd", tol=0.0, max_iter=300, chunk=100)
    r2 = bsls.solve(prob, method="pgd", tol=0.0, max_iter=300, chunk=100)
    assert np.array_equal(r1.trace_f, r2.trace_f)
    assert np.array_equal(r1.x, r2.x)


def test_sharded_solve_deterministic():
    import jax

    if len(jax.devices()) < 8:
        return
    from bsls_tpu.parallel import make_mesh, solve_sharded

    p = synthetic.large_sharded(num_blocks=32, dim=4, m=64, num_scenarios=2,
                                block_multiple=8, noise=1e-3)
    mesh = make_mesh(block=4, scenario=2)
    r1 = solve_sharded(p, mesh, method="pgd", tol=0.0, max_iter=200, chunk=100)
    r2 = solve_sharded(p, mesh, method="pgd", tol=0.0, max_iter=200, chunk=100)
    assert np.array_equal(r1.trace_f, r2.trace_f)
