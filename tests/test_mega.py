"""Megakernel dispatch (solvers/mega.py): eligibility gate + end-to-end
solve() equivalence through the forced interpret-mode path on CPU."""
import numpy as np
import pytest

import bsls_tpu as bsls
from bsls_tpu.models import synthetic
from bsls_tpu.ops import layout as L
from bsls_tpu.solvers import mega
from bsls_tpu.solvers.base import SolveOptions


@pytest.fixture()
def force_mega(monkeypatch):
    monkeypatch.setenv("BSLS_MEGA", "1")
    mega.use_mega.cache_clear()
    yield
    mega.use_mega.cache_clear()


def test_eligibility_gate(force_mega):
    opts = SolveOptions(method="pgd", line_search="exact")
    dense = L.prepare(synthetic.tiny_dense(seed=0, num_blocks=30, dim=6, m=200))
    assert mega.mega_eligible(dense, "pgd", opts)
    # wrong method / line search
    assert not mega.mega_eligible(dense, "apgd", opts)
    assert not mega.mega_eligible(
        dense, "pgd", SolveOptions(method="pgd", line_search="bb"))
    # multi-RHS
    multi = L.prepare(
        synthetic.with_scenarios(
            synthetic.tiny_dense(seed=0, num_blocks=30, dim=6, m=200), 4))
    assert not mega.mega_eligible(multi, "pgd", opts)
    # sparse A
    sparse = L.prepare(synthetic.medium_sparse(seed=1, num_blocks=50, m=500))
    assert not mega.mega_eligible(sparse, "pgd", opts)
    # ragged (multi-bucket) partition
    ragged = L.prepare(synthetic.traffic_like(seed=1, num_blocks=40, m=150,
                                              num_eq=0))
    if len(ragged.buckets) > 1:
        assert not mega.mega_eligible(ragged, "pgd", opts)


def test_mega_solve_matches_xla(force_mega):
    prob = synthetic.tiny_dense(seed=0, num_blocks=40, dim=8, m=320)
    res_m = bsls.solve(prob, method="pgd", line_search="exact", max_iter=200,
                       chunk=100, tol=0)
    mega.use_mega.cache_clear()
    import os

    os.environ["BSLS_MEGA"] = "0"
    os.environ["BSLS_NO_MEGA"] = "1"
    mega.use_mega.cache_clear()
    try:
        res_x = bsls.solve(prob, method="pgd", line_search="exact", max_iter=200,
                           chunk=100, tol=0)
    finally:
        del os.environ["BSLS_NO_MEGA"]
        mega.use_mega.cache_clear()
    np.testing.assert_allclose(
        np.asarray(res_m.trace_f), np.asarray(res_x.trace_f), rtol=1e-3)
    np.testing.assert_allclose(res_m.x, res_x.x, atol=2e-4)
    # boundary certificate recorded and finite
    assert np.isfinite(float(res_m.gap))
    assert res_m.trace_gap.shape == res_x.trace_gap.shape
