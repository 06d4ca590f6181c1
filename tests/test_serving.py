"""Serving endpoint: fixed A, streaming right-hand sides."""
import numpy as np
import pytest

import bsls_tpu as bsls
from bsls_tpu.models import oracle_solve, synthetic
from bsls_tpu.serving import Endpoint


def test_endpoint_streaming_rhs():
    prob = synthetic.tiny_dense(seed=3, num_blocks=20, dim=6, m=150)
    ep = Endpoint(prob, method="apgd", chunk=100)
    ep.warmup()
    rng = np.random.default_rng(0)
    for trial in range(3):
        x_true = synthetic.random_block_x(rng, prob.partition.sizes)
        b = prob.A.matvec(x_true) + 1e-3 * rng.standard_normal(150)
        res = ep.solve(b, tol=1e-8, max_iter=3000)
        single = bsls.Problem(A=prob.A, b=b, partition=prob.partition)
        orc = oracle_solve(single, tol_gap=1e-9, max_iter=10000)
        rel = (float(res.objective) - orc.objective) / max(1.0, orc.objective)
        assert rel <= 1e-5, (trial, rel)


@pytest.mark.slow
def test_endpoint_batch_and_warm_start():
    prob = synthetic.medium_sparse(seed=2, num_blocks=60, m=400)  # sparse: row-bucketed layout
    ep = Endpoint(prob, method="pgd", chunk=100)
    rng = np.random.default_rng(1)
    B = np.stack([
        prob.A.matvec(synthetic.random_block_x(rng, prob.partition.sizes))
        for _ in range(3)
    ])
    res = ep.solve(B, tol=1e-7, max_iter=2000)
    assert res.x.shape == (3, prob.partition.n_flat)
    # warm start from the previous solution converges immediately
    res2 = ep.solve(B, tol=1e-7, max_iter=500, x0=res.x)
    assert np.all(np.asarray(res2.objective) <= np.asarray(res.objective) + 1e-5)


def test_endpoint_refine_requests():
    """Per-request refine=K: the endpoint polishes against the request's own
    b (f64 host anchor) and the result lands well below the fp32 floor."""
    prob = synthetic.tiny_dense(seed=3, num_blocks=20, dim=6, m=150)
    ep = Endpoint(prob, method="lbfgs", chunk=100)
    rng = np.random.default_rng(4)
    x_true = synthetic.random_block_x(rng, prob.partition.sizes)
    b = prob.A.matvec(x_true) + 1e-3 * rng.standard_normal(150)
    single = bsls.Problem(A=prob.A, b=b, partition=prob.partition)
    orc = oracle_solve(single, tol_gap=1e-11, max_iter=20000)
    res = ep.solve(b, tol=0.0, max_iter=600, refine=6)
    rel = (float(res.objective) - orc.objective) / max(orc.objective, 1e-30)
    assert rel < 1e-8, rel
    assert res.refine_secs > 0.0


def test_endpoint_mesh_refine_requests():
    """Per-request refine on the POD-SHARDED endpoint (round 4): the
    gathered result is polished by the host f64 path against the request's
    own b, and refine_tol ships its certificate through the mesh branch."""
    import jax

    from bsls_tpu.parallel import make_mesh

    prob = synthetic.tiny_dense(seed=3, num_blocks=32, dim=4, m=128)
    mesh = make_mesh(block=len(jax.devices()), scenario=1)
    ep = Endpoint(prob, method="pgd", chunk=100, mesh=mesh)
    rng = np.random.default_rng(5)
    x_true = synthetic.random_block_x(rng, prob.partition.sizes)
    b = prob.A.matvec(x_true) + 1e-3 * rng.standard_normal(128)
    single = bsls.Problem(A=prob.A, b=b, partition=prob.partition)
    orc = oracle_solve(single, tol_gap=1e-11, max_iter=20000)
    res = ep.solve(b, tol=0.0, max_iter=600, refine=6)
    rel = (float(res.objective) - orc.objective) / max(orc.objective, 1e-30)
    assert rel < 1e-8, rel
    res_c = ep.solve(b, tol=0.0, max_iter=600, refine=6, refine_tol=1e-8)
    assert res_c.refine_fw_gap is not None and res_c.refine_fw_gap <= 1e-8


def test_endpoint_rejects_bad_shapes():
    prob = synthetic.tiny_dense(seed=3, num_blocks=5, dim=4, m=30)
    ep = Endpoint(prob)
    try:
        ep.solve(np.zeros(29))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "29" in str(e)


def test_batch_queue_coalesces_and_matches_individual():
    """Concurrent requests coalesce onto the scenario axis; per-request
    results match individual endpoint solves."""
    from bsls_tpu.serving import BatchQueue, Endpoint
    from bsls_tpu.models import synthetic

    prob = synthetic.tiny_dense(seed=3, num_blocks=20, dim=5, m=120)
    ep = Endpoint(prob, method="pgd", chunk=100)
    q = BatchQueue(ep, max_batch=8, max_wait_ms=200, tol=0.0, max_iter=200)
    rng = np.random.default_rng(0)
    bs = [np.asarray(prob.b) + 0.01 * rng.standard_normal(prob.A.shape[0])
          for _ in range(5)]
    futs = [q.submit(b) for b in bs]
    results = [f.result(timeout=300) for f in futs]
    q.close()
    assert q.requests_served == 5
    assert q.batches_run < 5, "requests should have coalesced"
    for b, r in zip(bs, results):
        solo = ep.solve(b, tol=0.0, max_iter=200)
        np.testing.assert_allclose(float(r.objective), float(solo.objective),
                                   rtol=1e-5, atol=1e-8)
        assert r.x.shape == (prob.partition.n_flat,)


@pytest.mark.slow
def test_endpoint_mesh_backed_serving():
    """Pod-sharded serving: A is sharded/uploaded once at Endpoint init;
    streaming requests device_put only b and reuse the cached executable.
    Results must match the unsharded endpoint."""
    import jax

    from bsls_tpu.models import synthetic
    from bsls_tpu.parallel import make_mesh

    prob = synthetic.tiny_dense(seed=0, num_blocks=32, dim=4, m=128)
    mesh = make_mesh(block=len(jax.devices()), scenario=1)
    ep_mesh = Endpoint(prob, method="pgd", chunk=100, mesh=mesh)
    ep_ref = Endpoint(prob, method="pgd", chunk=100)
    rng = np.random.default_rng(0)
    b0 = np.asarray(prob.b)
    for k in range(2):  # second request exercises the warm path
        b = b0 * (1.0 + 0.01 * k)
        r_m = ep_mesh.solve(b, tol=1e-7, max_iter=400)
        r_r = ep_ref.solve(b, tol=1e-7, max_iter=400)
        np.testing.assert_allclose(float(np.asarray(r_m.objective)),
                                   float(np.asarray(r_r.objective)),
                                   rtol=5e-3, atol=1e-7)  # reduction-order noise near f*~1e-5
    # batched request on the same endpoint
    B = np.stack([b0, b0 * 1.01])
    r_b = ep_mesh.solve(B, tol=1e-7, max_iter=400)
    assert np.asarray(r_b.objective).shape == (2,)


@pytest.mark.slow
def test_endpoint_mesh_backed_eq_serving():
    """Eq-constrained pod serving: the sharded stacked [A; sqrt(rho) C]
    operator is cached after the first request (one shard/upload + two
    on-mesh power iterations); streaming requests re-upload only the
    stacked RHS and warm-start the multipliers.  Objectives must match the
    unsharded eq endpoint."""
    import jax

    from bsls_tpu.models import synthetic
    from bsls_tpu.parallel import make_mesh

    prob = synthetic.traffic_like(seed=3, num_blocks=48, m=200, num_eq=8,
                                  noise=1e-3)
    mesh = make_mesh(block=len(jax.devices()), scenario=1)
    ep_mesh = Endpoint(prob, method="apgd", chunk=100, mesh=mesh)
    ep_ref = Endpoint(prob, method="apgd", chunk=100)
    b0 = np.asarray(prob.b)
    for k in range(2):  # second request: cached sharded op + warm lam
        b = b0 * (1.0 + 0.05 * k)
        # max_iter is a TOTAL inner budget since round 4; converged AL runs
        # on traffic instances need 3.6k-7k inners (eq_constrained.py note)
        r_m = ep_mesh.solve(b, tol=1e-7, max_iter=10_000)
        r_r = ep_ref.solve(b, tol=1e-7, max_iter=10_000)
        assert r_m.eq_violation <= 1e-6
        # atol: converged objectives sit at the fp32 noise floor (~1e-8)
        np.testing.assert_allclose(float(np.asarray(r_m.objective)),
                                   float(np.asarray(r_r.objective)),
                                   rtol=1e-4, atol=1e-7)
    # exactly one sharded stacked operator was built for the stream
    assert len(ep_mesh._eq_ops) == 1


def test_batch_queue_over_mesh_endpoint():
    """Micro-batching composes with pod-sharded serving: concurrent
    requests coalesce onto the scenario axis of a mesh-backed endpoint."""
    import jax

    from bsls_tpu.parallel import make_mesh
    from bsls_tpu.serving import BatchQueue

    prob = synthetic.tiny_dense(seed=0, num_blocks=32, dim=4, m=128)
    mesh = make_mesh(block=len(jax.devices()), scenario=1)
    ep = Endpoint(prob, method="pgd", chunk=100, mesh=mesh)
    q = BatchQueue(ep, max_batch=8, max_wait_ms=200, tol=0.0, max_iter=200)
    rng = np.random.default_rng(0)
    bs = [np.asarray(prob.b) + 0.01 * rng.standard_normal(prob.A.shape[0])
          for _ in range(3)]
    futs = [q.submit(b) for b in bs]
    results = [f.result(timeout=300) for f in futs]
    q.close()
    for b, r in zip(bs, results):
        solo = ep.solve(b, tol=0.0, max_iter=200)
        np.testing.assert_allclose(float(r.objective),
                                   float(np.asarray(solo.objective)),
                                   rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_endpoint_eq_operator_cache(monkeypatch):
    """Streaming eq-constrained requests share ONE prepared stacked
    operator: the second request must not re-run L.prepare (host
    re-encode/upload) or the power iterations, and must still solve the
    new RHS correctly."""
    from bsls_tpu.models import synthetic
    from bsls_tpu.ops import layout as layout_mod

    prob = synthetic.traffic_like(num_blocks=30, m=150, num_eq=8, noise=0.05)
    ep = Endpoint(prob, method="apgd", chunk=50, warm_start=False)
    calls = {"n": 0}
    real_prepare = layout_mod.prepare

    def counting_prepare(*a, **k):
        calls["n"] += 1
        return real_prepare(*a, **k)

    monkeypatch.setattr(layout_mod, "prepare", counting_prepare)
    b0 = np.asarray(prob.b)
    r1 = ep.solve(b0, tol=1e-7, max_iter=3000)
    n_first = calls["n"]
    assert n_first >= 1
    rng = np.random.default_rng(0)
    b1 = b0 * (1.0 + 1e-3 * rng.standard_normal(b0.shape))
    r2 = ep.solve(b1, tol=1e-7, max_iter=3000)
    assert calls["n"] == n_first, "second request re-prepared the operator"
    assert r2.eq_violation <= 1e-4
    # cached-operator result must match a fresh-endpoint solve of b1
    ep2 = Endpoint(prob, method="apgd", chunk=50, warm_start=False)
    monkeypatch.setattr(layout_mod, "prepare", real_prepare)
    r2f = ep2.solve(b1, tol=1e-7, max_iter=3000)
    np.testing.assert_allclose(
        float(r2.objective), float(r2f.objective), rtol=1e-4, atol=1e-7
    )


def test_endpoint_eq_warm_multiplier_cache():
    """Eq-constrained serving: the endpoint caches the converged AL state
    (lam, x) and warm-starts the next request.  The win shows when the
    equality constraints genuinely conflict with the LSQ fit (optimal
    multipliers are O(1)); with consistent data lam* ~ 0 and cold start is
    already optimal, so the test shifts d to make the constraints active."""
    import dataclasses

    from bsls_tpu.models import synthetic

    prob = synthetic.traffic_like(num_blocks=30, m=150, num_eq=8, noise=0.05)
    prob = dataclasses.replace(prob, d=np.asarray(prob.d) * 1.05 + 0.01)
    ep = Endpoint(prob, method="apgd", chunk=50)
    b0 = np.asarray(prob.b)
    r1 = ep.solve(b0, tol=1e-7, max_iter=4000)
    assert r1.eq_violation <= 1e-4
    assert np.abs(r1.eq_lam).max() > 1.0, "constraints should be active"
    assert ep._eq_warm, "converged state should be cached"
    # a nearby RHS (sensor drift): warm must converge at least as fast as
    # a cold solve of the same request, with constraints still held
    rng = np.random.default_rng(0)
    b1 = b0 * (1.0 + 1e-3 * rng.standard_normal(b0.shape))
    r2 = ep.solve(b1, tol=1e-7, max_iter=4000)
    assert r2.eq_violation <= 1e-4
    ep_cold = Endpoint(prob, method="apgd", chunk=50, warm_start=False)
    r2c = ep_cold.solve(b1, tol=1e-7, max_iter=4000)
    assert r2.iterations <= r2c.iterations, (r2.iterations, r2c.iterations)
    assert float(r2.objective) <= float(r2c.objective) * 1.5 + 1e-6


def test_endpoint_eq_sensitivity_fast_path():
    """Streaming eq requests take the SENSITIVITY fast path: from the
    previous request's converged (x, lam, rho), only float64 AL finishing
    outers run (no fp32 inner solves).  Certificate-gated: the result must
    hold the constraints and match a cold full solve's objective; a
    far-away RHS must still return a correct (possibly fallback) result."""
    import dataclasses

    from bsls_tpu.models import synthetic

    prob = synthetic.traffic_like(num_blocks=30, m=150, num_eq=8, noise=0.05)
    prob = dataclasses.replace(prob, d=np.asarray(prob.d) * 1.05 + 0.01)
    ep = Endpoint(prob, method="apgd", chunk=50)
    b0 = np.asarray(prob.b)
    r1 = ep.solve(b0, tol=1e-7, max_iter=4000)
    assert r1.converged and ep._eq_warm
    rng = np.random.default_rng(1)
    b1 = b0 * (1.0 + 2e-2 * rng.standard_normal(b0.shape))
    r2 = ep.solve(b1, tol=1e-7, max_iter=4000)
    assert r2.stop_reason == "sensitivity", r2.stop_reason
    assert r2.converged and r2.eq_violation <= 1e-7
    # round 5: fast-path responses are self-certifying — the KKT walk's
    # exact multipliers ship as a sound Lagrangian dual bound
    assert r2.refine_fw_gap is not None and r2.refine_fw_gap <= 1e-6, (
        r2.refine_fw_gap)
    # objective parity vs a cold full AL solve of the same request
    cold = Endpoint(prob, method="apgd", chunk=50, warm_start=False)
    r2c = cold.solve(b1, tol=1e-7, max_iter=4000)
    f_fast, f_cold = float(r2.objective), float(r2c.objective)
    assert f_fast <= f_cold + 1e-6 * max(1.0, abs(f_cold)), (f_fast, f_cold)
    # opt-out flag forces the full path
    r3 = ep.solve(b1, tol=1e-7, max_iter=4000, sensitivity=False)
    assert r3.stop_reason != "sensitivity"
    # the fast result keeps feeding the warm cache: a third nearby request
    # still fast-paths
    b2 = b1 * (1.0 + 1e-2 * rng.standard_normal(b0.shape))
    r4 = ep.solve(b2, tol=1e-7, max_iter=4000)
    assert r4.stop_reason == "sensitivity" and r4.eq_violation <= 1e-7


def test_endpoint_mesh_eq_sensitivity_fast_path():
    """Round 5: mesh-backed eq endpoints take the sensitivity fast path
    too — the BPP walk is host-side and mesh-agnostic, so pod serving
    gets the same streaming latency win (with the usual certificate-gated
    fallback to the full sharded AL solve)."""
    import jax

    from bsls_tpu.models import synthetic
    from bsls_tpu.parallel import make_mesh

    prob = synthetic.traffic_like(seed=3, num_blocks=48, m=200, num_eq=8,
                                  noise=1e-3)
    mesh = make_mesh(block=len(jax.devices()), scenario=1)
    ep = Endpoint(prob, method="apgd", chunk=100, mesh=mesh)
    b0 = np.asarray(prob.b)
    r1 = ep.solve(b0, tol=1e-7, max_iter=10_000)
    assert r1.converged
    rng = np.random.default_rng(2)
    b1 = b0 * (1.0 + 2e-2 * rng.standard_normal(b0.shape))
    r2 = ep.solve(b1, tol=1e-7, max_iter=10_000)
    assert r2.stop_reason == "sensitivity", r2.stop_reason
    assert r2.eq_violation <= 1e-7
    assert r2.refine_fw_gap is not None and r2.refine_fw_gap <= 1e-6
