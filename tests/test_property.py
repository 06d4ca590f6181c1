"""Property-based kernel tests (hypothesis): the fixed-seed suites pin
known cases; these sweep the input space for the projection / PAVA /
z-transform invariants that every solver step relies on (SURVEY.md §4b
"property tests ... feasibility, idempotence, nonexpansiveness").
"""
import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

import jax.numpy as jnp

from bsls_tpu.ops import isotonic, projection, ztransform as Z
from bsls_tpu.utils import refimpl

import pytest

_SETTINGS = dict(max_examples=25, deadline=None, derandomize=True)

# padded rows: width w in [1, 24], batch B in [1, 6], moderate magnitudes
_rows = st.integers(1, 6).flatmap(
    lambda B: st.integers(1, 24).flatmap(
        lambda w: st.tuples(
            hnp.arrays(np.float64, (B, w),
                       elements=st.floats(-50, 50, allow_nan=False)),
            st.lists(st.integers(1, w), min_size=B, max_size=B),
        )
    )
)


def _mask(sizes, w):
    return (np.arange(w)[None, :] < np.asarray(sizes)[:, None]).astype(np.float64)


@given(_rows)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_projection_properties(data):
    v, sizes = data
    B, w = v.shape
    mask = _mask(sizes, w)
    out = np.asarray(projection.proj_simplex_padded(jnp.asarray(v * mask),
                                                    jnp.asarray(mask)))
    for i in range(B):
        n = sizes[i]
        row = out[i, :n]
        # feasibility
        assert row.min() >= -1e-6
        assert abs(row.sum() - 1.0) < 2e-4  # fp32 kernel, inputs up to |50|
        # padding untouched
        assert np.all(out[i, n:] == 0.0)
        # matches the numpy reference (arXiv:1101.6081 algorithm)
        ref = refimpl.proj_simplex_np(v[i, :n])
        np.testing.assert_allclose(row, ref, atol=2e-4)
    # idempotence: projecting a projection is a fixed point
    out2 = np.asarray(projection.proj_simplex_padded(jnp.asarray(out),
                                                     jnp.asarray(mask)))
    np.testing.assert_allclose(out2, out, atol=2e-4)


@given(_rows)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_projection_nonexpansive(data):
    v, sizes = data
    B, w = v.shape
    mask = _mask(sizes, w)
    rng = np.random.default_rng(0)
    u = v + rng.standard_normal(v.shape)
    pv = np.asarray(projection.proj_simplex_padded(jnp.asarray(v * mask),
                                                   jnp.asarray(mask)))
    pu = np.asarray(projection.proj_simplex_padded(jnp.asarray(u * mask),
                                                   jnp.asarray(mask)))
    for i in range(B):
        n = sizes[i]
        lhs = np.linalg.norm(pv[i, :n] - pu[i, :n])
        rhs = np.linalg.norm((v - u)[i, :n])
        assert lhs <= rhs + 1e-4


@given(_rows)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_pava_matches_reference(data):
    y, sizes = data
    B, w = y.shape
    mask = _mask(sizes, w)
    out = np.asarray(isotonic.pava_padded(jnp.asarray(y * mask),
                                          jnp.asarray(mask), lo=0.0, hi=1.0))
    for i in range(B):
        n = sizes[i]
        ref = refimpl.pava_np(y[i, :n], lo=0.0, hi=1.0)
        np.testing.assert_allclose(out[i, :n], ref, atol=2e-4)
        # monotone nondecreasing within the row
        assert np.all(np.diff(out[i, :n]) >= -1e-6)
        assert out[i, :n].min() >= -1e-9 and out[i, :n].max() <= 1.0 + 1e-9


@given(_rows)
@settings(**_SETTINGS)
def test_z_transform_roundtrip(data):
    raw, sizes = data
    B, w = raw.shape
    mask = _mask(sizes, w)
    # build feasible block-simplex rows from |raw|
    x = np.abs(raw) + 1e-3
    x = np.where(mask > 0, x, 0.0)
    x = x / np.maximum(x.sum(axis=1, keepdims=True), 1e-30)
    z = Z.x_to_z_padded(jnp.asarray(x), jnp.asarray(mask))
    back = np.asarray(Z.z_to_x_padded(z, jnp.asarray(mask)))
    np.testing.assert_allclose(back, x, atol=1e-6)
    # z lies in the order simplex: 0 <= z_1 <= ... <= 1, per valid prefix
    zn = np.asarray(z)
    zm = np.asarray(Z.zmask(jnp.asarray(mask)))
    for i in range(B):
        vals = zn[i][zm[i] > 0]
        if vals.size:
            assert vals.min() >= -1e-6 and vals.max() <= 1.0 + 1e-6
            assert np.all(np.diff(vals) >= -1e-6)


# ---- projected-PCG face solver (round 5: sparse-KKT BPP path) ----

@given(st.data())
@settings(**_SETTINGS)
def test_face_pcg_matches_dense_kkt(data):
    """_face_pcg (the beyond-dense-KKT face solver) must reproduce the
    dense KKT solution to f64 cleanliness across random shapes, block
    layouts, eps scales, and with/without equality rows.

    Calibration (round-5 deep fuzz, 300 random cases): the PCG solution
    satisfies the KKT system to ~2e-13 relative residual everywhere; on
    severely ill-conditioned draws (m << nf with eps ~ 1e-7, cond(KKT)
    up to 1e9) SOLUTION differences vs dense LU reach ~5e-6 = cond x
    residual — conditioning amplification, not solver error.  The 1e-8
    tolerance below is comfortable for the derandomized example set;
    residual-level exactness is what the BPP exchange actually needs."""
    import scipy.sparse as sp

    from bsls_tpu.solvers.eq_constrained import _face_pcg

    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    B = data.draw(st.integers(2, 10))
    nf = data.draw(st.integers(B, 60))
    m = data.draw(st.integers(4, 80))
    p = data.draw(st.integers(0, 4))
    eps = 10.0 ** data.draw(st.integers(-8, 0))
    bids = np.sort(rng.integers(0, B, nf))
    bids[:B] = np.arange(B)  # every block keeps at least one free coord
    bids = np.sort(bids)
    AF = sp.random(m, nf, density=0.4, random_state=int(rng.integers(1 << 30)),
                   format="csc")
    CF = (sp.random(p, nf, density=0.6,
                    random_state=int(rng.integers(1 << 30)), format="csc")
          if p else None)
    b = rng.normal(size=m)
    d = rng.normal(size=p) * 0.1
    xa = rng.uniform(0, 1, nf)
    x0 = rng.uniform(0, 1, nf)
    y, mu = _face_pcg(AF, CF, bids, B, b, d, xa, eps, x0)
    # dense reference KKT
    H = (AF.T @ AF).toarray() + eps * np.eye(nf)
    GB = np.zeros((B, nf))
    GB[bids, np.arange(nf)] = 1.0
    G = np.vstack([GB, CF.toarray()]) if p else GB
    nc = B + p
    if np.linalg.matrix_rank(G) < nc:
        return  # rank-deficient/infeasible constraint draw: both solvers
        # degrade to least-squares fits and the dense reference is
        # undefined — not the contract under test
    KKT = np.block([[H, G.T], [G, np.zeros((nc, nc))]])
    rhs = np.concatenate([AF.T @ b + eps * xa,
                          np.concatenate([np.ones(B), d])])
    try:
        sol = np.linalg.solve(KKT, rhs)
    except np.linalg.LinAlgError:
        return  # singular face: dense ref undefined
    scale = max(1.0, float(np.abs(sol).max()))
    # conditioning-aware tolerance: iterative-vs-direct SOLUTION
    # differences scale with cond(KKT) x the ~1e-13 residual both achieve
    # (see docstring); a fixed 1e-8 flakes on ill-conditioned draws
    tol = max(1e-8, 1e-13 * float(np.linalg.cond(KKT))) * scale
    assert np.abs(y - sol[:nf]).max() <= tol
    # constraints hold to roundoff regardless
    dref = max(1.0, float(np.abs(d).max())) if p else 1.0
    assert np.abs(G @ y - rhs[nf:]).max() <= 1e-10 * dref
