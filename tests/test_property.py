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
