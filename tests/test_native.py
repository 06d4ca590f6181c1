"""Native (C++) layout-engine tests: equivalence with the numpy fallback
and through the full prepare() pipeline."""
import importlib
import os
import subprocess

import numpy as np
import pytest

from bsls_tpu import native


def _have_native():
    return native.native_available()


def test_group_ell_matches_numpy():
    rng = np.random.default_rng(0)
    n, G = 20000, 1500
    keys = rng.integers(0, G, size=n)
    idx = rng.integers(0, 10**6, size=n).astype(np.int32)
    vals = rng.standard_normal(n).astype(np.float32)
    ref_cols, ref_vals = native._group_ell_numpy(
        keys.astype(np.int64), idx, vals, G
    )
    if not _have_native():
        pytest.skip("no native toolchain")
    cols, out_vals = native.group_ell(keys, idx, vals, G)
    np.testing.assert_array_equal(cols, ref_cols)
    np.testing.assert_array_equal(out_vals, ref_vals)


def test_group_ell_float64_and_empty_groups():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 50, size=300)  # groups 50..99 empty
    idx = np.arange(300, dtype=np.int32)
    vals = rng.standard_normal(300)  # float64
    cols, out_vals = native.group_ell(keys, idx, vals, 100)
    ref_cols, ref_vals = native._group_ell_numpy(
        keys.astype(np.int64), idx, vals, 100
    )
    np.testing.assert_array_equal(cols, ref_cols)
    np.testing.assert_array_equal(out_vals, ref_vals)
    assert out_vals.dtype == np.float64
    assert (out_vals[50:] == 0).all()


def test_prepare_identical_with_and_without_native():
    """The whole device layout must be bit-identical whichever engine built
    it (prepare goes through group_ell in three builders)."""
    if not _have_native():
        pytest.skip("no native toolchain")
    import jax

    from bsls_tpu.models import synthetic
    from bsls_tpu.ops import layout as L

    prob = synthetic.medium_sparse(seed=11, num_blocks=200, m=1500)

    dp_native = L.prepare(prob)

    # rebuild the module state with the fallback forced
    env = os.environ.get("BSLS_NO_NATIVE")
    os.environ["BSLS_NO_NATIVE"] = "1"
    native._tried, native._lib = False, None
    try:
        dp_numpy = L.prepare(prob)
    finally:
        if env is None:
            del os.environ["BSLS_NO_NATIVE"]
        else:
            os.environ["BSLS_NO_NATIVE"] = env
        native._tried, native._lib = False, None

    la, lb = jax.tree_util.tree_leaves(dp_native), jax.tree_util.tree_leaves(dp_numpy)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_csc_ell_matches_numpy_and_scipy():
    """from_csc's native one-pass encode == numpy fallback == scipy matvec
    (the 48M-nnz .mat ingestion path, scaled down)."""
    import scipy.sparse as sp

    from bsls_tpu.models.problem import EllMatrix

    rng = np.random.default_rng(3)
    A = sp.random(700, 400, density=0.04, format="csc", random_state=11)
    ref_rows, ref_vals = native._csc_ell_numpy(
        A.indptr.astype(np.int64), A.indices.astype(np.int32),
        A.data.astype(np.float64), int(np.diff(A.indptr).max()),
    )
    rows, vals = native.csc_ell(A.indptr, A.indices, A.data)
    np.testing.assert_array_equal(rows, ref_rows)
    np.testing.assert_array_equal(vals, ref_vals)
    E = EllMatrix.from_csc(A.indptr, A.indices, A.data, A.shape[0])
    x = rng.random(400)
    np.testing.assert_allclose(E.matvec(x), A @ x, rtol=1e-12)
    r = rng.random(700)
    np.testing.assert_allclose(E.rmatvec(r), A.T @ r, rtol=1e-12)


def test_csc_ell_float64_and_empty_columns():
    import scipy.sparse as sp

    A = sp.csc_matrix(
        (np.array([2.0, 3.0, 5.0]), np.array([1, 0, 4]),
         np.array([0, 1, 1, 3, 3])),  # col 1 and 3 empty
        shape=(6, 4),
    )
    rows, vals = native.csc_ell(A.indptr, A.indices, A.data)
    assert vals.dtype == np.float64
    assert rows.shape == (4, 2)
    np.testing.assert_array_equal((vals != 0).sum(axis=1), [1, 0, 2, 0])


def test_csr_matmat_f64_matches_scipy():
    """The OpenMP SpMM (certified-refine hot path) must match scipy to
    f64 roundoff for single- and multi-RHS shapes, including empty rows,
    and the hostops closures must round-trip A and A^T."""
    import scipy.sparse as sp

    from bsls_tpu.utils.hostops import host_matmat_ops

    if not native.native_available():
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    A = sp.random(300, 200, density=0.05, format="csr", random_state=3)
    A.data = rng.standard_normal(A.data.size)
    # force an empty row and an empty column
    A = sp.csr_matrix(A.toarray() * (np.arange(300) != 17)[:, None]
                      * (np.arange(200) != 5)[None, :])
    for S in (1, 5):
        X = rng.standard_normal((S, 200))
        Y = native.csr_matmat_f64(
            np.ascontiguousarray(A.indptr, np.int64),
            np.ascontiguousarray(A.indices, np.int32),
            np.ascontiguousarray(A.data, np.float64),
            300, np.ascontiguousarray(X))
        np.testing.assert_allclose(Y, (A @ X.T).T, rtol=1e-13, atol=1e-13)

    class _Wrap:
        def to_scipy(self):
            return A

    mm, rmm = host_matmat_ops(_Wrap())
    X = rng.standard_normal((3, 200))
    R = rng.standard_normal((3, 300))
    np.testing.assert_allclose(mm(X), (A @ X.T).T, rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(rmm(R), (A.T @ R.T).T, rtol=1e-13, atol=1e-13)
