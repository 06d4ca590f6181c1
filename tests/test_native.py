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
