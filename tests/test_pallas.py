"""Pallas kernel correctness (interpret mode on CPU = the kernel 'sanitizer'
of SURVEY.md §5): fused projection and PAVA vs numpy references."""
import jax.numpy as jnp
import numpy as np
import pytest

from bsls_tpu.ops.pallas.pava_kernel import pava_pallas
from bsls_tpu.ops.pallas.projection_kernel import (
    proj_simplex_pallas,
    proj_simplex_pallas_t,
)
from bsls_tpu.utils.refimpl import pava_np, proj_simplex_np

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("w", [2, 5, 8, 16, 31, 64])
def test_projection_kernel_matches_reference(w):
    B = 48
    v = (RNG.standard_normal((B, w)) * 3).astype(np.float32)
    widths = RNG.integers(1, w + 1, size=B).astype(np.int32)
    radius = RNG.uniform(0.5, 5.0, size=B).astype(np.float32)
    got = np.asarray(
        proj_simplex_pallas(jnp.asarray(v), jnp.asarray(widths), jnp.asarray(radius),
                            tile=16, interpret=True)
    )
    for i in range(B):
        n = widths[i]
        want = radius[i] * proj_simplex_np(v[i, :n].astype(np.float64) / radius[i])
        np.testing.assert_allclose(got[i, :n], want, atol=3e-5)
        np.testing.assert_allclose(got[i, n:], 0.0)


def test_projection_kernel_dummy_rows():
    v = RNG.standard_normal((16, 4)).astype(np.float32)
    widths = np.array([4] * 8 + [0] * 8, np.int32)
    radius = np.ones(16, np.float32)
    got = np.asarray(
        proj_simplex_pallas(jnp.asarray(v), jnp.asarray(widths), jnp.asarray(radius),
                            tile=16, interpret=True)
    )
    np.testing.assert_allclose(got[8:], 0.0)
    np.testing.assert_allclose(got[:8].sum(-1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("w", [2, 6, 16, 33])
def test_pava_kernel_matches_reference(w):
    B = 40
    y = (RNG.standard_normal((B, w)) * 2).astype(np.float32)
    widths = RNG.integers(1, w + 1, size=B).astype(np.int32)
    radius = RNG.uniform(0.5, 3.0, size=B).astype(np.float32)
    got = np.asarray(
        pava_pallas(jnp.asarray(y), jnp.asarray(widths), jnp.asarray(radius),
                    tile=8, interpret=True)
    )
    for i in range(B):
        n = widths[i]
        want = pava_np(y[i, :n].astype(np.float64), lo=0.0, hi=float(radius[i]))
        np.testing.assert_allclose(got[i, :n], want, atol=3e-5)
        np.testing.assert_allclose(got[i, n:], 0.0)


def test_kernels_handle_non_tile_multiple_batch():
    B, w = 37, 8  # not a multiple of the tile
    v = RNG.standard_normal((B, w)).astype(np.float32)
    widths = np.full(B, w, np.int32)
    radius = np.ones(B, np.float32)
    got = np.asarray(
        proj_simplex_pallas(jnp.asarray(v), jnp.asarray(widths), jnp.asarray(radius),
                            tile=16, interpret=True)
    )
    assert got.shape == (B, w)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("w", [2, 5, 8])
def test_transposed_projection_kernel_matches_reference(w):
    """Lane-major variant (blocks on lanes): the production batched form."""
    B = 300
    v = (RNG.standard_normal((B, w)) * 3).astype(np.float32)
    widths = RNG.integers(1, w + 1, size=B).astype(np.int32)
    radius = RNG.uniform(0.5, 5.0, size=B).astype(np.float32)
    got = np.asarray(
        proj_simplex_pallas_t(jnp.asarray(v), jnp.asarray(widths),
                              jnp.asarray(radius), tile=128, interpret=True)
    )
    for i in range(0, B, 7):
        n = widths[i]
        want = radius[i] * proj_simplex_np(v[i, :n].astype(np.float64) / radius[i])
        np.testing.assert_allclose(got[i, :n], want, atol=3e-5)
        np.testing.assert_allclose(got[i, n:], 0.0)
