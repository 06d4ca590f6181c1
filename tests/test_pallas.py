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


@pytest.mark.parametrize("w", [2, 5, 8, 16])
def test_transposed_pava_kernel_matches_reference(w):
    """Lane-major PAVA variant (the production batched form)."""
    B = 260
    y = (RNG.standard_normal((B, w)) * 2).astype(np.float32)
    widths = RNG.integers(1, w + 1, size=B).astype(np.int32)
    radius = RNG.uniform(0.5, 3.0, size=B).astype(np.float32)
    from bsls_tpu.ops.pallas.pava_kernel import pava_pallas_t

    got = np.asarray(
        pava_pallas_t(jnp.asarray(y), jnp.asarray(widths), jnp.asarray(radius),
                      tile=128, interpret=True)
    )
    for i in range(0, B, 13):
        n = widths[i]
        want = np.clip(pava_np(y[i, :n].astype(np.float64)), 0, radius[i])
        np.testing.assert_allclose(got[i, :n], want, atol=3e-5)
        np.testing.assert_allclose(got[i, n:], 0.0)


@pytest.mark.parametrize("S", [1, 3])
def test_banded_page_kernels_match_einsum(S):
    """Pallas page-streaming banded contractions (ops/pallas/banded_kernels)
    vs the XLA einsum reference, interpret mode."""
    from bsls_tpu.ops.pallas.banded_kernels import band_grmv_pallas, band_zmv_pallas

    rng = np.random.default_rng(7)
    Mp, C, W = 6, 10, 32
    band = jnp.asarray(rng.standard_normal((Mp, C, W)), jnp.float32)
    xg = jnp.asarray(rng.standard_normal((S, Mp, C)), jnp.float32)
    rw = jnp.asarray(rng.standard_normal((S, Mp, W)), jnp.float32)
    z = band_zmv_pallas(band, xg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(jnp.einsum("gcw,sgc->sgw", band, xg)), atol=2e-5
    )
    g = band_grmv_pallas(band, rw, interpret=True)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(jnp.einsum("gcw,sgw->sgc", band, rw)), atol=2e-5
    )


def test_megastep_kernel_matches_xla_solver():
    """Whole-chunk PGD megakernel (ops/pallas/megastep_kernel) vs the XLA
    pgd/exact solver: identical init, t0 and step semantics, so the f-trace
    and final iterate must agree to fp32 tolerance over a full chunk."""
    from bsls_tpu.models import synthetic
    from bsls_tpu.ops import layout as L
    from bsls_tpu.ops.pallas.megastep_kernel import pgd_chunk_fused, split_slots
    from bsls_tpu.solvers.base import power_lipschitz, solve

    prob = synthetic.tiny_dense(seed=0, num_blocks=40, dim=8, m=320)
    dp = L.prepare(prob)
    assert len(dp.buckets) == 1
    L_est = power_lipschitz(dp)
    t0 = 1.0 / float(L_est)
    bk = dp.buckets[0]
    x0 = jnp.asarray(np.asarray(L.feasible_init(dp)[0]))
    B, w = bk.mask.shape
    A3, At3 = split_slots(dp.A.data, B, w)
    xk, ftr = pgd_chunk_fused(A3, At3, dp.b, x0, bk.sizes, bk.radius, t0,
                              steps=200, interpret=True)
    res = solve(dp, method="pgd", line_search="exact", max_iter=200, chunk=200,
                tol=0)
    fx = np.asarray(res.trace_f)
    fk = np.asarray(ftr)
    rel = np.abs(fk - fx) / np.maximum(1e-9, np.abs(fx))
    assert rel.max() < 1e-3, rel.max()
    from bsls_tpu.ops.layout import extract_user_flat

    x_kernel = np.asarray(extract_user_flat(dp, (xk,)))
    np.testing.assert_allclose(x_kernel, np.asarray(res.x), atol=2e-5)
    # feasibility: nonneg and per-block sums == radius
    x_bw, mask = np.asarray(xk), np.asarray(bk.mask)
    assert x_bw[mask > 0].min() >= 0
    np.testing.assert_allclose((x_bw * mask).sum(-1), np.asarray(bk.radius),
                               rtol=1e-5)
