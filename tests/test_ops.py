"""Tests for the XLA-level kernels against the numpy reference implementations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsls_tpu.models import BlockPartition, synthetic
from bsls_tpu.ops import (
    feasible_init,
    flat_to_padded,
    matvec,
    padded_to_flat,
    pava_padded,
    prepare,
    proj_simplex_padded,
    rmatvec,
)
from bsls_tpu.ops.layout import extract_user_flat as L_extract
from bsls_tpu.ops.simplex import block_min, eg_update_padded, fw_vertex_padded
from bsls_tpu.ops.ztransform import dz_adjoint_padded, x_to_z_padded, z_to_x_padded, zmask
from bsls_tpu.utils.refimpl import pava_np, proj_simplex_np

RNG = np.random.default_rng(7)


def _ragged_partition(n_blocks=37, lo=1, hi=20, block_multiple=4):
    sizes = RNG.integers(lo, hi + 1, size=n_blocks)
    return BlockPartition.from_sizes(sizes, block_multiple=block_multiple)


# ---------------- layout ----------------


def _dense_problem(part, m=5):
    from bsls_tpu.models.problem import DenseMatrix, Problem

    A = DenseMatrix(RNG.standard_normal((m, part.n_flat)))
    return Problem(A=A, b=np.zeros(m), partition=part)


def test_layout_pf_roundtrip_ragged():
    part = _ragged_partition()
    dp = prepare(_dense_problem(part), equilibrate=False)
    xp0 = feasible_init(dp)
    x_pf = padded_to_flat(dp, xp0)
    assert x_pf.shape == (part.padded_size,)
    xp1 = flat_to_padded(dp, x_pf)
    for a, b in zip(xp0, xp1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_extract_user_flat_matches_partition():
    part = _ragged_partition()
    dp = prepare(_dense_problem(part), equilibrate=False)
    # random feasible-ish padded value
    xp = tuple(
        jnp.asarray(RNG.standard_normal(bk.mask.shape).astype(np.float32)) * bk.mask
        for bk in dp.buckets
    )
    got = np.asarray(L_extract(dp, xp))
    want = part.padded_to_flat_np([np.asarray(x) for x in xp])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_matvec_matches_host_pf():
    prob = synthetic.medium_sparse(num_blocks=40, m=200)
    dp = prepare(prob, equilibrate=False)
    perm = np.asarray(dp.perm)
    sel = perm >= 0
    # unsharded ELL prepare row-nnz-buckets: device rows are permuted
    rp = np.arange(200) if dp.row_perm is None else np.asarray(dp.row_perm)
    x_user = RNG.standard_normal(prob.partition.n_flat)
    x_pf = np.zeros(perm.size, np.float32)
    x_pf[sel] = x_user[perm[sel]]
    got = np.asarray(matvec(dp.A, jnp.asarray(x_pf)))
    want = prob.A.matvec(x_user)[rp]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4 * np.abs(want).max())
    r = RNG.standard_normal(200)
    # rmatvec consumes r in device (permuted) row order
    got2 = np.asarray(rmatvec(dp.A, jnp.asarray(r[rp], dtype=jnp.float32)))
    want2 = prob.A.rmatvec(r)
    np.testing.assert_allclose(got2[sel], want2[perm[sel]], rtol=1e-4,
                               atol=1e-4 * np.abs(want2).max())
    # padding columns contribute nothing
    np.testing.assert_allclose(got2[~sel], 0.0)
    # b was permuted consistently at prepare
    np.testing.assert_allclose(np.asarray(dp.b), np.asarray(prob.b)[rp], rtol=1e-6)


def test_equilibrated_matvec_equivalence():
    """matvec on the equilibrated system at u = c*x equals A x."""
    prob = synthetic.medium_sparse(num_blocks=30, m=150)
    from bsls_tpu.ops.layout import block_scales

    dp = prepare(prob, equilibrate=True)
    c = block_scales(prob)
    col_scale = np.repeat(c, prob.partition.sizes)
    perm = np.asarray(dp.perm)
    sel = perm >= 0
    x_user = RNG.standard_normal(prob.partition.n_flat)
    u_pf = np.zeros(perm.size, np.float32)
    u_pf[sel] = (x_user * col_scale)[perm[sel]]
    got = np.asarray(matvec(dp.A, jnp.asarray(u_pf)))
    rp = np.arange(150) if dp.row_perm is None else np.asarray(dp.row_perm)
    want = prob.A.matvec(x_user)[rp]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4 * np.abs(want).max())


def test_feasible_init():
    part = _ragged_partition()
    dp = prepare(_dense_problem(part), equilibrate=False)
    x0 = feasible_init(dp)
    flat = np.asarray(L_extract(dp, x0))
    off = 0
    for n in part.sizes:
        np.testing.assert_allclose(flat[off : off + n].sum(), 1.0, rtol=1e-6)
        off += n


# ---------------- projection ----------------


@pytest.mark.parametrize("w", [1, 2, 7, 16, 64])
def test_projection_matches_reference(w):
    B = 33
    v = RNG.standard_normal((B, w)).astype(np.float32) * 3
    sizes = RNG.integers(1, w + 1, size=B)
    sizes[0] = w
    mask = (np.arange(w)[None, :] < sizes[:, None]).astype(np.float32)
    got = np.asarray(proj_simplex_padded(jnp.asarray(v), jnp.asarray(mask)))
    for i in range(B):
        want = proj_simplex_np(v[i, : sizes[i]].astype(np.float64))
        np.testing.assert_allclose(got[i, : sizes[i]], want, atol=2e-5)
        np.testing.assert_allclose(got[i, sizes[i] :], 0.0)


def test_projection_dummy_rows_and_batch():
    B, w = 8, 5
    v = RNG.standard_normal((3, B, w)).astype(np.float32)
    mask = np.ones((B, w), np.float32)
    mask[-1] = 0.0  # dummy row
    out = np.asarray(proj_simplex_padded(jnp.asarray(v), jnp.asarray(mask)))
    assert out.shape == (3, B, w)
    np.testing.assert_allclose(out[:, -1, :], 0.0)
    np.testing.assert_allclose(out[:, :-1, :].sum(-1), 1.0, rtol=1e-5)


# ---------------- isotonic / PAVA ----------------


@pytest.mark.parametrize("w", [1, 2, 3, 9, 32])
def test_pava_matches_reference(w):
    B = 29
    y = (RNG.standard_normal((B, w)) * 2).astype(np.float32)
    sizes = RNG.integers(1, w + 1, size=B)
    mask = (np.arange(w)[None, :] < sizes[:, None]).astype(np.float32)
    got = np.asarray(pava_padded(jnp.asarray(y), jnp.asarray(mask), lo=None, hi=None))
    for i in range(B):
        want = pava_np(y[i, : sizes[i]].astype(np.float64))
        np.testing.assert_allclose(got[i, : sizes[i]], want, atol=3e-5)


def test_pava_bounded_and_chunked():
    B, w = 600, 6
    y = RNG.standard_normal((B, w)).astype(np.float32) * 2
    mask = np.ones((B, w), np.float32)
    got = np.asarray(pava_padded(jnp.asarray(y), jnp.asarray(mask), lo=0.0, hi=1.0, chunk=128))
    for i in range(0, B, 97):
        want = pava_np(y[i].astype(np.float64), lo=0.0, hi=1.0)
        np.testing.assert_allclose(got[i], want, atol=3e-5)
    assert (got >= 0).all() and (got <= 1).all()
    d = np.diff(got, axis=-1)
    assert (d >= -1e-5).all()


def test_pava_order_simplex_projection_equals_pava():
    """Projection onto the order simplex == bounded isotonic regression."""
    w = 12
    y = RNG.standard_normal((50, w)).astype(np.float64)
    mask = np.ones((50, w), np.float32)
    got = np.asarray(pava_padded(jnp.asarray(y, dtype=jnp.float32), jnp.asarray(mask), 0.0, 1.0))
    # verify via KKT-free QP check on a few rows using scipy
    import scipy.optimize as opt

    for i in range(0, 50, 17):
        cons = [{"type": "ineq", "fun": (lambda x, j=j: x[j + 1] - x[j])} for j in range(w - 1)]
        res = opt.minimize(
            lambda x: 0.5 * np.sum((x - y[i]) ** 2),
            x0=np.clip(np.sort(y[i]), 0, 1),
            jac=lambda x: x - y[i],
            bounds=[(0, 1)] * w,
            constraints=cons,
            method="SLSQP",
            options={"maxiter": 400, "ftol": 1e-14},
        )
        np.testing.assert_allclose(got[i], res.x, atol=1e-4)


# ---------------- EG / FW ----------------


def test_eg_update_properties():
    B, w = 20, 6
    x = np.abs(RNG.standard_normal((B, w))).astype(np.float32)
    sizes = RNG.integers(1, w + 1, size=B)
    mask = (np.arange(w)[None, :] < sizes[:, None]).astype(np.float32)
    x = x * mask
    x = x / np.maximum(x.sum(-1, keepdims=True), 1e-9)
    g = RNG.standard_normal((B, w)).astype(np.float32)
    out = np.asarray(eg_update_padded(jnp.asarray(x), jnp.asarray(g), 0.5, jnp.asarray(mask)))
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)
    assert (out >= 0).all()
    np.testing.assert_allclose(out * (1 - mask), 0.0)
    # matches direct formula on a row
    i = 3
    direct = x[i, : sizes[i]] * np.exp(-0.5 * g[i, : sizes[i]])
    direct /= direct.sum()
    np.testing.assert_allclose(out[i, : sizes[i]], direct, rtol=1e-4, atol=1e-6)


def test_fw_vertex_and_block_min():
    B, w = 10, 7
    g = RNG.standard_normal((B, w)).astype(np.float32)
    sizes = RNG.integers(1, w + 1, size=B)
    mask = (np.arange(w)[None, :] < sizes[:, None]).astype(np.float32)
    s = np.asarray(fw_vertex_padded(jnp.asarray(g), jnp.asarray(mask)))
    m = np.asarray(block_min(jnp.asarray(g), jnp.asarray(mask)))
    for i in range(B):
        j = np.argmin(np.where(mask[i] > 0, g[i], np.inf))
        assert s[i, j] == 1.0 and s[i].sum() == 1.0
        np.testing.assert_allclose(m[i], g[i, : sizes[i]].min())


# ---------------- z transform ----------------


def test_z_roundtrip_padded():
    B, w = 15, 9
    sizes = RNG.integers(1, w + 1, size=B)
    mask = (np.arange(w)[None, :] < sizes[:, None]).astype(np.float32)
    x = np.abs(RNG.standard_normal((B, w))).astype(np.float32) * mask
    x = x / np.maximum(x.sum(-1, keepdims=True), 1e-9)
    z = x_to_z_padded(jnp.asarray(x), jnp.asarray(mask))
    zm = np.asarray(zmask(jnp.asarray(mask)))
    zn = np.asarray(z)
    # z monotone in [0,1] on valid slots
    for i in range(B):
        seg = zn[i][zm[i] > 0]
        assert (np.diff(seg) >= -1e-6).all()
        assert ((seg >= -1e-6) & (seg <= 1 + 1e-6)).all()
    x2 = np.asarray(z_to_x_padded(z, jnp.asarray(mask)))
    np.testing.assert_allclose(x2, x, atol=1e-6)


def test_dz_adjoint_is_true_adjoint():
    """<D z, g> == <z, D^T g> for the linearised map x = Dz + const."""
    B, w = 6, 8
    sizes = RNG.integers(2, w + 1, size=B)
    mask = (np.arange(w)[None, :] < sizes[:, None]).astype(np.float32)
    mj = jnp.asarray(mask)
    z = RNG.standard_normal((B, w)).astype(np.float32) * np.asarray(zmask(mj))
    g = RNG.standard_normal((B, w)).astype(np.float32) * mask

    def xz(zz):
        return z_to_x_padded(zz, mj)

    _, jvp = jax.jvp(xz, (jnp.asarray(z),), (jnp.asarray(z),))
    lhs = float(jnp.vdot(jvp, jnp.asarray(g)))
    rhs = float(jnp.vdot(jnp.asarray(z), dz_adjoint_padded(jnp.asarray(g), mj)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)
