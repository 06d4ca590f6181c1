"""Property tests for the numpy reference kernels (the oracles-of-oracles)."""
import numpy as np
import pytest

from bsls_tpu.utils.refimpl import (
    pava_blocks_np,
    pava_np,
    proj_blocks_np,
    proj_simplex_np,
    x_to_z_np,
    z_to_x_np,
)

RNG = np.random.default_rng(42)


def _kkt_check_simplex(v, x, tol=1e-9):
    """KKT for min ||x-v||^2 s.t. x>=0, sum x=1: exists tau with
    x_i = max(v_i - tau, 0); on support x_i = v_i - tau."""
    assert abs(x.sum() - 1.0) < tol
    assert (x >= -tol).all()
    support = x > tol
    tau = (v[support] - x[support]).mean()
    assert np.allclose(v[support] - tau, x[support], atol=1e-8)
    # off support: v_i - tau <= 0
    assert (v[~support] - tau <= tol).all()


@pytest.mark.parametrize("n", [1, 2, 3, 10, 100])
def test_proj_simplex_kkt(n):
    for _ in range(20):
        v = RNG.standard_normal(n) * RNG.uniform(0.1, 10)
        x = proj_simplex_np(v)
        _kkt_check_simplex(v, x)


def test_proj_simplex_idempotent_and_fixed_points():
    v = RNG.dirichlet(np.ones(20))
    assert np.allclose(proj_simplex_np(v), v, atol=1e-12)
    w = RNG.standard_normal(20)
    x = proj_simplex_np(w)
    assert np.allclose(proj_simplex_np(x), x, atol=1e-12)


def test_proj_simplex_nonexpansive():
    for _ in range(20):
        u, v = RNG.standard_normal(15), RNG.standard_normal(15)
        pu, pv = proj_simplex_np(u), proj_simplex_np(v)
        assert np.linalg.norm(pu - pv) <= np.linalg.norm(u - v) + 1e-12


def _pava_brute(y):
    """O(n^2) quadratic program via scipy for cross-check."""
    from scipy.optimize import lsq_linear  # noqa: F401  (presence check)
    import scipy.optimize as opt

    n = len(y)
    cons = [
        {"type": "ineq", "fun": (lambda x, i=i: x[i + 1] - x[i])} for i in range(n - 1)
    ]
    res = opt.minimize(
        lambda x: 0.5 * np.sum((x - y) ** 2),
        x0=np.sort(y),
        jac=lambda x: x - y,
        constraints=cons,
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-14},
    )
    return res.x


@pytest.mark.parametrize("n", [1, 2, 5, 12])
def test_pava_matches_qp(n):
    for _ in range(5):
        y = RNG.standard_normal(n)
        got = pava_np(y)
        want = _pava_brute(y)
        assert np.allclose(got, want, atol=1e-5)


def test_pava_properties():
    y = RNG.standard_normal(50)
    x = pava_np(y)
    assert (np.diff(x) >= -1e-12).all()  # monotone
    assert abs(x.sum() - y.sum()) < 1e-9  # mean-preserving within pools
    # already-monotone input is a fixed point
    z = np.sort(y)
    assert np.allclose(pava_np(z), z)
    # bounded version clips
    xb = pava_np(y, lo=0.0, hi=1.0)
    assert (xb >= 0).all() and (xb <= 1).all()
    assert (np.diff(xb) >= -1e-12).all()


def test_pava_decreasing():
    y = RNG.standard_normal(30)
    x = pava_np(y, increasing=False)
    assert (np.diff(x) <= 1e-12).all()
    assert np.allclose(x, -pava_np(-y))


def test_blockwise_helpers():
    sizes = np.array([3, 1, 7, 2])
    v = RNG.standard_normal(int(sizes.sum()))
    x = proj_blocks_np(v, sizes)
    off = 0
    for n in sizes:
        assert abs(x[off : off + n].sum() - 1.0) < 1e-9
        off += n
    z = pava_blocks_np(v, sizes)
    off = 0
    for n in sizes:
        seg = z[off : off + n]
        assert (np.diff(seg) >= -1e-12).all()
        assert (seg >= 0).all() and (seg <= 1).all()
        off += n


def test_xz_roundtrip():
    sizes = np.array([4, 2, 9, 1, 3])
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.dirichlet(np.ones(n)) for n in sizes])
    z = x_to_z_np(x, sizes)
    assert z.size == x.size - len(sizes)
    # z in the order simplex per block
    off = 0
    for n in sizes:
        seg = z[off : off + n - 1]
        assert (np.diff(seg) >= -1e-12).all()
        assert ((seg >= -1e-12) & (seg <= 1 + 1e-12)).all()
        off += n - 1
    x2 = z_to_x_np(z, sizes)
    assert np.allclose(x, x2, atol=1e-12)
