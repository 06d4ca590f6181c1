"""Tests for the problem model: partition, matrices, generators, oracle."""
import numpy as np
import pytest

from bsls_tpu.models import BlockPartition, EllMatrix, Problem, oracle_solve, synthetic
from bsls_tpu.models.oracle import fw_gap_np


def test_partition_uniform():
    p = BlockPartition.uniform(10, 4)
    assert p.num_blocks == 10 and p.n_flat == 40
    assert len(p.buckets) == 1
    b = p.buckets[0]
    assert b.width == 4 and b.num_blocks == 10
    assert (b.mask == 1.0).all()
    x = np.arange(40.0)
    xp = p.flat_to_padded_np(x)
    assert xp[0].shape == (10, 4)
    assert np.allclose(p.padded_to_flat_np(xp), x)


def test_partition_ragged_buckets_and_roundtrip():
    rng = np.random.default_rng(1)
    sizes = rng.integers(1, 33, size=57)
    p = BlockPartition.from_sizes(sizes, block_multiple=8)
    assert p.n_flat == sizes.sum()
    # every bucket's rows padded to multiple of 8
    for b in p.buckets:
        assert b.num_blocks % 8 == 0
        assert (b.sizes <= b.width).all()
    # roundtrip
    x = rng.standard_normal(p.n_flat)
    assert np.allclose(p.padded_to_flat_np(p.flat_to_padded_np(x)), x)
    # each real block appears exactly once across buckets
    ids = np.concatenate([b.block_ids[b.block_ids >= 0] for b in p.buckets])
    assert sorted(ids.tolist()) == list(range(57))


def test_ell_matrix_matches_scipy():
    import scipy.sparse as sp

    rng = np.random.default_rng(2)
    A = sp.random(50, 30, density=0.1, random_state=2, format="csr")
    E = EllMatrix.from_scipy(A)
    x = rng.standard_normal(30)
    r = rng.standard_normal(50)
    assert np.allclose(E.matvec(x), A @ x)
    assert np.allclose(E.rmatvec(r), A.T @ r)
    assert np.allclose(E.to_scipy().toarray(), A.toarray())


def test_ell_coalesce_merges_duplicates():
    """Duplicate (row, col) slots merge (vals sum), operator unchanged, and
    diag(A^T A) becomes exact — the silent pairwise-FW sizing bug the
    strengthened dryrun parity gate caught (round 3)."""
    rng = np.random.default_rng(7)
    rows = rng.integers(0, 20, size=(15, 6)).astype(np.int32)  # dups ~certain
    vals = np.where(rng.random((15, 6)) < 0.8, rng.uniform(0.5, 2, (15, 6)), 0.0)
    rows = np.where(vals != 0, rows, 0)
    E = EllMatrix(rows=rows, vals=vals, num_rows=20)
    Ec = E.coalesce()
    # operator identical
    x = rng.standard_normal(15)
    r = rng.standard_normal(20)
    assert np.allclose(Ec.matvec(x), E.matvec(x))
    assert np.allclose(Ec.rmatvec(r), E.rmatvec(r))
    # no duplicate coordinates among nonzero slots
    for j in range(15):
        nz = Ec.rows[j][Ec.vals[j] != 0]
        assert len(set(nz.tolist())) == len(nz)
    # diag(A^T A) from the coalesced slots is exact
    d = (Ec.vals**2).sum(axis=1)
    dense = Ec.to_scipy().toarray()
    assert np.allclose(d, (dense**2).sum(axis=0))
    # idempotent, k shrinks to the post-merge max
    assert Ec.coalesce().k == Ec.k


def test_problem_save_load_roundtrip(tmp_path):
    prob = synthetic.tiny_dense(seed=3, num_blocks=5, dim=4, m=12)
    path = str(tmp_path / "inst.npz")
    prob.save_npz(path)
    back = Problem.load(path)
    assert np.allclose(back.b, prob.b)
    assert np.allclose(back.A.data, prob.A.data)
    assert (back.partition.sizes == prob.partition.sizes).all()


def test_problem_save_load_sparse_constraints(tmp_path):
    """Sparse C must survive the .npz round trip WITHOUT densifying."""
    import scipy.sparse as sp

    base = synthetic.traffic_like(seed=2, num_blocks=12, m=40, num_eq=6,
                                  noise=1e-3)
    n = base.A.shape[1]
    rng = np.random.default_rng(0)
    C_sp = sp.random(6, n, density=0.1, random_state=rng, format="csr")
    prob = Problem.from_arrays(base.A, base.b, base.partition.sizes,
                               C=C_sp, d=np.zeros(6))
    assert isinstance(prob.C, EllMatrix)
    path = str(tmp_path / "eq.npz")
    prob.save_npz(path)
    back = Problem.load(path)
    assert isinstance(back.C, EllMatrix)
    assert np.allclose(back.C.to_scipy().toarray(), prob.C.to_scipy().toarray())
    assert np.allclose(back.d, prob.d)


def test_generators_feasible_and_shapes():
    t = synthetic.tiny_dense(num_blocks=10, dim=5, m=60)
    assert t.shape == (60, 50)
    assert t.x_true is not None
    # planted x feasible
    off = 0
    for n in t.partition.sizes:
        assert abs(t.x_true[off : off + n].sum() - 1) < 1e-9
        off += n

    msp = synthetic.medium_sparse(num_blocks=50, m=300)
    assert msp.shape[0] == 300
    assert isinstance(msp.A, EllMatrix)

    tr = synthetic.traffic_like(num_blocks=30, m=150, num_eq=6)
    assert tr.C is not None and tr.d is not None
    assert np.allclose(tr.C.matvec(tr.x_true), tr.d)

    lg = synthetic.large_sharded(num_blocks=64, dim=4, m=128, num_scenarios=3)
    assert lg.num_scenarios == 3
    assert lg.b.shape == (3, 128)


def test_oracle_certifies_tiny():
    prob = synthetic.tiny_dense(seed=0, num_blocks=20, dim=6, m=150)
    res = oracle_solve(prob, tol_gap=1e-10, max_iter=5000)
    assert res.gap <= 1e-10
    # objective must be <= objective at the planted point (noise floor)
    assert res.objective <= prob.objective_np(prob.x_true) + 1e-12
    # gap really certifies: perturbing increases objective beyond gap bound
    g = prob.gradient_np(res.x)
    assert fw_gap_np(g, res.x, prob.partition.sizes) <= 1e-9


@pytest.mark.slow
def test_eq_oracle_certifies():
    """Float64 AL oracle for config-3-style instances: near-zero objective
    on a noiseless planted instance, tight Lagrangian dual bound, and
    device-solve parity."""
    import bsls_tpu as bsls
    from bsls_tpu.models import oracle_solve_eq

    prob = synthetic.traffic_like(num_blocks=25, m=120, num_eq=6, noise=0.0)
    orc = oracle_solve_eq(prob, tol_eq=1e-10, tol_gap=1e-12)
    assert orc.objective <= 1e-12
    assert orc.eq_violation <= 1e-9
    assert orc.gap <= 1e-8  # sound bound: f(x) - f* <= gap
    # device AL solve matches the certified optimum
    res = bsls.solve(prob, method="lbfgs", tol=1e-8, max_iter=6000, chunk=200)
    rel = (float(np.asarray(res.objective)) - orc.objective) / 1.0
    assert abs(rel) < 1e-5


@pytest.mark.slow
def test_eq_oracle_matches_scipy_slsqp():
    """Independent cross-check: on a tiny noisy instance the AL oracle's
    constrained optimum must match scipy SLSQP (a completely different
    algorithm) to optimizer precision."""
    from scipy.optimize import LinearConstraint, minimize

    from bsls_tpu.models import oracle_solve_eq

    prob = synthetic.traffic_like(seed=6, num_blocks=6, m=30, num_eq=3,
                                  noise=0.2)
    orc = oracle_solve_eq(prob, tol_eq=1e-10, tol_gap=1e-12)

    A = prob.A.to_scipy().toarray() if hasattr(prob.A, "to_scipy") else prob.A.data
    C = prob.C.data if hasattr(prob.C, "data") else prob.C.to_scipy().toarray()
    b, d = np.asarray(prob.b, float), np.asarray(prob.d, float)
    n = A.shape[1]
    sizes = prob.partition.sizes
    # block sum-to-one rows
    S = np.zeros((len(sizes), n))
    off = 0
    for i, s in enumerate(sizes):
        S[i, off:off + s] = 1.0
        off += s

    def f(x):
        r = A @ x - b
        return 0.5 * float(r @ r)

    x0 = np.concatenate([np.full(int(s), 1.0 / s) for s in sizes])
    res = minimize(
        f, x0, jac=lambda x: A.T @ (A @ x - b), method="SLSQP",
        bounds=[(0.0, 1.0)] * n,
        constraints=[LinearConstraint(S, 1.0, 1.0), LinearConstraint(C, d, d)],
        options={"maxiter": 2000, "ftol": 1e-14},
    )
    assert res.success, res.message
    assert abs(orc.objective - res.fun) <= 1e-8 + 1e-6 * abs(res.fun), (
        orc.objective, res.fun)


def test_mat_loader_roundtrip(tmp_path):
    """Reference-style MATLAB instance files load through Problem.load."""
    from scipy.io import savemat
    import scipy.sparse as sp

    rng = np.random.default_rng(9)
    sizes = np.array([3, 4, 2])
    n = int(sizes.sum())
    A = sp.random(12, n, density=0.4, random_state=9, format="csr")
    x_true = np.concatenate([rng.dirichlet(np.ones(s)) for s in sizes])
    b = A @ x_true
    path = str(tmp_path / "inst.mat")
    savemat(path, {"A": A, "b": b, "block_sizes": sizes, "x_true": x_true})
    prob = Problem.load(path)
    assert prob.shape == (12, n)
    assert (prob.partition.sizes == sizes).all()
    np.testing.assert_allclose(prob.A.matvec(x_true), b, atol=1e-10)


def test_mat73_loader(tmp_path):
    """MATLAB v7.3 (HDF5) instances load too — scipy raises
    NotImplementedError on these; large real-network instances are saved
    with '-v7.3'.  The file is built with h5py in MATLAB's own layout:
    sparse = CSC components group with a MATLAB_sparse row-count attr,
    dense 2-D arrays stored transposed."""
    import h5py
    import scipy.sparse as sp

    rng = np.random.default_rng(11)
    sizes = np.array([3, 4, 2])
    n = int(sizes.sum())
    A = sp.random(12, n, density=0.5, random_state=11, format="csc")
    x_true = np.concatenate([rng.dirichlet(np.ones(s)) for s in sizes])
    b = A @ x_true
    C = rng.standard_normal((2, n))
    d = C @ x_true
    path = str(tmp_path / "inst73.mat")
    # mimic MATLAB -v7.3 layout, including the 512-byte userblock header
    # that makes scipy's loadmat raise NotImplementedError
    with h5py.File(path, "w", userblock_size=512) as f:
        g = f.create_group("A")
        g.attrs["MATLAB_sparse"] = np.uint64(A.shape[0])
        g.create_dataset("data", data=A.data)
        g.create_dataset("ir", data=A.indices.astype(np.uint64))
        g.create_dataset("jc", data=A.indptr.astype(np.uint64))
        f.create_dataset("b", data=b.reshape(1, -1))  # MATLAB column vec, transposed
        f.create_dataset("block_sizes", data=sizes.astype(np.float64).reshape(1, -1))
        f.create_dataset("C", data=C.T)  # dense 2-D stored transposed
        f.create_dataset("d", data=d.reshape(1, -1))
        f.create_dataset("x_true", data=x_true.reshape(1, -1))
    with open(path, "r+b") as fh:  # MATLAB 7.3 header in the userblock
        fh.write(b"MATLAB 7.3 MAT-file" + b" " * 105 + bytes([0, 2, ord("I"), ord("M")]))
    prob = Problem.load(path)
    assert prob.shape == (12, n)
    assert (prob.partition.sizes == sizes).all()
    np.testing.assert_allclose(prob.A.matvec(x_true), b, atol=1e-10)
    np.testing.assert_allclose(prob.C.matvec(x_true), d, atol=1e-10)
    np.testing.assert_allclose(prob.x_true, x_true, atol=1e-12)

    # single-ROW dense C: MATLAB (1, n) is stored as HDF5 (n, 1) and must
    # load as a 2-D (1, n) matrix, not get raveled to 1-D
    path1 = str(tmp_path / "inst73_c1.mat")
    with h5py.File(path1, "w") as f:
        g = f.create_group("A")
        g.attrs["MATLAB_sparse"] = np.uint64(A.shape[0])
        g.create_dataset("data", data=A.data)
        g.create_dataset("ir", data=A.indices.astype(np.uint64))
        g.create_dataset("jc", data=A.indptr.astype(np.uint64))
        f.create_dataset("b", data=b.reshape(1, -1))
        f.create_dataset("block_sizes", data=sizes.astype(np.float64).reshape(1, -1))
        f.create_dataset("C", data=C[:1].T)  # (n, 1) on disk
        f.create_dataset("d", data=d[:1].reshape(1, -1))
    prob1 = Problem.load(path1)
    assert prob1.C.shape == (1, n)
    np.testing.assert_allclose(prob1.C.matvec(x_true), d[:1], atol=1e-10)


def test_vstack_scaled_to_scipy():
    """VStack/Scaled wrappers expose to_scipy so the eq mesh refine path
    keeps the host CSR/native-SpMM fast path (ADVICE r4)."""
    import scipy.sparse as sp

    from bsls_tpu.models.problem import ScaledMatrix, VStackMatrix

    rng = np.random.default_rng(0)
    A = sp.random(12, 9, density=0.4, random_state=3, format="csr")
    C = sp.random(4, 9, density=0.5, random_state=4, format="csr")
    top = EllMatrix.from_scipy(A)
    vs = VStackMatrix(top=top, bottom=ScaledMatrix(EllMatrix.from_scipy(C), 2.5))
    M = vs.to_scipy()
    assert sp.issparse(M) and M.shape == (16, 9)
    x = rng.normal(size=9)
    np.testing.assert_allclose(M @ x, vs.matvec(x), atol=1e-12)
    r = rng.normal(size=16)
    np.testing.assert_allclose(M.T @ r, vs.rmatvec(r), atol=1e-12)
    # dense inner parts work too (DenseMatrix.to_scipy returns an ndarray)
    from bsls_tpu.models.problem import DenseMatrix

    vd = VStackMatrix(top=DenseMatrix(rng.normal(size=(5, 9))),
                      bottom=ScaledMatrix(DenseMatrix(rng.normal(size=(2, 9))), 0.5))
    Md = vd.to_scipy()
    np.testing.assert_allclose(np.asarray(Md @ x).ravel(), vd.matvec(x), atol=1e-12)
