"""Option-matrix sweep (the reference registers 192 CTest cases sweeping
option combinations; this is the equivalent breadth test at small size)."""
import numpy as np
import pytest

from strumpack_tpu import (CompressionType, KrylovSolver, MatchingJob,
                           ReorderingStrategy, ReturnCode, SparseSolver,
                           SPOptions)
from strumpack_tpu.sparse.gen import poisson2d

A = poisson2d(20)
RNG = np.random.default_rng(0)
XEX = RNG.standard_normal(A.n)
B = A.spmv(XEX)


@pytest.mark.parametrize("compression", [CompressionType.NONE,
                                         CompressionType.BLR,
                                         CompressionType.LOSSY])
@pytest.mark.parametrize("krylov", [KrylovSolver.AUTO,
                                    KrylovSolver.PREC_GMRES,
                                    KrylovSolver.PREC_BICGSTAB])
def test_sweep_compression_krylov(compression, krylov):
    opts = SPOptions(compression=compression, krylov_solver=krylov,
                     compression_min_sep_size=32, rel_tol=1e-6)
    opts.blr.rel_tol = 1e-6
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    x, rc = s.solve(B)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, B) < 1e-4


@pytest.mark.parametrize("ordering", [ReorderingStrategy.ND,
                                      ReorderingStrategy.RCM,
                                      ReorderingStrategy.NATURAL])
@pytest.mark.parametrize("matching", [MatchingJob.NONE,
                                      MatchingJob.MAX_DIAGONAL_PRODUCT_SCALING])
@pytest.mark.parametrize("equil", [True, False])
def test_sweep_ordering_scaling(ordering, matching, equil):
    opts = SPOptions(reordering_method=ordering, matching=matching,
                     equilibration=equil, rel_tol=1e-8)
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    x, rc = s.solve(B)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, B) < 1e-6


@pytest.mark.parametrize("fd,rd", [("float64", "float64"),
                                   ("float32", "float64"),
                                   ("float32", "float32")])
def test_sweep_precision(fd, rd):
    rtol = 1e-10 if rd == "float64" else 1e-4
    opts = SPOptions(factor_dtype=fd, refine_dtype=rd, rel_tol=rtol)
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    x, rc = s.solve(B)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, B) < 1e2 * rtol


@pytest.mark.parametrize("compression", [CompressionType.HSS,
                                         CompressionType.HODLR,
                                         CompressionType.HODBF,
                                         CompressionType.BLR_HODLR,
                                         CompressionType.LOSSLESS])
def test_sweep_structured_compression(compression):
    opts = SPOptions(compression=compression, compression_min_sep_size=32,
                     krylov_solver=KrylovSolver.PREC_GMRES, rel_tol=1e-6)
    opts.hss.rel_tol = 1e-6
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    x, rc = s.solve(B)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, B) < 1e-4


@pytest.mark.parametrize("ordering", [ReorderingStrategy.AMD,
                                      ReorderingStrategy.MMD,
                                      ReorderingStrategy.SCOTCH,
                                      ReorderingStrategy.SPECTRAL])
def test_sweep_more_orderings(ordering):
    opts = SPOptions(reordering_method=ordering, rel_tol=1e-8)
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    x, rc = s.solve(B)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, B) < 1e-6


@pytest.mark.parametrize("gs", ["classical", "modified"])
@pytest.mark.parametrize("pivoting", [True, False])
def test_sweep_gs_pivoting(gs, pivoting):
    from strumpack_tpu import GramSchmidtType
    opts = SPOptions(krylov_solver=KrylovSolver.PREC_GMRES,
                     gram_schmidt=(GramSchmidtType.CLASSICAL
                                   if gs == "classical"
                                   else GramSchmidtType.MODIFIED),
                     pivoting=pivoting, rel_tol=1e-8)
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    x, rc = s.solve(B)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, B) < 1e-6


@pytest.mark.parametrize("flags", [
    ["--sp_compression", "blr", "--blr_rel_tol", "1e-6",
     "--sp_compression_min_sep_size", "32",
     "--sp_disable_separator_reordering"],
    ["--sp_Krylov_solver", "bicgstab", "--sp_rel_tol", "1e-8"],
    ["--sp_reordering_method", "rcm", "--sp_disable_replace_tiny_pivots"],
    ["--sp_matching", "5", "--sp_disable_equilibration"],
    ["--sp_enable_adaptive_rank", "--sp_compression", "blr",
     "--blr_enable_cb_compression", "--sp_compression_min_sep_size", "32"],
])
def test_sweep_cli_driven(flags):
    """Reference-style driveability: every configuration reachable from
    the command line (set_from_command_line role)."""
    opts = SPOptions(rel_tol=1e-6)
    rest = opts.set_from_command_line(flags)
    assert rest == [], rest
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    x, rc = s.solve(B)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, B) < 1e-3


def test_sweep_spd_cholesky():
    from strumpack_tpu.sparse.gen import random_spd
    S = random_spd(300, seed=1)
    b = S.spmv(np.ones(S.n))
    opts = SPOptions(positive_definite=True, symmetric=True, rel_tol=1e-10)
    s = SparseSolver(opts)
    s.set_csr_matrix(S)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    assert S.max_scaled_residual(x, b) < 1e-8
