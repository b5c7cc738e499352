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
