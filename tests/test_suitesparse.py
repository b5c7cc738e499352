"""SuiteSparse option-sweep tests (the reference's ctest matrix sweep).

Mirror of /root/reference/test/CMakeLists.txt:15-318: the reference
fetches 11 SuiteSparse matrices (download_mtx.sh) and registers 192
tests sweeping matching x compression x precision over them.  Here the
sweep runs over whatever ``tests/download_mtx.py`` has cached in
tests/data/suitesparse/ — each missing matrix SKIPS (this build
environment has zero egress), and the bundled pde900 from the reference
checkout joins the pool when present, so at least one real matrix always
exercises the sweep on the CI box.

Gate: componentwise scaled residual <= 1e2 * rel_tol, exactly the
reference's test criterion (test/test_sparse_seq.cpp:39-82).
"""
import os

import numpy as np
import pytest

from strumpack_tpu import (CompressionType, KrylovSolver, MatchingJob,
                           SparseSolver, SPOptions)
from strumpack_tpu.sparse.csr import CSRMatrix
from strumpack_tpu.utils.params import ReturnCode

SSDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                     "suitesparse")
NAMES = ["utm300", "mesh3e1", "t2dal", "bcsstk28", "cavity16",
         "bcsstm08", "sherman4", "rdb968", "cz10228", "cbuckle",
         "gemat11"]
PDE900 = "/root/reference/examples/sparse/data/pde900.mtx"

ERROR_TOL = 1e2


def _path(name):
    if name == "pde900":
        return PDE900
    return os.path.join(SSDIR, f"{name}.mtx")


def _load(name):
    p = _path(name)
    if not os.path.exists(p):
        pytest.skip(f"{name} not cached (run tests/download_mtx.py)")
    return CSRMatrix.from_matrix_market(p)


def _check(A, opts, seed=3):
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    rng = np.random.default_rng(seed)
    xex = rng.standard_normal(A.n)
    if np.iscomplexobj(A.data):
        xex = xex + 1j * rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS, rc
    res = A.max_scaled_residual(x, b)
    assert res <= ERROR_TOL * opts.rel_tol, res
    return s


@pytest.mark.parametrize("name", NAMES + ["pde900"])
@pytest.mark.parametrize("matching", [
    MatchingJob.NONE, MatchingJob.MAX_DIAGONAL_PRODUCT_SCALING])
def test_suitesparse_exact(name, matching):
    """Exact LU + iterative refinement, with/without MC64 scaling —
    test_sparse_seq's base sweep."""
    A = _load(name)
    if np.iscomplexobj(A.data):
        if matching != MatchingJob.NONE:
            pytest.skip("complex matching sweep covered separately")
        opts = SPOptions(rel_tol=1e-8, factor_dtype="complex128",
                         refine_dtype="complex128")
    else:
        opts = SPOptions(rel_tol=1e-10, matching=matching)
    _check(A, opts)


@pytest.mark.parametrize("name", NAMES + ["pde900"])
def test_suitesparse_blr(name):
    """BLR-compressed preconditioner + GMRES (the --sp_compression BLR
    column of the reference sweep)."""
    A = _load(name)
    if np.iscomplexobj(A.data):
        pytest.skip("complex BLR sweep out of scope for this harness")
    opts = SPOptions(rel_tol=1e-8, krylov_solver=KrylovSolver.PREC_GMRES,
                     compression=CompressionType.BLR,
                     compression_min_sep_size=64,
                     matching=MatchingJob.MAX_DIAGONAL_PRODUCT_SCALING)
    opts.blr.rel_tol = 1e-8
    _check(A, opts)


@pytest.mark.parametrize("name", NAMES + ["pde900"])
def test_suitesparse_mixed_precision(name):
    """f32 factor + f32x2 refinement: the SPD/mixed-precision column
    (test_SPD_mixedPrecision role) at the reference's double-precision
    residual gate."""
    A = _load(name)
    if np.iscomplexobj(A.data):
        pytest.skip("mixed-precision sweep is real-valued")
    opts = SPOptions(factor_dtype="float32", refine_dtype="float32x2",
                     rel_tol=1e-10, abs_tol=1e-12,
                     matching=MatchingJob.MAX_DIAGONAL_PRODUCT_SCALING)
    _check(A, opts)
