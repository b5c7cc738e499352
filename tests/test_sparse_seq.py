"""End-to-end sparse solver tests.

Model: the reference's test/test_sparse_seq.cpp — build rhs from a known
random x_exact via spmv, run reorder/factor/solve, require componentwise
scaled residual < ERROR_TOLERANCE(1e2) * rel_tol (test_sparse_seq.cpp:39-82).
Matrices come from analytic stencil generators (the reference's
testPoisson2d/3d examples) plus the bundled pde900 matrix when available.
"""
import numpy as np
import pytest

from strumpack_tpu import (CompressionType, KrylovSolver, ReorderingStrategy,
                           ReturnCode, SparseSolver, SPOptions)
from strumpack_tpu.sparse.gen import poisson2d, poisson3d, random_spd

ERROR_TOL = 1e2


def check_solve(A, opts, nx=None, ny=None, nz=None, seed=0, nrhs=1):
    rng = np.random.default_rng(seed)
    n = A.n
    xex = rng.standard_normal((n, nrhs)) if nrhs > 1 else rng.standard_normal(n)
    b = A.spmv(xex)
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    if nx is not None:
        assert s.reorder(nx, ny, nz) == ReturnCode.SUCCESS
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    res = A.max_scaled_residual(x, b)
    assert res < ERROR_TOL * opts.rel_tol, f"scaled residual {res}"
    return s, x, xex


def test_poisson2d_geometric_direct():
    A = poisson2d(30)
    opts = SPOptions(krylov_solver=KrylovSolver.DIRECT)
    s, x, xex = check_solve(A, opts, nx=30, ny=30)
    # exact LU: machine-precision residual
    b = A.spmv(xex)
    assert A.max_scaled_residual(x, b) < 1e-13


def test_poisson2d_auto_refinement():
    A = poisson2d(30)
    opts = SPOptions()
    s, _, _ = check_solve(A, opts, nx=30, ny=30)
    assert s.Krylov_iterations() <= 2  # exact factor: IR converges instantly


def test_poisson2d_general_nd():
    A = poisson2d(25)
    opts = SPOptions(reordering_method=ReorderingStrategy.ND)
    check_solve(A, opts)


def test_poisson3d():
    A = poisson3d(10)
    opts = SPOptions()
    check_solve(A, opts, nx=10, ny=10, nz=10)


def test_gmres_unpreconditioned_vs_preconditioned():
    A = poisson2d(16)
    opts = SPOptions(krylov_solver=KrylovSolver.PREC_GMRES)
    s, _, _ = check_solve(A, opts, nx=16, ny=16)
    assert s.Krylov_iterations() <= 3


def test_bicgstab():
    A = poisson2d(16)
    opts = SPOptions(krylov_solver=KrylovSolver.PREC_BICGSTAB)
    s, _, _ = check_solve(A, opts, nx=16, ny=16)
    assert s.Krylov_iterations() <= 3


def test_multiple_rhs():
    A = poisson2d(12)
    opts = SPOptions(krylov_solver=KrylovSolver.DIRECT)
    check_solve(A, opts, nx=12, ny=12, nrhs=3)


def test_rcm_ordering():
    A = poisson2d(12)
    opts = SPOptions(reordering_method=ReorderingStrategy.RCM)
    check_solve(A, opts)


def test_amd_ordering():
    A = poisson2d(10)
    opts = SPOptions(reordering_method=ReorderingStrategy.AMD)
    check_solve(A, opts)


def test_natural_ordering():
    A = poisson2d(10)
    opts = SPOptions(reordering_method=ReorderingStrategy.NATURAL)
    check_solve(A, opts)


def test_random_spd():
    A = random_spd(200, seed=3)
    opts = SPOptions()
    check_solve(A, opts)


def test_unsymmetric_pattern():
    # pattern-unsymmetric matrix exercises symmetrize_sparsity
    rng = np.random.default_rng(7)
    from scipy.sparse import random as sprandom, eye
    n = 150
    B = sprandom(n, n, density=0.02, random_state=rng, format="csr")
    S = (B + eye(n, format="csr") * 10.0).tocsr()
    from strumpack_tpu.sparse.csr import CSRMatrix
    A = CSRMatrix.from_scipy(S)
    opts = SPOptions()
    check_solve(A, opts)


def test_structure_reuse_update_values():
    """update_matrix_values reuses symbolic analysis
    (reference test_structure_reuse_mpi.cpp analog)."""
    A = poisson2d(15)
    opts = SPOptions(krylov_solver=KrylovSolver.DIRECT)
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert A.max_scaled_residual(x, b) < 1e-13
    plan_before = s.plan
    # perturb values, same pattern
    A2 = A.copy()
    A2.data = A2.data * (1.0 + 0.01 * rng.standard_normal(A2.nnz))
    s.update_matrix_values(A2)
    b2 = A2.spmv(xex)
    x2, rc = s.solve(b2)
    assert s.plan is plan_before  # symbolic reused
    assert A2.max_scaled_residual(x2, b2) < 1e-12


def test_mixed_precision_f32_factor_f64_refine():
    """SparseSolverMixedPrecision analog: f32 factor + f64 IR to 1e-10."""
    A = poisson2d(20)
    opts = SPOptions(factor_dtype="float32", refine_dtype="float64",
                     rel_tol=1e-10, krylov_solver=KrylovSolver.REFINE)
    s, x, xex = check_solve(A, opts, nx=20, ny=20)
    b = A.spmv(xex)
    assert A.max_scaled_residual(x, b) < 1e-10
    assert 1 < s.Krylov_iterations() <= 10


def test_pde900_if_available():
    import os
    path = "/root/reference/examples/sparse/data/pde900.mtx"
    if not os.path.exists(path):
        pytest.skip("pde900.mtx not available")
    from strumpack_tpu.sparse.csr import CSRMatrix
    A = CSRMatrix.from_matrix_market(path)
    opts = SPOptions()
    check_solve(A, opts)


def test_cli_options():
    opts = SPOptions()
    rest = opts.set_from_command_line(
        ["prog", "--sp_rel_tol", "1e-8", "--sp_maxit=100",
         "--sp_reordering_method", "geometric", "--sp_nx", "16",
         "--sp_disable_equilibration", "--blr_leaf_size=64"])
    assert opts.rel_tol == 1e-8
    assert opts.maxit == 100
    assert opts.reordering_method == ReorderingStrategy.GEOMETRIC
    assert opts.nx == 16
    assert not opts.equilibration
    assert opts.blr.leaf_size == 64
    assert rest == ["prog"]


def test_mc64_matching_badly_scaled():
    """Max-product matching + scaling on a badly scaled unsymmetric matrix
    (MC64 job 5 analog, SparseSolverBase.cpp:327-334)."""
    from strumpack_tpu import MatchingJob
    rng = np.random.default_rng(11)
    n = 120
    from scipy.sparse import random as sprandom, csr_matrix
    import scipy.sparse as sp
    B = sprandom(n, n, density=0.03, random_state=rng, format="lil")
    # badly scaled, diagonal shifted off: put big entries on a permuted diag
    p = rng.permutation(n)
    for i in range(n):
        B[i, p[i]] = 10.0 ** rng.integers(2, 8)
    A = None
    from strumpack_tpu.sparse.csr import CSRMatrix
    A = CSRMatrix.from_scipy(csr_matrix(B))
    opts = SPOptions(matching=MatchingJob.MAX_DIAGONAL_PRODUCT_SCALING,
                     rel_tol=1e-10)
    s, x, xex = check_solve(A, opts, seed=2)
    # and structure reuse with matching active
    A2 = A.copy()
    A2.data = A2.data * (1.0 + 1e-3 * np.random.default_rng(5).standard_normal(A2.nnz))
    s.update_matrix_values(A2)
    b2 = A2.spmv(xex)
    x2, rc = s.solve(b2)
    assert A2.max_scaled_residual(x2, b2) < ERROR_TOL * opts.rel_tol


def test_helmholtz_complex():
    """Complex (Helmholtz) solve — examples/sparse/testHelmholtz analog."""
    from strumpack_tpu.sparse.gen import helmholtz3d
    A = helmholtz3d(10, k0=8.0)
    opts = SPOptions(factor_dtype="complex128", refine_dtype="complex128")
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n) + 1j * rng.standard_normal(A.n)
    b = A.spmv(xex)
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, b) < 1e-10


def test_spd_cholesky_path():
    """SPD Cholesky fronts — test_SPD_seq analog."""
    A = poisson2d(25)
    opts = SPOptions(symmetric=True, positive_definite=True,
                     krylov_solver=KrylovSolver.DIRECT)
    s, x, xex = check_solve(A, opts, nx=25, ny=25)
    b = A.spmv(xex)
    assert A.max_scaled_residual(x, b) < 1e-13
    npos, nneg, nzero, rc = s.inertia()
    assert nneg == 0 and nzero == 0 and npos == A.n


def test_inertia_indefinite():
    """Inertia of an indefinite diagonal-dominant symmetric matrix."""
    import scipy.sparse as sp
    n = 50
    d = np.concatenate([np.full(30, 5.0), np.full(20, -5.0)])
    rng = np.random.default_rng(1)
    B = sp.random(n, n, density=0.05, random_state=rng)
    S = sp.csr_matrix(sp.diags(d)) + 0.1 * (B + B.T)
    from strumpack_tpu.sparse.csr import CSRMatrix
    A = CSRMatrix.from_scipy(sp.csr_matrix(S))
    s = SparseSolver(SPOptions(equilibration=False))
    s.set_csr_matrix(A)
    s.factor()
    npos, nneg, nzero, rc = s.inertia()
    # diagonal dominance keeps inertia exact modulo pivoting
    assert npos + nneg == n
    assert abs(npos - 30) <= 2 and abs(nneg - 20) <= 2
    assert s.pivot_growth() < 100.0


def test_spd_mixed_precision():
    """test_SPD_mixedPrecision analog: f32 Cholesky + f64 refinement."""
    A = poisson2d(20)
    opts = SPOptions(symmetric=True, positive_definite=True,
                     factor_dtype="float32", refine_dtype="float64",
                     rel_tol=1e-12, krylov_solver=KrylovSolver.REFINE)
    s, x, xex = check_solve(A, opts, nx=20, ny=20)
    b = A.spmv(xex)
    assert A.max_scaled_residual(x, b) < 1e-12


def test_lossy_factor_compression():
    """FrontLossy analog: quantized factor storage + IR recovery —
    bf16 (2x), int8 + per-row scales (~4x), nibble-packed int4 (~8x)."""
    from strumpack_tpu import CompressionType
    A = poisson2d(30)
    for bits in (16, 8, 4):
        opts = SPOptions(compression=CompressionType.LOSSY,
                         compression_min_sep_size=16, lossy_precision=bits,
                         rel_tol=1e-8)
        s, x, xex = check_solve(A, opts, nx=30, ny=30)
        assert s.Krylov_iterations() >= 1


def test_hss_fronts():
    """HSS-compressed root fronts (FrontHSS role) + GMRES refinement —
    BASELINE config 3 analog (small)."""
    from strumpack_tpu import CompressionType
    A = poisson2d(40)
    opts = SPOptions(compression=CompressionType.HSS,
                     compression_min_sep_size=32, rel_tol=1e-6)
    opts.hss.rel_tol = 1e-6
    opts.hss.leaf_size = 16
    opts.hss.max_rank = 16
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder(40, 40)
    nhss = sum(1 for lvl in s.plan.levels for bp in lvl if bp.hss)
    assert nhss > 0, "no HSS buckets selected"
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, b) < 1e2 * opts.rel_tol
    assert s.Krylov_iterations() < 30


def test_hss_sampling_root_front():
    """Sampling-constructed HSS root front (FrontHSS::random_sampling role,
    FrontHSS.cpp:241): the root separator block is compressed from matvec
    samples (ELL spmv + child-CB products) + element extraction, never
    assembled dense."""
    from strumpack_tpu import CompressionType
    A = poisson2d(40)
    opts = SPOptions(compression=CompressionType.HSS,
                     compression_min_sep_size=32, rel_tol=1e-6)
    opts.hss.rel_tol = 1e-8
    opts.hss.leaf_size = 16
    opts.hss.max_rank = 16
    opts.hss.sampling = True
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder(40, 40)
    nsamp = sum(1 for lvl in s.plan.levels for bp in lvl if bp.hss_sample)
    assert nsamp == 1, "root front not selected for sampling construction"
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, b) < 1e2 * opts.rel_tol
    assert s.Krylov_iterations() < 30


def test_hss_sampling_with_scaling():
    """Sampling root front composed with matching + equilibration (the ELL
    value indices must point at the permuted+scaled values array)."""
    from strumpack_tpu import CompressionType, MatchingJob
    A = poisson2d(32)
    opts = SPOptions(compression=CompressionType.HSS,
                     compression_min_sep_size=32, rel_tol=1e-6,
                     matching=MatchingJob.MAX_DIAGONAL_PRODUCT_SCALING)
    opts.hss.rel_tol = 1e-8
    opts.hss.leaf_size = 16
    opts.hss.max_rank = 16
    opts.hss.sampling = True
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder(32, 32)
    assert sum(1 for lvl in s.plan.levels for bp in lvl if bp.hss_sample) == 1
    rng = np.random.default_rng(1)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, b) < 1e2 * opts.rel_tol


def test_hodlr_fronts():
    """HODLR-compressed root fronts (FrontHODLR role)."""
    from strumpack_tpu import CompressionType
    A = poisson2d(40)
    opts = SPOptions(compression=CompressionType.HODLR,
                     compression_min_sep_size=32, rel_tol=1e-6)
    opts.hss.rel_tol = 1e-6
    opts.hss.leaf_size = 16
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder(40, 40)
    assert sum(1 for lvl in s.plan.levels for bp in lvl if bp.hodlr) > 0
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, b) < 1e2 * opts.rel_tol


def test_hodbf_fronts():
    """HODBF fronts (FrontHODLR with butterfly levels, FrontHODLR.cpp
    compress F12/F21 as ButterflyMatrix): interior fronts store
    F11^-1 F12 / F21 as rectangular butterfly factorizations."""
    from strumpack_tpu import CompressionType
    from strumpack_tpu.sparse.gen import poisson3d
    A = poisson3d(16)
    opts = SPOptions(compression=CompressionType.HODBF,
                     compression_min_sep_size=64, rel_tol=1e-6)
    opts.hss.rel_tol = 1e-8
    opts.hss.leaf_size = 32
    opts.hss.max_rank = 32
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder(16, 16, 16)
    hodbf_bps = [bp for lvl in s.plan.levels for bp in lvl if bp.hodbf]
    assert hodbf_bps, "no HODBF fronts selected"
    # at least one interior front must actually use the butterfly pair
    assert any(bp.bf_D >= 2 and bp.u_pad > 0 for bp in hodbf_bps)
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, b) < 1e2 * opts.rel_tol


def test_hodbf_cli_flags():
    """--sp_compression hodbf and the --hodlr_* knobs parse (reference
    HODLROptions CLI role)."""
    opts = SPOptions()
    rest = opts.set_from_command_line(
        ["--sp_compression", "hodbf", "--hodlr_leaf_size", "64",
         "--hodlr_rel_tol", "1e-7", "--hodlr_butterfly_levels", "2"])
    assert rest == []
    from strumpack_tpu import CompressionType
    assert opts.compression == CompressionType.HODBF
    assert opts.hss.leaf_size == 64
    assert opts.hss.rel_tol == 1e-7
    assert opts.hodlr_butterfly_levels == 2


def test_matrix_io_roundtrip(tmp_path):
    """Matrix-market read/write round trip (test_matrix_IO.cpp analog)."""
    from strumpack_tpu.sparse.csr import CSRMatrix
    A = poisson2d(12)
    p = str(tmp_path / "a.mtx")
    A.write_matrix_market(p)
    B = CSRMatrix.from_matrix_market(p)
    assert B.n == A.n and B.nnz == A.nnz
    assert np.allclose(B.data, A.data)
    assert np.array_equal(B.colind, A.colind)


def test_draw(tmp_path):
    """Factor-layout visualization (EliminationTree::draw parity)."""
    A = poisson2d(10)
    s = SparseSolver(SPOptions())
    s.set_csr_matrix(A)
    p = str(tmp_path / "layout.dat")
    s.draw(p)
    lines = open(p).readlines()
    assert len(lines) > 10


def test_top_level_exports():
    import strumpack_tpu as st
    for name in st.__all__:
        assert hasattr(st, name), name


def test_options_help(capsys):
    opts = SPOptions()
    opts.set_from_command_line(["--help"])
    out = capsys.readouterr().out
    assert "--sp_Krylov_solver" in out and "--blr_" in out


def test_hss_fronts_batched():
    """HSS fronts with batched (nf > 1) buckets via vmap."""
    from strumpack_tpu import CompressionType
    A = poisson3d(12)
    opts = SPOptions(compression=CompressionType.HSS,
                     compression_min_sep_size=32, rel_tol=1e-6)
    opts.hss.rel_tol = 1e-7
    opts.hss.leaf_size = 16
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder(12, 12, 12)
    batched = [bp for lvl in s.plan.levels for bp in lvl
               if bp.hss and bp.nf > 1]
    assert batched, "no batched HSS buckets in this configuration"
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, b) < 1e2 * opts.rel_tol


def test_equilibration_types():
    """ROW fixes row-scaled pathology, COLUMN fixes column-scaled, BOTH
    fixes either (EquilibrationType semantics)."""
    from strumpack_tpu import EquilibrationType
    import scipy.sparse as sp
    from strumpack_tpu.sparse.csr import CSRMatrix
    rng = np.random.default_rng(9)
    n = 80
    D = sp.diags(10.0 ** rng.integers(-4, 4, n))
    M = sp.random(n, n, density=0.1, random_state=rng) + 10.0 * sp.eye(n)
    row_bad = CSRMatrix.from_scipy((D @ M).tocsr())
    col_bad = CSRMatrix.from_scipy((M @ D).tocsr())
    cases = [(EquilibrationType.ROW, row_bad),
             (EquilibrationType.COLUMN, col_bad),
             (EquilibrationType.BOTH, row_bad),
             (EquilibrationType.BOTH, col_bad)]
    for et, A in cases:
        opts = SPOptions(equilibration_type=et, rel_tol=1e-10,
                         replace_tiny_pivots=False)
        check_solve(A, opts, seed=4)


def test_solve_with_initial_guess():
    A = poisson2d(15)
    rng = np.random.default_rng(3)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    opts = SPOptions(rel_tol=1e-10, verbose=True)  # verbose -> host loop
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    import io, contextlib
    with contextlib.redirect_stdout(io.StringIO()):
        x, rc = s.solve(b, x0=xex + 1e-3 * rng.standard_normal(A.n))
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, b) < 1e-8


def test_double_float_refinement():
    """f32 factor + double-float (f32x2) IR: f64-quality residual with
    f32-only arithmetic — the TPU path to the reference's 1e-10 residual
    contract (twofloat.py)."""
    A = poisson2d(25)
    opts = SPOptions(factor_dtype="float32", refine_dtype="float32x2",
                     rel_tol=1e-12, abs_tol=1e-13)
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    res = A.max_scaled_residual(x, b)
    assert res < 1e-11, res
    assert s.Krylov_iterations() <= 5


def test_hss_sampling_interior_fronts():
    """Sampling-constructed INTERIOR HSS fronts (FrontHSS::Schur_update /
    Theta-Phi role): fronts with a non-empty contribution block are built
    from matvec samples + element extraction — F11 as sampled HSS, F12/F21
    as randomized interpolative low-rank factors, CB = F22 - X21 (F21r W)
    F12r — never assembling the dense (s+u)^2 front."""
    from strumpack_tpu import CompressionType
    A = poisson2d(64)
    opts = SPOptions(compression=CompressionType.HSS,
                     compression_min_sep_size=30, rel_tol=1e-6)
    opts.hss.rel_tol = 1e-8
    opts.hss.leaf_size = 16
    opts.hss.max_rank = 24
    opts.hss.sampling = True
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder(64, 64)
    samp = [bp for lvl in s.plan.levels for bp in lvl if bp.hss_sample]
    interior = [bp for bp in samp if bp.u_pad > 0]
    assert interior, "no interior sampling fronts selected"
    assert any(bp.nf_real > 1 for bp in samp) or len(samp) > 1
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, b) < 1e2 * opts.rel_tol
    assert s.Krylov_iterations() < 40


def test_binary_io_roundtrip(tmp_path):
    """CSR binary save/load round trip (CSRMatrix binary IO role)."""
    from strumpack_tpu.sparse.csr import CSRMatrix
    A = poisson2d(10)
    p = str(tmp_path / "a.npz")
    A.save_binary(p)
    B = CSRMatrix.from_binary(p)
    assert B.n == A.n and B.nnz == A.nnz
    assert np.array_equal(B.rowptr, A.rowptr)
    assert np.array_equal(B.colind, A.colind)
    assert np.array_equal(B.data, A.data)


def test_subnormals_diagnostic():
    """Subnormal count of the factors (SparseSolverBase.hpp:368-372)."""
    A = poisson2d(12)
    s = SparseSolver(SPOptions())
    s.set_csr_matrix(A)
    assert s.subnormals() == 0  # well-scaled Poisson: no subnormals


def test_blr_hodlr_composite():
    """BLR_HODLR / ZFP_BLR_HODLR composite schemes (FrontFactory.hpp:92-124):
    large fronts HODLR, medium BLR, small lossy/dense per thresholds."""
    from strumpack_tpu.sparse.gen import poisson3d
    A = poisson3d(16)
    opts = SPOptions(compression=CompressionType.ZFP_BLR_HODLR,
                     compression_min_sep_size=64, rel_tol=1e-4)
    opts.hodlr_min_sep_size = 256
    opts.lossy_min_sep_size = 8
    opts.hss.rel_tol = 1e-8
    opts.hss.leaf_size = 32
    opts.blr.rel_tol = 1e-8
    opts.blr.leaf_size = 32
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder(16, 16, 16)
    kinds = {"hodlr": 0, "blr": 0, "lossy": 0}
    for lvl in s.plan.levels:
        for bp in lvl:
            if bp.hodlr:
                kinds["hodlr"] += 1
            elif bp.blr:
                kinds["blr"] += 1
            elif bp.lossy:
                kinds["lossy"] += 1
    assert kinds["hodlr"] >= 1 and kinds["blr"] >= 1 and kinds["lossy"] >= 1, kinds
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, b) < ERROR_TOL * opts.rel_tol

    # LOSSLESS: accepted, exact factors (ZFP reversible role)
    opts2 = SPOptions(compression=CompressionType.LOSSLESS)
    rest = opts2.set_from_command_line(["--sp_compression", "lossless"])
    assert rest == [] and opts2.compression == CompressionType.LOSSLESS
    s2 = SparseSolver(opts2)
    s2.set_csr_matrix(poisson2d(16))
    A2 = poisson2d(16)
    b2 = A2.spmv(np.ones(A2.n))
    x2, rc2 = s2.solve(b2)
    assert rc2 == ReturnCode.SUCCESS
    assert A2.max_scaled_residual(x2, b2) < 1e-12


def test_blocked_multirhs_refine():
    """nrhs=16 through ONE device-IR iteration stream (the reference's
    DenseMatrix-rhs solvers, IterativeSolvers.hpp:56-141)."""
    A = poisson2d(24)
    opts = SPOptions(krylov_solver=KrylovSolver.REFINE,
                     factor_dtype="float32", rel_tol=1e-10)
    s, x, xex = check_solve(A, opts, nx=24, ny=24, nrhs=16)
    assert x.shape == (A.n, 16)
    # one shared iteration stream: its is per-stream, not summed per rhs
    assert 1 <= s.its <= opts.maxit


def test_blocked_multirhs_gmres():
    """nrhs=8 via the vmapped on-device GMRES (one program, per-column
    convergence)."""
    A = poisson2d(20)
    opts = SPOptions(krylov_solver=KrylovSolver.PREC_GMRES,
                     factor_dtype="float32", rel_tol=1e-8,
                     compression=CompressionType.BLR)
    opts.blr.rel_tol = 1e-6
    opts.compression_min_sep_size = 64
    s, x, xex = check_solve(A, opts, nx=20, ny=20, nrhs=8)
    assert x.shape == (A.n, 8)
    assert 1 <= s.its <= opts.maxit


def test_separator_reordering_composes():
    """Separator reordering (MatrixReordering.cpp:159 role) composes into
    the global permutation without changing the answer, and can be
    disabled by flag."""
    A = poisson3d(14)
    for flag in (True, False):
        opts = SPOptions(compression=CompressionType.BLR,
                         compression_min_sep_size=64,
                         krylov_solver=KrylovSolver.PREC_GMRES,
                         rel_tol=1e-6, separator_reordering=flag)
        opts.blr.rel_tol = 1e-6
        check_solve(A, opts, nx=14, ny=14, nz=14)
    o = SPOptions()
    rest = o.set_from_command_line(["--sp_disable_separator_reordering"])
    assert rest == [] and o.separator_reordering is False


def test_adaptive_rank_restart():
    """Adaptive rank control (HSSMatrix.compress.hpp:37-100 d0+dd role):
    with a deliberately too-small BLR rank cap, the fixed-rank path loses
    accuracy silently; the adaptive path detects cap saturation, doubles
    the caps, re-traces, and meets the residual contract with no
    hand-tuned max_rank."""
    A = poisson3d(12)
    rng = np.random.default_rng(3)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)

    def run(adaptive):
        opts = SPOptions(compression=CompressionType.BLR,
                         compression_min_sep_size=32,
                         krylov_solver=KrylovSolver.DIRECT,
                         rel_tol=1e-8, adaptive_rank=adaptive)
        opts.blr.rel_tol = 1e-8
        opts.blr.max_rank = 4          # deliberately saturating
        s = SparseSolver(opts)
        s.set_csr_matrix(A)
        assert s.reorder(12, 12, 12) == ReturnCode.SUCCESS
        x, rc = s.solve(b)
        return A.max_scaled_residual(x, b), s

    res_fixed, s0 = run(False)
    res_adapt, s1 = run(True)
    assert s0.fac.rank_saturated()
    assert res_adapt < ERROR_TOL * 1e-8, res_adapt
    assert res_adapt < res_fixed / 10, (res_fixed, res_adapt)


def test_blr_compressed_cb_and_hbm_budget(monkeypatch):
    """Memory-scalable fronts (VERDICT items: FrontBLR F22blr_ +
    FrontGPU split_smaller roles): BLR-compressed contribution blocks
    complete within the residual contract with lower projected peak
    memory, and a tiny HBM budget degrades to split-program mode instead
    of crashing."""
    from strumpack_tpu.frontal import numeric
    A = poisson3d(16)
    b = A.spmv(np.ones(A.n))
    peaks = {}
    for cbc in (False, True):
        opts = SPOptions(compression=CompressionType.BLR,
                         compression_min_sep_size=64,
                         krylov_solver=KrylovSolver.PREC_GMRES,
                         rel_tol=1e-6)
        opts.blr.rel_tol = 1e-5
        opts.blr.cb_compression = cbc
        s = SparseSolver(opts)
        s.set_csr_matrix(A)
        assert s.reorder(16, 16, 16) == ReturnCode.SUCCESS
        x, rc = s.solve(b)
        assert rc == ReturnCode.SUCCESS
        assert A.max_scaled_residual(x, b) < ERROR_TOL * opts.rel_tol
        peaks[cbc] = numeric.factor_peak_bytes(s.pdev, 8)
    assert peaks[True] <= peaks[False]
    # CLI flag parses
    o = SPOptions()
    assert o.set_from_command_line(["--blr_enable_cb_compression"]) == []
    assert o.blr.cb_compression is True

    # HBM-budget degradation: whole-program peak over budget -> split
    # mode, same answer
    monkeypatch.setenv("STRUMPACK_TPU_HBM_GB", "0.01")
    opts = SPOptions(krylov_solver=KrylovSolver.DIRECT)
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    assert s.reorder(16, 16, 16) == ReturnCode.SUCCESS
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, b) < 1e-12
