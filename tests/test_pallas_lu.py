"""Pallas batched small-front LU kernel (interpret mode on CPU).

The fused assembly-level kernel (ops/pallas_lu.py) is the TPU analog of the
reference's batched in-shared-memory front LU (FrontCUDA.cu:234-309).  On
CPU it runs under the Pallas interpreter; the same math is exercised on the
real chip by the factor path (verified on hardware, see PERF.md).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from strumpack_tpu.ops.pallas_lu import (nopivot_factor_bucket_xla,
                                         pallas_factor_bucket,
                                         unpack_factors)


def _check_packed(F, packed, perm, s):
    """Verify P F11 = L U, U12 = L^-1 P F12, L21 = F21 U^-1, CB = Schur."""
    nf, p, _ = F.shape
    errs = []
    for i in range(0, nf, max(1, nf // 5)):
        A = F[i].astype(np.float64)
        lu = np.asarray(packed[i], np.float64)
        pm = np.asarray(perm[i])
        L = np.tril(lu[:s, :s], -1) + np.eye(s)
        U = np.triu(lu[:s, :s])
        errs.append(np.abs(L @ U - A[pm[:s], :s]).max())
        if p > s:
            cb_ref = (A[s:, s:]
                      - A[s:, :s] @ np.linalg.solve(A[:s, :s], A[:s, s:]))
            errs.append(np.abs(lu[s:, s:] - cb_ref).max())
            errs.append(np.abs(L @ lu[:s, s:] - A[pm[:s], s:]).max())
    return max(errs)


@pytest.mark.parametrize("pivot", [True, False])
@pytest.mark.parametrize("nf,p,s", [(9, 16, 12), (3, 32, 24), (1, 8, 8)])
def test_pallas_lu_interpret(pivot, nf, p, s):
    rng = np.random.default_rng(nf * p + pivot)
    F = rng.standard_normal((nf, p, p)).astype(np.float32)
    if not pivot:  # diagonally dominant so no-pivot elimination is stable
        F += np.eye(p, dtype=np.float32) * 8
    packed, perm = pallas_factor_bucket(
        jnp.asarray(F), thresh=0.0, s_pad=s, pivot=pivot, interpret=True)
    # f32 elimination of random (cond up to ~1e3) fronts: rounding alone
    # gives ~cond*eps errors; an algorithmic bug would give O(1)
    assert _check_packed(F, np.asarray(packed), np.asarray(perm), s) < 5e-3


def test_pallas_lu_pivot_order():
    # a matrix that *requires* row pivoting: no-pivot would blow up
    A = np.array([[1e-7, 1.0], [1.0, 1.0]], np.float32)
    packed, perm = pallas_factor_bucket(
        jnp.asarray(A[None]), s_pad=2, pivot=True, interpret=True)
    assert list(np.asarray(perm[0])) == [1, 0]
    U = np.triu(np.asarray(packed[0]))
    assert abs(U[0, 0]) == 1.0


def test_nopivot_xla_matches_dense():
    rng = np.random.default_rng(3)
    nf, p, s = 5, 24, 16
    F = (rng.standard_normal((nf, p, p)) + np.eye(p) * 10)
    packed = nopivot_factor_bucket_xla(jnp.asarray(F), 0.0, s)
    lu, L21, U12, CB = unpack_factors(packed, s)
    i = 2
    A = F[i]
    L = np.tril(np.asarray(lu[i]), -1) + np.eye(s)
    U = np.triu(np.asarray(lu[i]))
    assert np.abs(L @ U - A[:s, :s]).max() < 1e-10
    cb_ref = A[s:, s:] - A[s:, :s] @ np.linalg.solve(A[:s, :s], A[:s, s:])
    assert np.abs(np.asarray(CB[i]) - cb_ref).max() < 1e-9


def test_tiny_pivot_replacement():
    # exactly singular leading block: threshold replacement keeps the
    # elimination finite (SparseSolverBase.cpp:346-350 behavior)
    A = np.zeros((4, 4), np.float32)
    A[2, 2] = A[3, 3] = 1.0
    packed, perm = pallas_factor_bucket(
        jnp.asarray(A[None]), thresh=1e-3, s_pad=4, pivot=True,
        interpret=True)
    d = np.abs(np.diag(np.asarray(packed[0])))
    assert (d >= 1e-3 - 1e-7).all() and np.isfinite(np.asarray(packed)).all()


def test_solver_nopivot_end_to_end():
    from strumpack_tpu import KrylovSolver, SparseSolver, SPOptions
    from strumpack_tpu.sparse.gen import poisson2d
    A = poisson2d(20)
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    opts = SPOptions(krylov_solver=KrylovSolver.DIRECT)
    opts.pivoting = False
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    x, rc = s.solve(b)
    assert A.max_scaled_residual(x, b) < 1e-8


@pytest.mark.parametrize("pivot", [True, False])
@pytest.mark.parametrize("nf,p,s", [(5, 16, 8), (3, 48, 16), (2, 96, 32)])
def test_pallas_cross_kernel_interpret(pivot, nf, p, s):
    from strumpack_tpu.ops.pallas_lu import pallas_partial_factor
    rng = np.random.default_rng(nf + p + s + pivot)
    F = rng.standard_normal((nf, p, p)).astype(np.float32)
    if not pivot:
        F += np.eye(p, dtype=np.float32) * 8
    lu, perm, L21, U12, CB = pallas_partial_factor(
        jnp.asarray(F), thresh=0.0, s_pad=s, pivot=pivot, interpret=True)
    packed = np.zeros((nf, p, p), np.float32)
    packed[:, :s, :s] = np.asarray(lu)
    packed[:, s:, :s] = np.asarray(L21)
    packed[:, :s, s:] = np.asarray(U12)
    packed[:, s:, s:] = np.asarray(CB)
    assert _check_packed(F, packed, np.asarray(perm), s) < 5e-3


def test_pallas_cross_matches_full_kernel():
    """Cross kernel and full kernel agree bit-for-bit on the LU panel
    (same pivot rule, same operation order for the panel columns)."""
    from strumpack_tpu.ops.pallas_lu import pallas_partial_factor
    rng = np.random.default_rng(7)
    F = rng.standard_normal((4, 24, 24)).astype(np.float32)
    s = 16
    packed, perm0 = pallas_factor_bucket(
        jnp.asarray(F), s_pad=s, pivot=True, interpret=True)
    lu0, L210, U120, CB0 = unpack_factors(packed, s)
    lu, perm, L21, U12, CB = pallas_partial_factor(
        jnp.asarray(F), s_pad=s, pivot=True, interpret=True)
    assert np.array_equal(np.asarray(perm0), np.asarray(perm))
    np.testing.assert_array_equal(np.asarray(lu0), np.asarray(lu))
    np.testing.assert_array_equal(np.asarray(L210), np.asarray(L21))
    np.testing.assert_array_equal(np.asarray(U120), np.asarray(U12))
    np.testing.assert_allclose(np.asarray(CB0), np.asarray(CB),
                               rtol=0, atol=1e-4)


def test_spd_chol_from_nopivot_lu():
    """The SPD fast path derives chol = L_unit sqrt(D) from the no-pivot
    kernel; verify the derivation against lax.linalg.cholesky."""
    import jax
    from strumpack_tpu.ops.pallas_lu import pallas_partial_factor
    rng = np.random.default_rng(11)
    nf, p, s = 3, 40, 24
    M = rng.standard_normal((nf, p, p)).astype(np.float32)
    F = np.einsum("bij,bkj->bik", M, M) + p * np.eye(p, dtype=np.float32)
    lu, _, L21, _, CB = pallas_partial_factor(
        jnp.asarray(F), thresh=0.0, s_pad=s, pivot=False, interpret=True)
    d = np.diagonal(np.asarray(lu), axis1=-2, axis2=-1)
    sq = np.sqrt(d)
    Lc = np.tril(np.asarray(lu), -1) * sq[:, None, :]
    ii = np.arange(s)
    Lc[:, ii, ii] = sq
    L_ref = np.asarray(jax.lax.linalg.cholesky(jnp.asarray(F[:, :s, :s],
                                                           np.float64)))
    np.testing.assert_allclose(Lc, L_ref, rtol=0, atol=2e-3)
    L21c = np.asarray(L21) * sq[:, None, :]
    # F21 chol^-T check: L21c @ Lc^T == F21
    rec = np.einsum("bij,bkj->bik", L21c.astype(np.float64),
                    Lc.astype(np.float64))
    np.testing.assert_allclose(rec, F[:, s:, :s], rtol=0,
                               atol=2e-3 * np.abs(F).max())


def test_pallas_cross_wide_bucket():
    """Wide-front cross path (p > 128, deep bucket) with the VMEM-scaled
    block size."""
    from strumpack_tpu.ops.pallas_lu import (pallas_partial_factor,
                                             use_cross, _cross_bb)
    assert use_cross(16, 144, 256)
    assert not use_cross(512, 1536, 2)       # small batch -> XLA blocked
    assert _cross_bb(576, 64, 512, 32) is None   # over the VMEM budget
    assert _cross_bb(320, 64, 256, 64) == 32
    # sub-lane blocks (bb < 128) are excluded from the wide path: Mosaic
    # compiles them in ~80 s (round-3 pathology); XLA blocked path wins
    assert not use_cross(64, 320, 64)
    rng = np.random.default_rng(21)
    nf, p, s = 40, 144, 16
    F = rng.standard_normal((nf, p, p)).astype(np.float32)
    lu, perm, L21, U12, CB = pallas_partial_factor(
        jnp.asarray(F), thresh=0.0, s_pad=s, pivot=True, interpret=True)
    packed = np.zeros((nf, p, p), np.float32)
    packed[:, :s, :s] = np.asarray(lu)
    packed[:, s:, :s] = np.asarray(L21)
    packed[:, :s, s:] = np.asarray(U12)
    packed[:, s:, s:] = np.asarray(CB)
    assert _check_packed(F, packed, np.asarray(perm), s) < 5e-3
