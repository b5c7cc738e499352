"""BLR-compressed front tests.

Model: the reference's test_BLR_seq.cpp + testPoisson3d with
--sp_compression BLR (BASELINE.md config 2): preconditioned GMRES with
BLR factors must reach rel_tol with few iterations, and the BLR kernels
must be exact when the tolerance is tight and rank unrestricted.
"""
import numpy as np
import jax
import jax.numpy as jnp

from strumpack_tpu import (CompressionType, KrylovSolver, SparseSolver,
                          SPOptions, ReturnCode)
from strumpack_tpu.frontal.blr import (blr_factor_bucket, blr_fwd_bucket,
                                       blr_bwd_bucket)
from strumpack_tpu.sparse.gen import poisson2d, poisson3d


def test_blr_kernel_exact_at_full_rank():
    rng = np.random.default_rng(0)
    nf, t, nts, ntu = 2, 16, 4, 2
    nt = nts + ntu
    p, s = nt * t, nts * t
    F = rng.standard_normal((nf, p, p)) * 0.01
    F += np.eye(p)[None] * 10.0
    Fj = jnp.asarray(F)
    for adm in (0, 1):
        lud, perms, Uu, Vu, Ul, Vl, Du, Dl, CB, rk = blr_factor_bucket(
            Fj, jnp.asarray(0.0), jnp.asarray(1e-14), t=t, r=t,
            nts=nts, nt=nt, adm_band=adm)
        F11, F12 = F[:, :s, :s], F[:, :s, s:]
        F21, F22 = F[:, s:, :s], F[:, s:, s:]
        for f in range(nf):
            CBref = F22[f] - F21[f] @ np.linalg.solve(F11[f], F12[f])
            assert np.abs(np.asarray(CB)[f] - CBref).max() < 1e-10
        b = rng.standard_normal((nf, p, 1))
        y, cbv = blr_fwd_bucket(lud, perms, Ul, Vl, Dl, jnp.asarray(b),
                                t=t, nts=nts, nt=nt, adm_band=adm)
        xupd = np.stack(
            [np.linalg.solve(np.asarray(CB)[f], np.asarray(cbv)[f])
             for f in range(nf)])
        xsep = blr_bwd_bucket(lud, Uu, Vu, Du, y, jnp.asarray(xupd),
                              t=t, nts=nts, nt=nt, adm_band=adm)
        for f in range(nf):
            xfull = np.concatenate([np.asarray(xsep)[f], xupd[f]])
            assert np.abs(F[f] @ xfull - b[f]).max() < 1e-9


def test_blr_compression_reduces_rank():
    """Low-rank off-diagonal blocks compress below full rank."""
    rng = np.random.default_rng(1)
    nf, t, nts = 1, 32, 2
    nt = nts
    p = nt * t
    # block 2x2 with rank-3 off-diagonal
    F = np.zeros((nf, p, p))
    F[0, :t, :t] = np.eye(t) * 5 + 0.1 * rng.standard_normal((t, t))
    F[0, t:, t:] = np.eye(t) * 5 + 0.1 * rng.standard_normal((t, t))
    lowrank = rng.standard_normal((t, 3)) @ rng.standard_normal((3, t))
    F[0, :t, t:] = lowrank
    F[0, t:, :t] = lowrank.T
    out = blr_factor_bucket(
        jnp.asarray(F), jnp.asarray(0.0), jnp.asarray(1e-8),
        t=t, r=16, nts=nts, nt=nt)
    ranks = np.asarray(out[-1])
    assert ranks.max() <= 4, ranks.max()  # found the rank-3 structure


def test_blr_strong_admissibility():
    """Strong admissibility (BLROptions.hpp:62): tiles adjacent to the
    diagonal stay dense (Du/Dl), solve still reaches rel_tol."""
    A = poisson2d(40)
    opts = SPOptions(compression=CompressionType.BLR,
                     compression_min_sep_size=32, rel_tol=1e-8)
    opts.blr.rel_tol = 1e-6
    opts.blr.leaf_size = 16
    opts.blr.admissibility = "strong"
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder(40, 40)
    assert any(bp.adm_band == 1
               for lvl in s.plan.levels for bp in lvl if bp.blr)
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    assert A.max_scaled_residual(x, b) < 1e2 * opts.rel_tol
    # the dense band is stored
    entry = next(iter(s.fac.tree["blr"].values()))
    assert entry[6].shape[-1] > 0


def test_poisson3d_blr_gmres():
    """BASELINE config 2 analog (small): 3D Poisson, BLR fronts, GMRES."""
    A = poisson3d(16)
    opts = SPOptions(compression=CompressionType.BLR,
                     compression_min_sep_size=128, rel_tol=1e-6)
    opts.blr.rel_tol = 1e-5
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder(16, 16, 16)
    nblr = sum(1 for lvl in s.plan.levels for bp in lvl if bp.blr)
    assert nblr > 0, "no BLR buckets selected"
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    res = A.max_scaled_residual(x, b)
    assert res < 1e2 * opts.rel_tol, res
    assert s.Krylov_iterations() < 25
    assert s.fac.max_rank() > 0


def test_poisson2d_blr_tighter_tol_fewer_iits():
    A = poisson2d(40)
    its = {}
    for tol in (1e-2, 1e-6):
        opts = SPOptions(compression=CompressionType.BLR,
                         compression_min_sep_size=64, rel_tol=1e-8)
        opts.blr.rel_tol = tol
        s = SparseSolver(opts)
        s.set_csr_matrix(A)
        s.reorder(40, 40)
        rng = np.random.default_rng(0)
        b = A.spmv(rng.standard_normal(A.n))
        x, rc = s.solve(b)
        assert rc == ReturnCode.SUCCESS
        its[tol] = s.Krylov_iterations()
    assert its[1e-6] <= its[1e-2]


def test_blr_ll_luar_matches_rl():
    """LL (LUAR-accumulated) factorization agrees with RL: same factor
    format, same CB, same solves (BLRFactorAlgorithm::LL role)."""
    rng = np.random.default_rng(7)
    nf, t, nts, ntu = 2, 16, 4, 2
    nt = nts + ntu
    p, s = nt * t, nts * t
    F = rng.standard_normal((nf, p, p)) * 0.01
    F += np.eye(p)[None] * 10.0
    Fj = jnp.asarray(F)
    outs = {}
    for variant in ("rl", "ll"):
        outs[variant] = blr_factor_bucket(
            Fj, jnp.asarray(0.0), jnp.asarray(1e-14), t=t, r=t,
            nts=nts, nt=nt, adm_band=0, variant=variant)
    for a, b in zip(outs["rl"], outs["ll"]):
        a, b = np.asarray(a), np.asarray(b)
        if a.size:
            assert np.abs(a - b).max() < 1e-8
    # exactness of the LL CB at full rank
    lud, perms, Uu, Vu, Ul, Vl, Du, Dl, CB, rk = outs["ll"]
    F11, F12 = F[:, :s, :s], F[:, :s, s:]
    F21, F22 = F[:, s:, :s], F[:, s:, s:]
    for f in range(nf):
        CBref = F22[f] - F21[f] @ np.linalg.solve(F11[f], F12[f])
        assert np.abs(np.asarray(CB)[f] - CBref).max() < 1e-10


def test_poisson2d_blr_ll_end_to_end():
    """--blr_factor_algorithm ll end-to-end through the driver."""
    A = poisson2d(40)
    opts = SPOptions(compression=CompressionType.BLR,
                     compression_min_sep_size=32, rel_tol=1e-6)
    opts.blr.rel_tol = 1e-5
    rest = opts.set_from_command_line(["--blr_factor_algorithm", "LL"])
    assert rest == [] and opts.blr.factor_algorithm == "ll"
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder(40, 40)
    assert any(bp.blr_variant == "ll"
               for lvl in s.plan.levels for bp in lvl if bp.blr)
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    res = A.max_scaled_residual(x, b)
    assert res < 1e2 * opts.rel_tol, res
