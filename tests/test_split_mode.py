"""Split-program factor/solve mode tests.

Very large plans (>SPLIT_SOLVE_BUCKETS buckets) compile per-level programs
instead of whole-phase programs (a ~58 MB single-program image faults the
TPU at 64^3 scale).  These tests force split mode on small problems so the
path is covered deterministically on CPU, including every front type and
multi-rhs solves.
"""
import jax
import numpy as np
import pytest

import strumpack_tpu.frontal.numeric as numeric
from strumpack_tpu import (CompressionType, KrylovSolver, ReturnCode,
                           SparseSolver, SPOptions)
from strumpack_tpu.sparse.gen import poisson2d


@pytest.fixture
def force_split(monkeypatch):
    monkeypatch.setattr(numeric, "SPLIT_SOLVE_BUCKETS", 0)


def _check(A, opts, nrhs=1, tol=1e-10):
    rng = np.random.default_rng(0)
    xex = (rng.standard_normal((A.n, nrhs)) if nrhs > 1
           else rng.standard_normal(A.n))
    b = A.spmv(xex)
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    x, rc = s.solve(b)
    assert rc == ReturnCode.SUCCESS
    res = A.max_scaled_residual(x, b)
    assert res < tol, res
    return s


def test_split_dense_direct(force_split):
    _check(poisson2d(20), SPOptions(krylov_solver=KrylovSolver.DIRECT),
           tol=1e-12)


def test_split_multiple_rhs(force_split):
    _check(poisson2d(15), SPOptions(krylov_solver=KrylovSolver.DIRECT),
           nrhs=3, tol=1e-12)


def test_split_auto_refinement_host_loop(force_split):
    # device IR is gated off for split plans -> host loop path
    s = _check(poisson2d(20), SPOptions(rel_tol=1e-10), tol=1e-8)
    assert s.Krylov_iterations() <= 3


def test_split_blr(force_split):
    opts = SPOptions(compression=CompressionType.BLR,
                     compression_min_sep_size=32, rel_tol=1e-6)
    opts.blr.rel_tol = 1e-6
    _check(poisson2d(30), opts, tol=1e-4)


def test_split_spd(force_split):
    _check(poisson2d(20), SPOptions(symmetric=True, positive_definite=True,
                                    krylov_solver=KrylovSolver.DIRECT),
           tol=1e-12)


def test_split_lossy(force_split):
    opts = SPOptions(compression=CompressionType.LOSSY,
                     compression_min_sep_size=16, lossy_precision=16,
                     rel_tol=1e-8)
    _check(poisson2d(20), opts, tol=1e-6)


def test_split_hss_fronts(force_split):
    opts = SPOptions(compression=CompressionType.HSS,
                     compression_min_sep_size=32, rel_tol=1e-6)
    opts.hss.rel_tol = 1e-6
    opts.hss.leaf_size = 16
    _check(poisson2d(40), opts, tol=1e-4)


def test_split_matches_whole(monkeypatch):
    """Split-mode and whole-mode produce identical factors/solutions."""
    A = poisson2d(15)
    rng = np.random.default_rng(1)
    b = A.spmv(rng.standard_normal(A.n))
    xs = {}
    for mode, nb in (("whole", 10**9), ("split", 0)):
        monkeypatch.setattr(numeric, "SPLIT_SOLVE_BUCKETS", nb)
        s = SparseSolver(SPOptions(krylov_solver=KrylovSolver.DIRECT))
        s.set_csr_matrix(A)
        x, rc = s.solve(b)
        xs[mode] = np.asarray(x)
    assert np.allclose(xs["whole"], xs["split"], rtol=1e-12, atol=1e-12)


def test_chunked_bucket_execution_exact():
    """nf-chunked bucket execution (FrontGPU split_smaller role at bucket
    granularity): forcing a tiny chunk cap must reproduce the unchunked
    factorization bit-for-bit — assembly partition, extend-add pair
    slicing, and scan-stacked factors all line up."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from strumpack_tpu.sparse.gen import poisson3d
    from strumpack_tpu.sparse.ordering.geometric import geometric_nd
    from strumpack_tpu.sparse.symbolic import symbolic_factorization
    from strumpack_tpu.frontal.plan import build_plan
    from strumpack_tpu.frontal import numeric

    nx = 12
    A = poisson3d(nx)
    perm, iperm, tree = geometric_nd(nx, nx, nx, leaf=8)
    Ap = A.permute(perm, iperm)
    upd = symbolic_factorization(Ap, tree)
    b = Ap.spmv(np.ones(Ap.n))

    xs = {}
    old = os.environ.get("STRUMPACK_TPU_CHUNK_GB")
    try:
        for tag, cap in (("chunked", "0.001"), ("plain", "100")):
            os.environ["STRUMPACK_TPU_CHUNK_GB"] = cap
            plan = build_plan(Ap, tree, upd)
            if tag == "chunked":
                assert any(bp.chunks > 1
                           for lvl in plan.levels for bp in lvl)
            pdev = numeric.PlanDev(plan)
            fac = numeric.factorize(pdev, Ap.data)
            xs[tag] = np.asarray(numeric.solve(fac, jnp.asarray(b)))
    finally:
        if old is None:
            os.environ.pop("STRUMPACK_TPU_CHUNK_GB", None)
        else:
            os.environ["STRUMPACK_TPU_CHUNK_GB"] = old
    assert np.array_equal(xs["chunked"], xs["plain"])
    res = np.linalg.norm(Ap.spmv(xs["chunked"]) - b) / np.linalg.norm(b)
    assert res < 1e-12, res


def test_chunked_blr_cb_compression():
    """Chunked execution composes with BLR fronts + compressed CBs."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from strumpack_tpu import CompressionType, SPOptions
    from strumpack_tpu.sparse.gen import poisson3d
    from strumpack_tpu.sparse.ordering.geometric import geometric_nd
    from strumpack_tpu.sparse.symbolic import symbolic_factorization
    from strumpack_tpu.frontal.plan import build_plan
    from strumpack_tpu.frontal import numeric

    nx = 12
    A = poisson3d(nx)
    perm, iperm, tree = geometric_nd(nx, nx, nx, leaf=8)
    Ap = A.permute(perm, iperm)
    upd = symbolic_factorization(Ap, tree)
    opts = SPOptions(compression=CompressionType.BLR,
                     compression_min_sep_size=32)
    opts.blr.rel_tol = 1e-8
    opts.blr.cb_compression = True
    old = os.environ.get("STRUMPACK_TPU_CHUNK_GB")
    os.environ["STRUMPACK_TPU_CHUNK_GB"] = "0.001"
    try:
        plan = build_plan(Ap, tree, upd, compression=opts)
        assert any(bp.chunks > 1 and bp.blr
                   for lvl in plan.levels for bp in lvl)
        pdev = numeric.PlanDev(plan)
        fac = numeric.factorize(pdev, Ap.data, blr_tol=1e-8)
        b = Ap.spmv(np.ones(Ap.n))
        x = np.asarray(numeric.solve(fac, jnp.asarray(b)))
        res = np.linalg.norm(Ap.spmv(x) - b) / np.linalg.norm(b)
        assert res < 1e-1, res
    finally:
        if old is None:
            os.environ.pop("STRUMPACK_TPU_CHUNK_GB", None)
        else:
            os.environ["STRUMPACK_TPU_CHUNK_GB"] = old


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_fused_big_front_guard(monkeypatch):
    """Regression guard for the round-3 XLA miscompile (PERF.md): fusing
    factor+fwd+bwd into ONE program with GSPMD big-front math between
    shard_map regions returns wrong solve values for tile-mode BLR
    fronts.  The production gate must keep routing big-front plans to
    per-segment dispatch; this test asserts (a) the gate holds, (b) the
    segmented result is correct, and (c) documents whether the fused
    composition still differs (repro:
    examples/repro_xla_fused_miscompile.py — reproduced at rel diff
    ~0.58 on jax 0.9 CPU)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from strumpack_tpu.parallel.dist import make_sharded_factor_solve
    from strumpack_tpu.sparse.gen import poisson3d
    from strumpack_tpu.sparse.ordering.geometric import geometric_nd
    from strumpack_tpu.sparse.symbolic import symbolic_factorization
    from strumpack_tpu.frontal.plan import build_plan

    nx = 12
    A = poisson3d(nx)
    perm, iperm, tree = geometric_nd(nx, nx, nx, leaf=8)
    Ap = A.permute(perm, iperm)
    upd = symbolic_factorization(Ap, tree)
    opts = SPOptions(compression=CompressionType.BLR,
                     compression_min_sep_size=32)
    opts.blr.rel_tol = 1e-8
    plan = build_plan(Ap, tree, upd, compression=opts)
    pdev = numeric.PlanDev(plan)
    mesh = Mesh(np.array(jax.devices()[:8]), ("b",))
    b = Ap.spmv(np.ones(Ap.n))

    monkeypatch.delenv("STRUMPACK_SPMD_FORCE_FUSED", raising=False)
    seg = make_sharded_factor_solve(pdev, mesh, dtype=jnp.float64,
                                    blr_tol=1e-8)
    # (a) the gate: a plan with grid/tile fronts must NOT fuse
    assert seg.sharded_plan.big and not seg.fused
    x = np.asarray(seg(jnp.asarray(Ap.data), jnp.asarray(b)))
    # (b) the segmented (production) result is correct
    res = np.linalg.norm(Ap.spmv(x) - b) / np.linalg.norm(b)
    assert res < 1e-2, res


def test_sampling_bucket_sequential_matches_vmapped(monkeypatch):
    """Big batched sampling buckets run per-front lax.map (memory-bounded
    path, SAMP_SEQ_MIN); forced on a small problem it must match the
    vmapped path's solution."""
    from strumpack_tpu.sparse.gen import poisson3d
    from strumpack_tpu.options import CompressionType

    def run():
        A = poisson3d(16)
        opts = SPOptions(rel_tol=1e-8,
                         krylov_solver=KrylovSolver.PREC_GMRES,
                         compression=CompressionType.HSS,
                         compression_min_sep_size=64, nd_leaf=8)
        opts.hss.sampling = True
        opts.hss.leaf_size = 32
        opts.hss.max_rank = 32
        opts.hss.rel_tol = 1e-8
        s = SparseSolver(opts)
        s.set_csr_matrix(A)
        b = A.spmv(np.ones(A.n))
        x, rc = s.solve(b)
        assert rc == ReturnCode.SUCCESS
        return x, A.max_scaled_residual(x, b)

    monkeypatch.setattr(numeric, "SAMP_SEQ_MIN", 1 << 30)
    x_vmap, res_v = run()
    monkeypatch.setattr(numeric, "SAMP_SEQ_MIN", 8)
    x_seq, res_s = run()
    assert res_v < 1e-5 and res_s < 1e-5, (res_v, res_s)
    assert np.allclose(x_vmap, x_seq, rtol=1e-8, atol=1e-10)
