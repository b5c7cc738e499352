"""Host-core unit tests: native C++ vs NumPy equivalence, spmv, matching,
separator trees, orderings."""
import numpy as np
import jax.numpy as jnp

from strumpack_tpu.sparse.csr import CSRMatrix
from strumpack_tpu.sparse.gen import poisson2d, poisson3d
from strumpack_tpu.sparse.separator_tree import SeparatorTree
from strumpack_tpu.sparse.symbolic import symbolic_factorization


def test_native_symbolic_matches_numpy():
    """C++ symbolic factorization == NumPy reference implementation."""
    from strumpack_tpu.native import symbolic_factorization_native
    from strumpack_tpu.sparse.ordering.geometric import geometric_nd
    A = poisson2d(24)
    perm, iperm, tree = geometric_nd(24, 24, leaf=8)
    Ap = A.permute(perm, iperm)
    native = symbolic_factorization_native(Ap, tree)
    if native is None:
        import pytest
        pytest.skip("no C++ toolchain")
    # NumPy reference
    rp, ci = Ap.rowptr, Ap.colind
    ref = [None] * tree.nseps
    for i in range(tree.nseps):
        sb, se = int(tree.sep_begin[i]), int(tree.sep_end[i])
        pieces = []
        if se > sb:
            cols = ci[rp[sb]:rp[se]]
            pieces.append(cols[cols >= se])
        for ch in (int(tree.lch[i]), int(tree.rch[i])):
            if ch >= 0:
                u = ref[ch]
                pieces.append(u[u >= se])
        ref[i] = (np.unique(np.concatenate(pieces)) if pieces
                  else np.empty(0, np.int64))
    for a, b in zip(native, ref):
        assert np.array_equal(a, b)


def test_native_nd_valid_tree():
    from strumpack_tpu.native import nested_dissection_native
    A = poisson2d(30)
    out = nested_dissection_native(A.rowptr, A.colind, A.n, leaf=16)
    if out is None:
        import pytest
        pytest.skip("no C++ toolchain")
    perm, iperm, tree = out
    tree.check(A.n)
    assert sorted(perm.tolist()) == list(range(A.n))
    # ND quality: separator of the root should be near sqrt(n)-sized
    assert tree.sep_size(tree.root) < 6 * 30


def test_native_multilevel_nd():
    """Multilevel ND (METIS_NodeND role: HEM coarsening + FM + Koenig
    vertex-cover separators): valid tree/permutation, and clearly less
    fill than the BFS level-set bisection on an irregular graph."""
    from strumpack_tpu.native import nested_dissection_native
    from strumpack_tpu.sparse.csr import CSRMatrix
    from strumpack_tpu.sparse.symbolic import (symbolic_factorization,
                                               factor_nonzeros)
    import scipy.sparse as sp
    from scipy.spatial import cKDTree
    rng = np.random.default_rng(3)
    npts = 3000
    pts = rng.standard_normal((npts, 2))
    _, idx = cKDTree(pts).query(pts, k=7)
    rows = np.repeat(np.arange(npts), 6)
    S = sp.csr_matrix((np.ones(6 * npts), (rows, idx[:, 1:].ravel())),
                      shape=(npts, npts))
    S = (S + S.T + sp.identity(npts) * 10).tocsr()
    A = CSRMatrix(npts, S.indptr.astype(np.int64),
                  S.indices.astype(np.int64), S.data)
    out = nested_dissection_native(A.rowptr, A.colind, A.n, leaf=16,
                                   method="ml")
    if out is None:
        import pytest
        pytest.skip("no C++ toolchain")
    fills = {}
    for method in ("ml", "bfs"):
        perm, iperm, tree = nested_dissection_native(
            A.rowptr, A.colind, A.n, leaf=16, method=method)
        tree.check(A.n)
        assert sorted(perm.tolist()) == list(range(A.n))
        Ap = A.permute(perm, iperm)
        fills[method] = factor_nonzeros(tree, symbolic_factorization(Ap, tree))
    assert fills["ml"] < 0.8 * fills["bfs"], fills


def test_device_ell_spmv_matches_scipy():
    from strumpack_tpu.ops.spmv import DeviceELL
    A = poisson3d(8)
    ell = DeviceELL(A, dtype=np.float64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.n)
    y = np.asarray(ell @ jnp.asarray(x))
    assert np.allclose(y, A.spmv(x))
    # multi-rhs
    X = rng.standard_normal((A.n, 3))
    Y = np.asarray(ell @ jnp.asarray(X))
    assert np.allclose(Y, A.spmv(X))
    # value update path (structure reuse)
    A2 = A.copy()
    A2.data = A2.data * 2.0
    ell.set_values(A2.data)
    assert np.allclose(np.asarray(ell @ jnp.asarray(x)), A2.spmv(x))


def test_equilibration_properties():
    rng = np.random.default_rng(3)
    import scipy.sparse as sp
    n = 80
    D = sp.diags(10.0 ** rng.integers(-6, 6, n))
    A = CSRMatrix.from_scipy((D @ sp.random(n, n, density=0.1,
                                            random_state=rng)
                              + sp.eye(n)).tocsr())
    dr, dc, rowcnd, colcnd, amax = A.equilibration()
    S = A.scale_rows_cols(dr, dc)
    rows = np.repeat(np.arange(n), np.diff(S.rowptr))
    rmax = np.zeros(n)
    np.maximum.at(rmax, rows, np.abs(S.data))
    assert rmax.max() <= 1.0 + 1e-12


def test_matching_puts_large_entries_on_diagonal():
    from strumpack_tpu.sparse.matching import (apply_matching,
                                               max_product_matching)
    rng = np.random.default_rng(5)
    import scipy.sparse as sp
    n = 60
    p = rng.permutation(n)
    B = sp.lil_matrix((n, n))
    for i in range(n):
        B[i, p[i]] = 100.0
        B[i, rng.integers(0, n)] += 0.1
    A = CSRMatrix.from_scipy(sp.csr_matrix(B))
    q, dr, dc = max_product_matching(A)
    assert np.array_equal(q, p)  # recovered the permuted diagonal
    Am = apply_matching(A, q, dr, dc)
    d = Am.to_scipy().diagonal()
    assert (np.abs(d) > 0.5).all()  # scaled diagonal ~1


def test_separator_tree_from_etree():
    from strumpack_tpu.sparse.separator_tree import from_etree_perm
    A = poisson2d(12).symmetrize_sparsity()
    perm = np.arange(A.n, dtype=np.int64)
    tree = from_etree_perm(A.rowptr, A.colind, A.n, perm, perm, leaf=8)
    tree.check(A.n)


def test_amd_fill_reduction():
    from strumpack_tpu.sparse.ordering.amd import amd_order
    import scipy.sparse as sp
    from scipy.sparse.linalg import splu
    A = poisson2d(15)
    perm = amd_order(A.rowptr, A.colind, A.n)
    assert sorted(perm.tolist()) == list(range(A.n))
    S = A.to_scipy().tocsc()
    natural = splu(S, permc_spec="NATURAL")
    Sp = S[perm, :][:, perm]
    withamd = splu(Sp.tocsc(), permc_spec="NATURAL")
    assert (withamd.L.nnz + withamd.U.nnz) < (natural.L.nnz + natural.U.nnz)


def test_all_reordering_methods():
    """ReorderingStrategy parity (StrumpackOptions.hpp:61): every method
    the reference exposes produces a valid permutation + separator tree
    and a machine-precision direct solve."""
    import numpy as np
    from strumpack_tpu import (KrylovSolver, ReturnCode, SparseSolver,
                               SPOptions)
    from strumpack_tpu.sparse.gen import poisson2d
    A = poisson2d(16)
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    fills = {}
    for m in ("natural", "metis", "parmetis", "scotch", "ptscotch", "nd",
              "and", "rcm", "amd", "mmd", "mlf", "spectral"):
        opts = SPOptions(krylov_solver=KrylovSolver.DIRECT)
        opts.set_from_command_line(["--sp_reordering_method", m])
        s = SparseSolver(opts)
        s.set_csr_matrix(A)
        x, rc = s.solve(b)
        assert rc == ReturnCode.SUCCESS, m
        assert A.max_scaled_residual(x, b) < 1e-12, m
        fills[m] = s.factor_nonzeros()
    # minimum-degree variants must beat natural ordering on fill
    assert fills["mmd"] < fills["natural"]
    assert fills["mlf"] < fills["natural"]


def test_native_mlf_matches_greedy_quality():
    """Native C++ exact-greedy minimum local fill (hostsym.cpp
    min_fill_order — the MLF role at usable scale): valid permutation,
    fill no worse than AMD on a 2D Poisson grid (exact local-fill greedy
    beats degree-based greedies here)."""
    import scipy.sparse.linalg as spl
    from strumpack_tpu.native import min_fill_native
    from strumpack_tpu.sparse.ordering.amd import amd_order

    A = poisson2d(24)
    p = min_fill_native(A.rowptr, A.colind, A.n)
    if p is None:
        import pytest
        pytest.skip("no C++ compiler for the native path")
    assert sorted(p.tolist()) == list(range(A.n))
    S = A.to_scipy().tocsc()

    def lu_nnz(perm):
        Sp = S[perm, :][:, perm].tocsc()
        f = spl.splu(Sp, permc_spec="NATURAL",
                     options=dict(SymmetricMode=True))
        return f.L.nnz + f.U.nnz

    pa = amd_order(A.rowptr, A.colind, A.n)
    assert lu_nnz(p) <= 1.05 * lu_nnz(pa)


def test_all_matching_jobs():
    """MatchingJob parity (StrumpackOptions.hpp:120 / MC64 jobs 1-5 +
    AWPM): on a column-permuted Poisson (zero diagonal), every matching
    job restores a solvable diagonal; without matching the no-pivot-able
    structure breaks the solve."""
    import numpy as np
    from strumpack_tpu import ReturnCode, SparseSolver, SPOptions
    from strumpack_tpu.sparse.csr import CSRMatrix
    from strumpack_tpu.sparse.gen import poisson2d
    A = poisson2d(16)
    rng = np.random.default_rng(0)
    pc = rng.permutation(A.n)
    S = A.to_scipy().tocsr()[:, pc].tocsr()
    Ap = CSRMatrix(A.n, S.indptr, S.indices, S.data)
    xex = rng.standard_normal(A.n)
    b = Ap.spmv(xex)
    for code in ("1", "2", "3", "4", "5", "6"):
        opts = SPOptions()
        opts.set_from_command_line(["--sp_matching", code])
        s = SparseSolver(opts)
        s.set_csr_matrix(Ap)
        x, rc = s.solve(b)
        assert rc == ReturnCode.SUCCESS, code
        assert Ap.max_scaled_residual(x, b) < 1e-10, code


def test_native_min_degree():
    """Native quotient-graph AMD/MMD (hostsym.cpp min_degree_order):
    valid permutations, lower fill than natural order, and fast enough
    for real use (the Python fallback is O(fill))."""
    import time
    import numpy as np
    from strumpack_tpu.native import min_degree_native
    from strumpack_tpu.sparse.gen import poisson2d, poisson3d
    A = poisson2d(30).symmetrize_sparsity()
    p = min_degree_native(A.rowptr, A.colind, A.n)
    if p is None:
        import pytest
        pytest.skip("no C++ compiler")
    assert sorted(p) == list(range(A.n))
    pm = min_degree_native(A.rowptr, A.colind, A.n, multiple=True)
    assert sorted(pm) == list(range(A.n))
    # scale check: 24^3 must order in well under a second
    B = poisson3d(24).symmetrize_sparsity()
    t0 = time.time()
    pb = min_degree_native(B.rowptr, B.colind, B.n)
    assert sorted(pb) == list(range(B.n))
    assert time.time() - t0 < 5.0


def test_distributed_nd_composition():
    """nd_dist internals: top bisection + per-subgraph orderings compose
    into a valid postorder permutation + separator tree (single-process
    simulation of the 2-process path; the real 2-process run is covered
    by test_multihost_two_processes)."""
    import numpy as np
    from strumpack_tpu.sparse.gen import poisson2d
    from strumpack_tpu.sparse.ordering import nd_dist
    from strumpack_tpu.sparse.ordering.nd import nested_dissection
    from strumpack_tpu.sparse.separator_tree import TreeBuilder

    A = poisson2d(20)
    n = A.n
    top = nd_dist._top_bisection(A.rowptr, A.colind, n, 1)
    leaves = []
    nd_dist._collect_leaves(top, leaves)
    assert len(leaves) == 2
    results = {}
    for g, ids in enumerate(leaves):
        gl = np.full(n, -1, np.int64)
        gl[ids] = np.arange(len(ids))
        lrp, lci = [0], []
        for v in ids:
            cs = gl[A.colind[A.rowptr[v]:A.rowptr[v + 1]]]
            cs = cs[cs >= 0]
            lci.append(cs)
            lrp.append(lrp[-1] + len(cs))
        perm_l, _, tree_l = nested_dissection(
            np.asarray(lrp, np.int64), np.concatenate(lci), len(ids),
            leaf=8, splitter="bfs")
        results[g] = (ids[perm_l], tree_l.sep_begin, tree_l.sep_end,
                      tree_l.lch, tree_l.rch)
    # pack/unpack roundtrip
    rt = nd_dist._unpack_results(nd_dist._pack_results(results))
    for g in results:
        for a, b in zip(results[g], rt[g]):
            assert (np.asarray(a) == np.asarray(b)).all()

    # compose (mirrors nested_dissection_distributed's compose step)
    tb = TreeBuilder()
    cnt = [0]

    def compose(node):
        if node[0] == "leaf":
            g = cnt[0]; cnt[0] += 1
            perm_ids, sb, se, lch, rch = results[g]
            off_v, off_n = tb._count, len(tb.sep_begin)
            tb.emit(perm_ids)
            root = -1
            for i in range(len(sb)):
                root = tb.add_node(
                    int(sb[i]) + off_v, int(se[i]) + off_v,
                    int(lch[i]) + off_n if lch[i] >= 0 else -1,
                    int(rch[i]) + off_n if rch[i] >= 0 else -1)
            return root
        _, l, r, sep = node
        lr = compose(l); rr = compose(r)
        lo, hi = tb.emit(sep)
        return tb.add_node(lo, hi, lr, rr)

    compose(top)
    perm, iperm, tree = tb.finish(n)
    assert (np.sort(perm) == np.arange(n)).all()
    # the composed tree drives a correct factorization
    from strumpack_tpu.sparse.symbolic import symbolic_factorization
    from strumpack_tpu.frontal.plan import build_plan
    from strumpack_tpu.frontal import numeric
    import jax.numpy as jnp
    Ap = A.permute(perm, iperm)
    upd = symbolic_factorization(Ap, tree)
    plan = build_plan(Ap, tree, upd)
    pdev = numeric.PlanDev(plan)
    fac = numeric.factorize(pdev, Ap.data)
    b = Ap.spmv(np.ones(n))
    x = np.asarray(numeric.solve(fac, jnp.asarray(b)))
    assert np.linalg.norm(Ap.spmv(x) - b) / np.linalg.norm(b) < 1e-12


def test_roofline_report():
    """Roofline analysis of a plan (BASELINE 'every hot kernel
    roofline-analyzed'): per-bucket AI + bound, plan-achievable rate;
    small fronts must classify HBM-bound, a large dense front
    MXU-bound."""
    import numpy as np
    from strumpack_tpu.sparse.gen import poisson2d
    from strumpack_tpu.sparse.ordering.geometric import geometric_nd
    from strumpack_tpu.sparse.symbolic import symbolic_factorization
    from strumpack_tpu.frontal.plan import build_plan
    from strumpack_tpu.utils import roofline

    A = poisson2d(40)
    perm, iperm, tree = geometric_nd(40, 40, leaf=4)
    Ap = A.permute(perm, iperm)
    upd = symbolic_factorization(Ap, tree)
    plan = build_plan(Ap, tree, upd)
    rows, summ = roofline.plan_roofline(plan)
    assert summ["total_flops"] > 0
    assert 0.0 <= summ["compute_bound_flop_frac"] <= 1.0
    # deepest-level small fronts: HBM-bound
    small = [r for r in rows if r.s_pad <= 8]
    assert small and not any(r.compute_bound for r in small)
    lines = []
    summ2 = roofline.report(plan, measured_seconds=1.0,
                            out=lines.append)
    assert summ2["achievable_gflops"] > 0 and any(
        "roofline" in l for l in lines)
