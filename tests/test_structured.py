"""StructuredMatrix facade + HODLR + kernel regression tests.

Model: the reference's examples/dense structured tests and
test_HSS/BLR_seq option sweeps, plus the kernel regression example
(examples/dense/testKernelRegression).
"""
import numpy as np
import pytest

from strumpack_tpu.structured.structured import (StructuredOptions, Type,
                                                 construct_from_dense,
                                                 construct_from_elements)


def cauchyish(m, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 1, m))
    return 1.0 / (0.05 + np.abs(x[:, None] - x[None, :])) + np.eye(m) * 50


@pytest.mark.parametrize("t", [Type.HSS, Type.HODLR, Type.BLR, Type.LOSSY])
def test_facade_mult_factor_solve(t):
    m = 256
    A = cauchyish(m)
    tol = 1e-8 if t != Type.LOSSY else 1e-2
    S = construct_from_dense(A, StructuredOptions(type=t, rel_tol=tol,
                                                  leaf_size=32, max_rank=24))
    rng = np.random.default_rng(1)
    x = rng.standard_normal(m)
    y = np.asarray(S.mult(x))
    mv_tol = 1e-5 if t != Type.LOSSY else 2e-2
    assert np.linalg.norm(y - A @ x) / np.linalg.norm(A @ x) < mv_tol
    S.factor()
    xs = np.asarray(S.solve(A @ x))
    sv_tol = 1e-4 if t != Type.LOSSY else 5e-2
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < sv_tol
    assert S.memory() > 0


def test_facade_lr():
    rng = np.random.default_rng(2)
    m = 200
    A = rng.standard_normal((m, 7)) @ rng.standard_normal((7, m))
    S = construct_from_dense(A, StructuredOptions(type=Type.LR,
                                                  rel_tol=1e-10))
    assert S.rank() == 7
    x = rng.standard_normal(m)
    assert np.linalg.norm(np.asarray(S.mult(x)) - A @ x) < 1e-8
    assert S.memory() < m * m / 5


def test_construct_from_elements():
    m = 128
    S = construct_from_elements(
        lambda i, j: 1.0 / (1.0 + np.abs(i - j)) + 4.0 * (i == j),
        m, m, StructuredOptions(type=Type.HSS, rel_tol=1e-8, leaf_size=32))
    i = np.arange(m)
    A = 1.0 / (1.0 + np.abs(i[:, None] - i[None, :])) + 4.0 * np.eye(m)
    x = np.random.default_rng(0).standard_normal(m)
    assert np.linalg.norm(np.asarray(S.mult(x)) - A @ x) < 1e-5


def test_hodlr_matvec_solve():
    from strumpack_tpu.structured.hodlr import HODLRMatrix
    m = 300
    A = cauchyish(m, seed=4)
    H = HODLRMatrix(A, leaf_size=32, max_rank=24, rel_tol=1e-10)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((m, 2))
    assert np.linalg.norm(np.asarray(H.matvec(x)) - A @ x) < 1e-7 * np.linalg.norm(A @ x)
    xs = np.asarray(H.solve(A @ x))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-7


def test_hodlr_randomized_compression_large_blocks():
    """Blocks at or above RSVD_MIN go through the randomized range finder
    (the dense-SVD path was the root-group compile/runtime hog at 100^3,
    PERF.md); the approximation at the rank cap must match the dense-SVD
    quality closely enough to solve through."""
    from strumpack_tpu.structured import hodlr as H
    assert H.RSVD_MIN <= 1024  # the test must actually hit the path
    m = 2 * H.RSVD_MIN  # top-level off-diagonal blocks are RSVD-compressed
    A = cauchyish(m, seed=7)
    Hm = H.HODLRMatrix(A, leaf_size=max(64, H.RSVD_MIN // 8),
                       max_rank=96, rel_tol=1e-9)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((m, 2))
    b = A @ x
    assert (np.linalg.norm(np.asarray(Hm.matvec(x)) - b)
            < 1e-5 * np.linalg.norm(b))
    xs = np.asarray(Hm.solve(b))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-4


def test_kernel_regression_classification():
    """Two-moons-ish binary classification via HSS kernel ridge
    (STRUMPACKKernel sklearn-estimator analog)."""
    from strumpack_tpu.kernel.kernel import KernelRegressionClassifier
    rng = np.random.default_rng(5)
    n = 400
    theta = rng.uniform(0, np.pi, n)
    X1 = np.stack([np.cos(theta), np.sin(theta)], 1) + 0.1 * rng.standard_normal((n, 2))
    X2 = np.stack([1 - np.cos(theta), 0.5 - np.sin(theta)], 1) + 0.1 * rng.standard_normal((n, 2))
    X = np.concatenate([X1, X2])
    y = np.concatenate([np.zeros(n), np.ones(n)])
    idx = rng.permutation(2 * n)
    X, y = X[idx], y[idx]
    ntr = 600
    clf = KernelRegressionClassifier(h=0.3, lam=1.0, fmt="hss",
                                     leaf_size=64, rel_tol=1e-6)
    clf.fit(X[:ntr], y[:ntr])
    acc = clf.score(X[ntr:], y[ntr:])
    assert acc > 0.92, acc


def test_gauss_kernel_fit_predict_regression():
    from strumpack_tpu.kernel.kernel import GaussKernel
    rng = np.random.default_rng(6)
    n = 300
    X = rng.uniform(-2, 2, (n, 1))
    y = np.sin(2 * X[:, 0]) + 0.01 * rng.standard_normal(n)
    k = GaussKernel(h=0.5, lam=1e-3)
    k.fit_HODLR(X, y, leaf_size=32, rel_tol=1e-8)
    Xt = np.linspace(-1.5, 1.5, 50)[:, None]
    pred = k.predict(Xt)
    assert np.max(np.abs(pred - np.sin(2 * Xt[:, 0]))) < 0.1


def test_hss_sampling_construction():
    """Randomized-sampling HSS (compress_stable role) with Gaussian and
    SJLT sketches, from matvec + element callbacks."""
    import jax.numpy as jnp
    from strumpack_tpu.structured.hss_sample import hss_from_sampling
    rng = np.random.default_rng(0)
    m = 300
    A = cauchyish(m)
    Aj = jnp.asarray(A)
    mult = lambda X, trans: (Aj.T.conj() @ X if trans else Aj @ X)
    elem = lambda I, J: Aj[I, J]
    for sketch in ("gaussian", "sjlt"):
        H = hss_from_sampling(mult, elem, m, leaf_size=32, max_rank=24,
                              oversample=24, rel_tol=1e-9,
                              dtype=jnp.float64, sketch=sketch)
        v = rng.standard_normal(m)
        rel = (np.linalg.norm(np.asarray(H.matvec(v)) - A @ v)
               / np.linalg.norm(A @ v))
        assert rel < 1e-6, rel
        xs = np.asarray(H.solve(A @ v))
        assert np.linalg.norm(xs - v) / np.linalg.norm(v) < 1e-6


def test_construct_matrix_free():
    import jax.numpy as jnp
    from strumpack_tpu.structured.structured import (construct_matrix_free,
                                                     StructuredOptions, Type)
    m = 200
    A = cauchyish(m, seed=9)
    Aj = jnp.asarray(A)
    mult = lambda X, trans: (Aj.T @ X if trans else Aj @ X)
    S = construct_matrix_free(mult, m,
                              StructuredOptions(type=Type.HSS, rel_tol=1e-8,
                                                leaf_size=32, max_rank=24))
    rng = np.random.default_rng(1)
    v = rng.standard_normal(m)
    rel = np.linalg.norm(np.asarray(S.mult(v)) - A @ v) / np.linalg.norm(A @ v)
    assert rel < 1e-5, rel
    S.factor()
    xs = np.asarray(S.solve(A @ v))
    assert np.linalg.norm(xs - v) / np.linalg.norm(v) < 1e-5


def test_clustering_methods():
    """binary_tree_clustering dispatch (clustering/Clustering.hpp:51)."""
    from strumpack_tpu.kernel.clustering import binary_tree_clustering
    rng = np.random.default_rng(0)
    X = rng.standard_normal((500, 3))
    for method in ("natural", "kd", "2means", "pca", "cobble"):
        order = binary_tree_clustering(method, X, leaf=32)
        assert sorted(order.tolist()) == list(range(500)), method


def test_approximate_knn():
    """Randomized-projection-tree ANN (NeighborSearch role)."""
    from strumpack_tpu.kernel.clustering import approximate_knn
    rng = np.random.default_rng(1)
    X = rng.standard_normal((300, 2))
    nbr, dist = approximate_knn(X, k=5, n_trees=6)
    # recall vs exact neighbors
    hits = tot = 0
    for i in range(0, 300, 10):
        d = ((X - X[i]) ** 2).sum(1)
        d[i] = np.inf
        exact = set(np.argsort(d)[:5].tolist())
        hits += len(exact & set(nbr[i].tolist()))
        tot += 5
    assert hits / tot > 0.7, hits / tot


def test_aca_baca():
    """ACA / BACA cross approximation (dense/ACA.cpp, BACA.cpp roles)."""
    import jax.numpy as jnp
    from strumpack_tpu.ops.aca import aca, baca
    rng = np.random.default_rng(0)
    m = 64
    G = rng.standard_normal((2, m, 6)) @ rng.standard_normal((2, 6, m))
    T = jnp.asarray(G)
    for fn in (aca, baca):
        U, V, ranks = fn(T, jnp.asarray(1e-10), 16)
        err = np.linalg.norm(np.asarray(U @ V) - G) / np.linalg.norm(G)
        assert err < 1e-8, (fn.__name__, err)
        assert int(np.asarray(ranks).max()) <= 8, fn.__name__


def test_butterfly_exact_low_rank():
    """Butterfly factorization is exact on globally low-rank input."""
    import jax.numpy as jnp
    from strumpack_tpu.structured.butterfly import ButterflyMatrix
    rng = np.random.default_rng(0)
    m = 128
    A = np.outer(rng.standard_normal(m), rng.standard_normal(m))
    B = ButterflyMatrix(jnp.asarray(A), levels=4, max_rank=4, rel_tol=1e-12)
    x = rng.standard_normal(m)
    y = np.asarray(B.matvec(jnp.asarray(x)))
    assert np.linalg.norm(y - A @ x) / np.linalg.norm(A @ x) < 1e-12


def test_butterfly_dft():
    """Butterfly compresses the DFT (the canonical complementary-low-rank
    operator, ButterflyPACK's headline use case)."""
    import jax.numpy as jnp
    from strumpack_tpu.structured.butterfly import ButterflyMatrix
    rng = np.random.default_rng(1)
    m = 256
    j = np.arange(m)
    F = np.exp(2j * np.pi * np.outer(j, j) / m) / np.sqrt(m)
    B = ButterflyMatrix(jnp.asarray(F), levels=4, max_rank=40, rel_tol=1e-9)
    x = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    y = np.asarray(B.matvec(jnp.asarray(x)))
    assert np.linalg.norm(y - F @ x) / np.linalg.norm(F @ x) < 1e-7


def test_butterfly_facade():
    from strumpack_tpu.structured.structured import (StructuredOptions,
                                                     Type,
                                                     construct_from_dense)
    rng = np.random.default_rng(2)
    m = 128
    j = np.arange(m)
    # real oscillatory kernel
    A = np.cos(2 * np.pi * np.outer(j, j) / m) + 0.0
    # real oscillatory kernels carry two frequencies -> ~2x the complex
    # butterfly rank
    S = construct_from_dense(A, StructuredOptions(type=Type.BUTTERFLY,
                                                  rel_tol=1e-8,
                                                  max_rank=48,
                                                  leaf_size=8))
    x = rng.standard_normal(m)
    rel = (np.linalg.norm(np.asarray(S.mult(x)) - A @ x)
           / np.linalg.norm(A @ x))
    assert rel < 1e-6, rel


def test_hodbf_oscillatory_matvec_and_solve():
    """HODBF (butterfly off-diagonal blocks inside the HODLR tree,
    ButterflyPACK's HODBF role): compresses an oscillatory operator whose
    HODLR off-diagonal ranks would blow up, and solves via the
    HODLR-preconditioned GMRES on the HODBF matvec."""
    import jax.numpy as jnp
    from strumpack_tpu.structured.structured import (StructuredOptions,
                                                     Type,
                                                     construct_from_dense)
    rng = np.random.default_rng(3)
    m = 256
    j = np.arange(m)
    # oscillatory off-diagonal field (unnormalized cos kernel has spectral
    # norm m/16 here) + dominant diagonal: well-conditioned but with
    # full-rank-per-block oscillatory structure (1D Helmholtz character)
    A = (np.cos(2 * np.pi * np.outer(j, j) / m) / 8.0
         + np.eye(m) * (4.0 + 0.1 * rng.standard_normal(m)))
    sopts = StructuredOptions(type=Type.HODBF, rel_tol=1e-8,
                              max_rank=48, leaf_size=32)
    S = construct_from_dense(A, sopts)
    x = rng.standard_normal(m)
    rel = (np.linalg.norm(np.asarray(S.mult(x)) - A @ x)
           / np.linalg.norm(A @ x))
    assert rel < 1e-6, rel
    # plain HODLR at the same rank cap cannot represent the oscillatory
    # off-diagonal blocks (flat singular spectrum) — HODBF's reason to be
    sopts_h = StructuredOptions(type=Type.HODLR, rel_tol=1e-8,
                                max_rank=48, leaf_size=32)
    Sh = construct_from_dense(A, sopts_h)
    rel_h = (np.linalg.norm(np.asarray(Sh.mult(x)) - A @ x)
             / np.linalg.norm(A @ x))
    assert rel < 1e-3 * rel_h, (rel, rel_h)
    S.factor()
    b = A @ x
    xs = np.asarray(S.solve(jnp.asarray(b)))
    relx = np.linalg.norm(xs - x) / np.linalg.norm(x)
    assert relx < 1e-5, relx
    assert S.rank() > 0 and S.memory() > 0
    # TRUE direct factorization (bpack_factor role): the direct solve
    # needs no outer Krylov iterations (<= a couple of IR sweeps)
    assert S.h.iterations <= 2, S.h.iterations


def test_hodbf_direct_factor_butterfly_path():
    """TRUE HODBF factorization through the butterfly-algebra path
    (HODLRWrapper.cpp bpack_factor / bpack_solve — randomized butterfly
    inversion, VERDICT r3 missing 6): G = A_child^{-1} B blocks are
    butterfly-compressed from black-box products (bf_compress_rand) and
    the Schur correction W = I - G21 G12 is compressed from matvecs as a
    fresh half-size HODBF and factored recursively.  A small
    dense_cutoff forces the butterfly branch; solve must hit the
    tolerance with at most a couple of IR sweeps (no outer GMRES)."""
    import jax.numpy as jnp
    from strumpack_tpu.structured.hodbf import HODBFMatrix
    rng = np.random.default_rng(11)
    m = 512
    j = np.arange(m)
    A = (np.cos(2 * np.pi * np.outer(j, j) / m) / 8.0
         + np.eye(m) * (4.0 + 0.1 * rng.standard_normal(m)))
    H = HODBFMatrix(jnp.asarray(A), leaf_size=32, max_rank=48,
                    rel_tol=1e-8)
    H.factor(dense_cutoff=64)     # ml in {256, 128} take the bf branch
    assert any(f is not None for f in [H._froot])
    # at least one correction in the factor tree used the butterfly path
    kinds = []

    def walk(f):
        kinds.append(f.kind)
        if f.kind != "leaf":
            walk(f.f1)
            walk(f.f2)
    walk(H._froot)
    assert "bf" in kinds, kinds
    x = rng.standard_normal(m)
    b = A @ x
    xs = np.asarray(H.solve(jnp.asarray(b)))
    relx = np.linalg.norm(xs - x) / np.linalg.norm(x)
    assert relx < 1e-5, relx
    assert H.iterations <= 2, H.iterations
    # adjoint solve through the same factor chain
    ys = np.asarray(H.rsolve(jnp.asarray(A.T @ x)))
    rely = np.linalg.norm(ys - x) / np.linalg.norm(x)
    assert rely < 1e-5, rely


def test_butterfly_compress_from_matvec():
    """Randomized butterfly construction from black-box products only
    (HODLRMatrix.hpp:215 compress(mult) / bpack_construct_matvec role):
    on the DFT matrix the sampled construction matches the dense-built
    butterfly to the truncation tolerance, adjoint included."""
    import jax
    import jax.numpy as jnp
    from strumpack_tpu.structured.butterfly import (bf_compress_rand,
                                                    bf_matvec, bf_rmatvec)
    m = 256
    jj = np.arange(m)
    A = jnp.asarray(np.exp(2j * np.pi * np.outer(jj, jj) / m)
                    / np.sqrt(m), jnp.complex128)
    D, r = 4, 32
    bf = bf_compress_rand(lambda X: A @ X, lambda Y: A.conj().T @ Y,
                          m, m, D, r, 1e-10,
                          key=jax.random.PRNGKey(3))
    X = jnp.asarray(np.random.default_rng(0).standard_normal((m, 5)),
                    jnp.complex128)
    err = float(jnp.linalg.norm(bf_matvec(bf, X, D, r) - A @ X)
                / jnp.linalg.norm(A @ X))
    assert err < 1e-7, err
    errt = float(jnp.linalg.norm(bf_rmatvec(bf, X, D, r)
                                 - A.conj().T @ X)
                 / jnp.linalg.norm(A.conj().T @ X))
    assert errt < 1e-7, errt


def test_kernel_matrix_free_fit():
    """Matrix-free kernel fit (HSS/HSSMatrix.compress_kernel.hpp role):
    the n x n kernel matrix is never materialized — the sampling
    constructor consumes a tiled matvec closure + per-entry evaluation.
    On a compressible (2-D) kernel the matrix-free weights reproduce the
    dense-built fit."""
    import numpy as np
    from strumpack_tpu.kernel.kernel import GaussKernel
    rng = np.random.default_rng(1)
    n = 1200
    X = rng.standard_normal((n, 2))
    y = np.sin(X[:, 0]) + 0.5 * np.cos(2 * X[:, 1])
    kd = GaussKernel(h=1.0, lam=0.5)
    kd.fit_HSS(X, y, leaf_size=128, rel_tol=1e-8, matrix_free=False)
    pd = kd.predict(X[:200])
    km = GaussKernel(h=1.0, lam=0.5)
    km.fit_HSS(X, y, leaf_size=128, rel_tol=1e-8, matrix_free=True)
    pm = km.predict(X[:200])
    rel = np.linalg.norm(pd - pm) / np.linalg.norm(pd)
    # matrix-free compresses in f32 (the TPU dtype); dense test path is f64
    assert rel < 5e-3, rel
    # regression quality itself
    assert np.linalg.norm(pd - y[:200]) / np.linalg.norm(y[:200]) < 0.3
