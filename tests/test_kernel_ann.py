"""ANN-based HSS kernel compression (HSSMatrix.compress_kernel.hpp role)."""
import numpy as np
import jax.numpy as jnp
import pytest

from strumpack_tpu.kernel.kernel import GaussKernel, recursive_pca_order
from strumpack_tpu.kernel.clustering import approximate_knn
from strumpack_tpu.structured.hss_sample import hss_from_neighbors


def _setup(n=600, d=2, lam=2.0, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d))
    Xo = X[recursive_pca_order(X, leaf=32)]
    ker = GaussKernel(h=1.0, lam=lam)
    K = np.asarray(ker.eval(jnp.asarray(Xo), jnp.asarray(Xo))) \
        + lam * np.eye(n)
    Xd = jnp.asarray(Xo)

    def elem(I, J):
        I2, J2 = jnp.broadcast_arrays(jnp.asarray(I), jnp.asarray(J))
        v = ker.eval_pairs(Xd[I2], Xd[J2]).astype(jnp.float64)
        return v + lam * (I2 == J2).astype(jnp.float64)

    return Xo, ker, K, elem


def test_ann_hss_matvec_and_solve():
    """Neighbor-built HSS approximates the kernel matrix and its ULV
    solve refines to the compression level — no matvecs, no sketches."""
    n = 600
    Xo, ker, K, elem = _setup(n)
    nbr, _ = approximate_knn(Xo, k=12)
    H = hss_from_neighbors(elem, nbr, n, leaf_size=64, max_rank=40,
                           rel_tol=1e-7, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    V = rng.standard_normal((n, 3))
    err = np.linalg.norm(np.asarray(H.matvec(jnp.asarray(V))) - K @ V) \
        / np.linalg.norm(K @ V)
    assert err < 1e-2, err
    H.factor()
    b = K @ np.ones(n)
    x = np.asarray(H.solve(jnp.asarray(b)))
    res = np.linalg.norm(K @ x - b) / np.linalg.norm(b)
    assert res < 1e-2, res


def test_fit_hss_ann_end_to_end():
    """Kernel.fit_HSS(compression='ann') — the kernel-ML entry point of
    the neighbor compression (kernel/Kernel.hpp fit_HSS + ANN)."""
    rng = np.random.default_rng(3)
    n = 500
    X = rng.standard_normal((n, 2))
    y = np.sign(X[:, 0] * X[:, 1] + 0.1 * rng.standard_normal(n))
    ker = GaussKernel(h=0.8, lam=3.0)
    w = ker.fit_HSS(X, y, leaf_size=64, max_rank=40, rel_tol=1e-6,
                    compression="ann")
    pred = np.sign(ker.predict(X))
    acc = (pred == y).mean()
    assert acc > 0.8, acc
