"""Kernel-matrix machine learning: kernel ridge regression/classification.

Role of the reference's ``kernel/Kernel.hpp:73`` (Kernel base +
GaussKernel:333, LaplaceKernel:378, ANOVAKernel:424, DenseKernel:486;
distance metrics Metrics.hpp; ``fit_HSS:189`` / ``fit_HODLR:264`` /
``predict:203``) and the sklearn estimator
``python/STRUMPACKKernel.py.in:10``.

fit: cluster the training points (recursive PCA/kd bisection so nearby
points are contiguous — the clustering/ role), compress K + lambda*I with a
rank-structured format (HSS or HODLR), factor, solve for the weights.
predict: K(test, train) @ weights, computed in tiles on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# clustering (role of clustering/Clustering.hpp binary_tree_clustering)
# ---------------------------------------------------------------------------

def recursive_pca_order(X, leaf=64):
    """Return an index permutation ordering points by recursive PCA
    bisection (clustering 'PCA' option, PCAPartitioning.cpp analog)."""
    n = X.shape[0]
    order = np.empty(n, dtype=np.int64)
    pos = [0]

    def rec(idx):
        if len(idx) <= leaf:
            order[pos[0]:pos[0] + len(idx)] = idx
            pos[0] += len(idx)
            return
        P = X[idx]
        c = P - P.mean(axis=0)
        # leading principal direction via a few power iterations
        v = np.random.default_rng(0).standard_normal(P.shape[1])
        for _ in range(8):
            v = c.T @ (c @ v)
            v /= np.linalg.norm(v) + 1e-300
        proj = c @ v
        med = np.median(proj)
        left = idx[proj <= med]
        right = idx[proj > med]
        if len(left) == 0 or len(right) == 0:
            half = len(idx) // 2
            left, right = idx[:half], idx[half:]
        rec(left)
        rec(right)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        rec(np.arange(n, dtype=np.int64))
    finally:
        sys.setrecursionlimit(old)
    return order


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

class Kernel:
    """Base kernel (kernel/Kernel.hpp:73)."""

    def __init__(self, h: float = 1.0, lam: float = 1.0):
        self.h = float(h)
        self.lam = float(lam)

    def eval(self, X, Y):
        """Kernel block K(X, Y) on device: [nx, ny]."""
        raise NotImplementedError

    def _sqdist(self, X, Y):
        X = jnp.asarray(X)
        Y = jnp.asarray(Y)
        d = (jnp.sum(X * X, 1)[:, None] + jnp.sum(Y * Y, 1)[None, :]
             - 2.0 * X @ Y.T)
        return jnp.maximum(d, 0.0)

    # ---- fitting ------------------------------------------------------
    def fit_HSS(self, X, y, leaf_size=128, max_rank=None, rel_tol=1e-4,
                cluster_leaf=64, matrix_free=None, compression="sketch"):
        """matrix_free=None auto-enables the matrix-free compression
        (never materializes the n x n kernel matrix) above n=8192.
        compression: "sketch" (randomized sampling, default) or "ann"
        (approximate-nearest-neighbor interpolative bases — the
        HSSMatrix.compress_kernel role: no matvecs, O(n·c) kernel
        evaluations)."""
        return self._fit(X, y, "hss", leaf_size, max_rank, rel_tol,
                         cluster_leaf, matrix_free=matrix_free,
                         compression=compression)

    def fit_HODLR(self, X, y, leaf_size=128, max_rank=None, rel_tol=1e-4,
                  cluster_leaf=64):
        return self._fit(X, y, "hodlr", leaf_size, max_rank, rel_tol,
                         cluster_leaf)

    def eval_pairs(self, Xi, Xj):
        """Elementwise kernel k(Xi[..., :], Xj[..., :]) for broadcastable
        point arrays [..., d] — the element-extraction closure of the
        matrix-free fit (reference: per-entry kernel evaluation in
        HSS/HSSMatrix.compress_kernel.hpp)."""
        raise NotImplementedError

    def _fit(self, X, y, fmt, leaf_size, max_rank, rel_tol, cluster_leaf,
             matrix_free=None, dtype=np.float32, compression="sketch"):
        # TPU's default-precision matmuls are bf16 — ruinous for the
        # compression/ULV numerics (same trap as the sparse solver,
        # PERF.md); pin full f32 MXU passes for the whole fit
        with jax.default_matmul_precision("float32"):
            return self._fit_inner(X, y, fmt, leaf_size, max_rank,
                                   rel_tol, cluster_leaf, matrix_free,
                                   dtype, compression)

    def _fit_inner(self, X, y, fmt, leaf_size, max_rank, rel_tol,
                   cluster_leaf, matrix_free, dtype,
                   compression="sketch"):
        X = np.asarray(X, np.float64)
        y = np.asarray(y, np.float64)
        n = len(X)
        order = recursive_pca_order(X, leaf=cluster_leaf)
        Xo = X[order]
        if matrix_free is None:
            matrix_free = fmt == "hss" and (n > 8192
                                            or compression == "ann")
        if matrix_free and fmt == "hss":
            M = self._compress_matrix_free(Xo, leaf_size, max_rank,
                                           rel_tol, dtype=dtype,
                                           compression=compression)
        else:
            K = np.asarray(self.eval(Xo, Xo))
            K = K + self.lam * np.eye(len(Xo))
            if fmt == "hss":
                from ..structured.hss import HSSMatrix
                M = HSSMatrix(jnp.asarray(K), leaf_size=leaf_size,
                              max_rank=max_rank, rel_tol=rel_tol)
            else:
                from ..structured.hodlr import HODLRMatrix
                M = HODLRMatrix(jnp.asarray(K), leaf_size=leaf_size,
                                max_rank=max_rank, rel_tol=rel_tol)
        M.factor()
        w = np.asarray(M.solve(jnp.asarray(y[order])))
        self._Xtrain = Xo
        self._weights = w
        self._order = order
        self._M = M
        return w

    def _compress_matrix_free(self, Xo, leaf_size, max_rank, rel_tol,
                              dtype=np.float32, block=1024,
                              compression="sketch"):
        """HSS compression of K + lam*I WITHOUT materializing K
        (the reference's matrix-free kernel compression,
        HSS/HSSMatrix.compress_kernel.hpp / kernel/Kernel.hpp:189): the
        sampling constructor gets (a) a matvec closure evaluating
        K(tile, X) @ V in row tiles — O(n * block) memory — and (b) an
        element closure evaluating single kernel entries; clustering has
        already made index-contiguous blocks spatial neighborhoods, so
        the off-diagonal ranks are as low as ANN-based compression
        achieves."""
        from ..structured.hss_sample import hss_from_sampling
        n, d = Xo.shape
        dt = jnp.dtype(dtype)
        Xd = jnp.asarray(Xo, dt)
        lam = jnp.asarray(self.lam, dt)
        nb = -(-n // block)
        npad = nb * block
        Xp = jnp.concatenate(
            [Xd, jnp.full((npad - n, d), jnp.inf, dt)]).reshape(
                nb, block, d)

        def mult(V, trans):
            # K is symmetric: K @ V == K^T @ V; row tiles keep the
            # [block, n] kernel panel as the only O(n)-width temporary
            def tile(xb):
                Kb = self.eval(xb, Xd).astype(dt)
                Kb = jnp.where(jnp.isfinite(Kb), Kb, 0.0)
                return jnp.matmul(Kb, V, preferred_element_type=dt)
            out = jax.lax.map(tile, Xp).reshape(npad, -1)[:n]
            return out + lam * V

        def elem(I, J):
            I2, J2 = jnp.broadcast_arrays(jnp.asarray(I), jnp.asarray(J))
            v = self.eval_pairs(Xd[I2], Xd[J2]).astype(dt)
            return v + lam * (I2 == J2).astype(dt)

        r = int(max_rank) if max_rank else max(16, int(leaf_size) // 2)
        if compression == "ann":
            # neighbor-based interpolative compression
            # (HSSMatrix.compress_kernel.hpp role): no matvecs at all
            from .clustering import approximate_knn
            from ..structured.hss_sample import hss_from_neighbors
            nbr, _ = approximate_knn(np.asarray(Xo),
                                     k=min(16, max(8, r // 2)))
            return hss_from_neighbors(elem, nbr, n,
                                      leaf_size=int(leaf_size),
                                      max_rank=r, rel_tol=rel_tol,
                                      dtype=dt)
        return hss_from_sampling(mult, elem, n, leaf_size=int(leaf_size),
                                 max_rank=r, oversample=16,
                                 rel_tol=rel_tol, dtype=dt)

    def predict(self, Xtest, weights=None, block=4096):
        """K(test, train) @ weights, tiled (kernel/Kernel.hpp:203)."""
        w = jnp.asarray(self._weights if weights is None else weights)
        Xtr = jnp.asarray(self._Xtrain)
        Xtest = np.asarray(Xtest, np.float64)
        outs = []
        with jax.default_matmul_precision("float32"):
            for lo in range(0, len(Xtest), block):
                Kb = self.eval(jnp.asarray(Xtest[lo:lo + block]), Xtr)
                outs.append(np.asarray(Kb @ w))
        return np.concatenate(outs)


class GaussKernel(Kernel):
    """exp(-|x-y|^2 / (2 h^2)) (Kernel.hpp:333)."""

    def eval(self, X, Y):
        return jnp.exp(-self._sqdist(X, Y) / (2.0 * self.h * self.h))

    def eval_pairs(self, Xi, Xj):
        d2 = jnp.sum((Xi - Xj) ** 2, axis=-1)
        return jnp.exp(-d2 / (2.0 * self.h * self.h))


class LaplaceKernel(Kernel):
    """exp(-|x-y|_1 / h) (Kernel.hpp:378)."""

    def eval(self, X, Y):
        X = jnp.asarray(X)
        Y = jnp.asarray(Y)
        d1 = jnp.sum(jnp.abs(X[:, None, :] - Y[None, :, :]), axis=-1)
        return jnp.exp(-d1 / self.h)

    def eval_pairs(self, Xi, Xj):
        return jnp.exp(-jnp.sum(jnp.abs(Xi - Xj), axis=-1) / self.h)


class ANOVAKernel(Kernel):
    """ANOVA kernel of degree p (Kernel.hpp:424)."""

    def __init__(self, h=1.0, lam=1.0, p=1):
        super().__init__(h, lam)
        self.p = int(p)

    def eval(self, X, Y):
        X = jnp.asarray(X)
        Y = jnp.asarray(Y)
        ker = jnp.exp(-((X[:, None, :] - Y[None, :, :]) ** 2)
                      / (2.0 * self.h * self.h))
        return jnp.sum(ker, axis=-1) ** self.p

    def eval_pairs(self, Xi, Xj):
        ker = jnp.exp(-((Xi - Xj) ** 2) / (2.0 * self.h * self.h))
        return jnp.sum(ker, axis=-1) ** self.p


class DenseKernel(Kernel):
    """Wrap a user-supplied dense matrix (Kernel.hpp:486)."""

    def __init__(self, K, lam=1.0):
        super().__init__(1.0, lam)
        self.K = np.asarray(K)

    def eval(self, X, Y):
        # indices passed as "points"
        I = np.asarray(X).astype(int).ravel()
        J = np.asarray(Y).astype(int).ravel()
        return jnp.asarray(self.K[np.ix_(I, J)])


class KernelRegressionClassifier:
    """scikit-learn style estimator (python/STRUMPACKKernel.py.in:10):
    binary classification by sign of kernel ridge regression on +/-1
    labels."""

    def __init__(self, h=1.0, lam=4.0, kernel="rbf", p=1,
                 fmt="hss", leaf_size=128, max_rank=None, rel_tol=1e-4):
        self.h, self.lam, self.kernel, self.p = h, lam, kernel, p
        self.fmt, self.leaf_size = fmt, leaf_size
        self.max_rank, self.rel_tol = max_rank, rel_tol

    def _make(self):
        if self.kernel in ("rbf", "gauss"):
            return GaussKernel(self.h, self.lam)
        if self.kernel == "laplace":
            return LaplaceKernel(self.h, self.lam)
        if self.kernel == "anova":
            return ANOVAKernel(self.h, self.lam, self.p)
        raise ValueError(self.kernel)

    def fit(self, X, y):
        self._classes = np.unique(y)
        assert len(self._classes) == 2, "binary classification only"
        z = np.where(np.asarray(y) == self._classes[1], 1.0, -1.0)
        self._k = self._make()
        fit = (self._k.fit_HSS if self.fmt == "hss" else self._k.fit_HODLR)
        fit(X, z, leaf_size=self.leaf_size, max_rank=self.max_rank,
            rel_tol=self.rel_tol)
        return self

    def decision_function(self, X):
        return self._k.predict(X)

    def predict(self, X):
        return np.where(self.decision_function(X) >= 0,
                        self._classes[1], self._classes[0])

    def score(self, X, y):
        return float(np.mean(self.predict(X) == np.asarray(y)))
