"""Unified structured dense matrix facade.

Role of the reference's ``structured::StructuredMatrix``
(structured/StructuredMatrix.hpp:209: runtime facade over HSS / BLR / HODLR
/ LR / LOSSY with ``construct_from_dense`` :464, ``construct_from_elements``
:562, and mult/factor/solve/memory/rank operations; type enum
StructuredOptions.hpp:60-81).
"""
from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np


class Type(enum.Enum):
    HSS = "hss"
    BLR = "blr"
    HODLR = "hodlr"
    HODBF = "hodbf"
    BUTTERFLY = "butterfly"
    LR = "lr"
    LOSSY = "lossy"


class StructuredOptions:
    """structured/StructuredOptions.hpp:43-54 defaults."""

    def __init__(self, type=Type.BLR, rel_tol=1e-4, abs_tol=1e-10,
                 leaf_size=128, max_rank=None):
        self.type = Type(type)
        self.rel_tol = rel_tol
        self.abs_tol = abs_tol
        self.leaf_size = leaf_size
        self.max_rank = max_rank


class StructuredMatrix:
    """Base interface: mult / factor / solve / shift / rank / memory."""

    rows: int
    cols: int

    def mult(self, x):
        raise NotImplementedError

    def factor(self):
        raise NotImplementedError

    def solve(self, b):
        raise NotImplementedError

    def shift(self, sigma):
        raise NotImplementedError

    def rank(self) -> int:
        raise NotImplementedError

    def memory(self) -> int:
        raise NotImplementedError

    def nonzeros(self) -> int:
        return self.memory()

    def __matmul__(self, x):
        return self.mult(x)


def construct_from_dense(A, opts: StructuredOptions | None = None,
                         **kw) -> StructuredMatrix:
    """Factory, StructuredMatrix.hpp:464."""
    opts = opts or StructuredOptions(**kw) if (opts is None) else opts
    t = opts.type
    if t == Type.HSS:
        return _HSSWrap(A, opts)
    if t == Type.HODLR:
        return _HODLRWrap(A, opts)
    if t == Type.HODBF:
        return _HODBFWrap(A, opts)
    if t == Type.BLR:
        return _BLRDense(A, opts)
    if t == Type.LR:
        return _LRMatrix(A, opts)
    if t == Type.LOSSY:
        return _LossyMatrix(A, opts)
    if t == Type.BUTTERFLY:
        return _ButterflyWrap(A, opts)
    raise ValueError(t)


def construct_partially_matrix_free(mult, elem, n,
                                    opts: StructuredOptions | None = None,
                                    **kw) -> StructuredMatrix:
    """HSS from a matvec closure + element function via randomized
    sampling (StructuredMatrix.hpp construct_partially_matrix_free)."""
    opts = opts or StructuredOptions(**kw)
    assert opts.type == Type.HSS, "matrix-free construction is HSS-only"
    from .hss_sample import hss_from_sampling
    import jax.numpy as jnp
    w = _HSSWrap.__new__(_HSSWrap)
    w.rows = w.cols = n
    w.h = hss_from_sampling(
        mult, elem, n, leaf_size=opts.leaf_size,
        max_rank=opts.max_rank or max(16, opts.leaf_size // 2),
        rel_tol=opts.rel_tol, dtype=jnp.float64)
    return w


def construct_matrix_free(mult, n, opts=None, **kw) -> StructuredMatrix:
    """HSS from a matvec closure only: element extraction is emulated by
    additional matvecs against unit-vector blocks (exact, O(n/leaf) extra
    products) — StructuredMatrix.hpp construct_matrix_free."""
    import jax.numpy as jnp
    import numpy as _np

    def elem(I, J):
        I = _np.asarray(I)
        J = _np.asarray(J)
        cols = _np.unique(J.ravel())
        E = _np.zeros((n, len(cols)))
        E[cols, _np.arange(len(cols))] = 1.0
        AE = _np.asarray(mult(jnp.asarray(E), False))   # [n, ncols]
        colpos = _np.searchsorted(cols, J)
        out = AE[_np.broadcast_to(I, _np.broadcast_shapes(I.shape, J.shape)),
                 _np.broadcast_to(colpos,
                                  _np.broadcast_shapes(I.shape, J.shape))]
        return jnp.asarray(out)

    return construct_partially_matrix_free(mult, elem, n, opts, **kw)


def construct_from_elements(elem, rows, cols,
                            opts: StructuredOptions | None = None,
                            **kw) -> StructuredMatrix:
    """Factory from an element function elem(i, j) -> value
    (StructuredMatrix.hpp:562).  Builds the dense matrix on host (the
    TPU-native formats compress from dense); a sampling-based matrix-free
    path is provided for HSS via hss_sample."""
    I, J = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    A = np.asarray(elem(I, J))
    return construct_from_dense(A, opts, **kw)


# ---------------------------------------------------------------------------

class _HSSWrap(StructuredMatrix):
    def __init__(self, A, opts):
        from .hss import HSSMatrix
        A = np.asarray(A)
        self.rows, self.cols = A.shape
        self.h = HSSMatrix(A, leaf_size=opts.leaf_size,
                           max_rank=opts.max_rank, rel_tol=opts.rel_tol)

    def mult(self, x):
        return self.h.matvec(x)

    def factor(self):
        self.h.factor()

    def solve(self, b):
        return self.h.solve(b)

    def rank(self):
        return self.h.max_rank()

    def memory(self):
        return self.h.memory()


class _HODLRWrap(StructuredMatrix):
    def __init__(self, A, opts):
        from .hodlr import HODLRMatrix
        A = np.asarray(A)
        self.rows, self.cols = A.shape
        self.h = HODLRMatrix(A, leaf_size=opts.leaf_size,
                             max_rank=opts.max_rank, rel_tol=opts.rel_tol)

    def mult(self, x):
        return self.h.matvec(x)

    def factor(self):
        self.h.factor()

    def solve(self, b):
        return self.h.solve(b)

    def rank(self):
        return self.h.max_rank()

    def memory(self):
        return self.h.memory()


class _HODBFWrap(StructuredMatrix):
    """HODLR with butterfly off-diagonal blocks (ButterflyPACK HODBF
    role); factor/solve = TRUE direct butterfly factorization
    (bpack_factor / bpack_solve: multiplicative level sweep with
    butterfly-compressed A^{-1}B blocks and recursively factored Schur
    corrections) + short iterative refinement."""

    def __init__(self, A, opts):
        from .hodbf import HODBFMatrix
        A = np.asarray(A)
        self.rows, self.cols = A.shape
        self.h = HODBFMatrix(A, leaf_size=opts.leaf_size,
                             max_rank=opts.max_rank, rel_tol=opts.rel_tol)

    def mult(self, x):
        return self.h.matvec(x)

    def factor(self):
        self.h.factor()

    def solve(self, b):
        return self.h.solve(b)

    def rank(self):
        return self.h.max_rank()

    def memory(self):
        return self.h.memory()


class _BLRDense(StructuredMatrix):
    """Standalone dense BLR matrix via the level-batched tile kernels
    (BLR/BLRMatrix.hpp:68 standalone role: compress, factor, solve)."""

    def __init__(self, A, opts):
        from ..frontal.blr import choose_tile
        A = jnp.asarray(A)
        self.rows, self.cols = A.shape
        m = self.rows
        t = choose_tile(_pad_to(m, opts.leaf_size), 0, opts.leaf_size)
        self.mpad = ((m + t - 1) // t) * t
        self.t = t
        self.r = min(opts.max_rank or t // 2, t)
        self.opts = opts
        Ap = jnp.zeros((self.mpad, self.mpad), A.dtype)
        Ap = Ap.at[:m, :m].set(A)
        if self.mpad > m:
            ii = jnp.arange(m, self.mpad)
            Ap = Ap.at[ii, ii].set(1.0)
        self.Ap = Ap
        self._tiles = None  # compressed representation for mult
        self._fac = None
        self._compress()

    def _compress(self):
        from ..frontal.blr import _compress_tiles
        m, t = self.mpad, self.t
        nt = m // t
        tiles = self.Ap.reshape(nt, t, nt, t).transpose(0, 2, 1, 3)
        tol = jnp.asarray(self.opts.rel_tol,
                          jnp.real(jnp.zeros((), self.Ap.dtype)).dtype)
        U, V, ranks = _compress_tiles(tiles, tol, self.r)
        ii = jnp.arange(nt)
        diag = tiles[ii, ii]
        self._tiles = (diag, U, V)
        offdiag = ~np.eye(nt, dtype=bool)
        self._ranks = np.asarray(ranks)[offdiag]

    def mult(self, x):
        diag, U, V = self._tiles
        m, t = self.mpad, self.t
        nt = m // t
        squeeze = x.ndim == 1
        x = jnp.asarray(x, self.Ap.dtype)
        if squeeze:
            x = x[:, None]
        xp = jnp.zeros((m, x.shape[1]), x.dtype).at[:self.rows].set(x)
        xb = xp.reshape(nt, t, -1)
        vx = jnp.einsum("ijrt,jtk->ijrk", V, xb)
        y = jnp.einsum("ijtr,ijrk->itk", U, vx)
        # replace diagonal contribution with the dense diagonal tiles
        ii = jnp.arange(nt)
        ydiag_lr = jnp.einsum("itr,irk->itk", U[ii, ii], vx[ii, ii])
        y = y - ydiag_lr + jnp.einsum("its,isk->itk", diag, xb)
        y = y.reshape(m, -1)[:self.rows]
        return y[:, 0] if squeeze else y

    def factor(self):
        from ..frontal.blr import blr_factor_bucket
        t = self.t
        nt = self.mpad // t
        tol = jnp.asarray(self.opts.rel_tol,
                          jnp.real(jnp.zeros((), self.Ap.dtype)).dtype)
        out = blr_factor_bucket(self.Ap[None], jnp.asarray(0.0, tol.dtype),
                                tol, t=t, r=self.r, nts=nt, nt=nt)
        self._fac = out

    def solve(self, b):
        from ..frontal.blr import blr_fwd_bucket, blr_bwd_bucket
        if self._fac is None:
            self.factor()
        lud, perms, Uu, Vu, Ul, Vl, Du, Dl, CB, rk = self._fac
        t = self.t
        nt = self.mpad // t
        squeeze = b.ndim == 1
        b = jnp.asarray(b, self.Ap.dtype)
        if squeeze:
            b = b[:, None]
        bp = jnp.zeros((self.mpad, b.shape[1]), b.dtype).at[:self.rows].set(b)
        y, _ = blr_fwd_bucket(lud, perms, Ul, Vl, Dl, bp[None], t=t, nts=nt,
                              nt=nt)
        x = blr_bwd_bucket(lud, Uu, Vu, Du, y,
                           jnp.zeros((1, 0, b.shape[1]), b.dtype),
                           t=t, nts=nt, nt=nt)
        x = x[0, :self.rows]
        return x[:, 0] if squeeze else x

    def rank(self):
        return int(self._ranks.max()) if self._ranks.size else 0

    def memory(self):
        diag, U, V = self._tiles
        nt = self.mpad // self.t
        # actual (masked) rank storage
        return int(diag.size + 2 * self.t * self._ranks.sum())


class _ButterflyWrap(StructuredMatrix):
    """Butterfly (HODBF off-diagonal block role): mult-only facade entry —
    butterfly blocks are applied, not solved, in the reference too
    (ButterflyMatrix has no standalone factor/solve)."""

    def __init__(self, A, opts):
        from .butterfly import ButterflyMatrix
        A = np.asarray(A)
        self.rows, self.cols = A.shape
        self.bf = ButterflyMatrix(jnp.asarray(A),
                                  leaf_size=min(opts.leaf_size, 64),
                                  max_rank=opts.max_rank or 32,
                                  rel_tol=opts.rel_tol)

    def mult(self, x):
        return self.bf.matvec(x)

    def rank(self):
        return self.bf.max_rank()

    def memory(self):
        return self.bf.memory()


class _LRMatrix(StructuredMatrix):
    """Global low-rank: A ~= U V (StructuredOptions Type LR)."""

    def __init__(self, A, opts):
        A = jnp.asarray(A)
        self.rows, self.cols = A.shape
        U, S, Vh = jnp.linalg.svd(A, full_matrices=False)
        s0 = float(S[0]) if S.size else 0.0
        k = int(np.sum(np.asarray(S) > opts.rel_tol * max(s0, 1e-300)))
        k = min(k, opts.max_rank or k)
        self.U = U[:, :k] * S[None, :k]
        self.V = Vh[:k, :]

    def mult(self, x):
        return self.U @ (self.V @ x)

    def rank(self):
        return self.U.shape[1]

    def memory(self):
        return int(self.U.size + self.V.size)


class _LossyMatrix(StructuredMatrix):
    """Lossy-compressed dense storage: per-tile int8 quantization with f32
    scales — the on-TPU analog of the reference's ZFP-compressed factors
    (FrontLossy.cpp:46-90); decompressed on the fly for mult/factor."""

    TILE = 32

    def __init__(self, A, opts):
        A = jnp.asarray(A, jnp.float32)
        self.rows, self.cols = A.shape
        T = self.TILE
        mp = ((self.rows + T - 1) // T) * T
        npd = ((self.cols + T - 1) // T) * T
        Ap = jnp.zeros((mp, npd), jnp.float32).at[:self.rows,
                                                  :self.cols].set(A)
        tiles = Ap.reshape(mp // T, T, npd // T, T).transpose(0, 2, 1, 3)
        scale = jnp.max(jnp.abs(tiles), axis=(-2, -1), keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-30)
        self.q = jnp.round(tiles / scale).astype(jnp.int8)
        self.scale = scale.astype(jnp.float32)
        self.mp, self.np_ = mp, npd
        self._lu = None

    def _dense(self):
        T = self.TILE
        tiles = self.q.astype(jnp.float32) * self.scale
        return tiles.transpose(0, 2, 1, 3).reshape(self.mp, self.np_)

    def mult(self, x):
        squeeze = x.ndim == 1
        x = jnp.asarray(x, jnp.float32)
        if squeeze:
            x = x[:, None]
        xp = jnp.zeros((self.np_, x.shape[1]), jnp.float32
                       ).at[:self.cols].set(x)
        y = (self._dense() @ xp)[:self.rows]
        return y[:, 0] if squeeze else y

    def factor(self):
        D = self._dense()[:self.rows, :self.cols]
        lu, _, perm = jax.lax.linalg.lu(D)
        self._lu = (lu, perm)

    def solve(self, b):
        if self._lu is None:
            self.factor()
        lu, perm = self._lu
        squeeze = b.ndim == 1
        b = jnp.asarray(b, jnp.float32)
        if squeeze:
            b = b[:, None]
        bp = b[perm]
        y = jax.lax.linalg.triangular_solve(lu, bp, left_side=True,
                                            lower=True, unit_diagonal=True)
        x = jax.lax.linalg.triangular_solve(lu, y, left_side=True,
                                            lower=False)
        return x[:, 0] if squeeze else x

    def rank(self):
        return min(self.rows, self.cols)

    def memory(self):
        return int(self.q.size + self.scale.size * 4)


def _pad_to(x, m):
    return ((x + m - 1) // m) * m
