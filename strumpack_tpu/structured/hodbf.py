"""HODBF: HODLR with butterfly off-diagonal blocks (JAX).

Role of ButterflyPACK's HODBF format as wrapped by the reference's
``HODLR/HODLRMatrix`` (HODLRMatrix.hpp:79 with HODLROptions butterfly
levels > 0, the HODBF fronts of FrontHODLR): for oscillatory operators
(Helmholtz kernels, Fourier integral operators) the HODLR off-diagonal
blocks are not low-rank but ARE complementary-low-rank — each block is
stored as a butterfly factorization instead of a P Q^H outer product, so
memory stays O(r m log m) where plain HODLR ranks would blow up.

TPU-first design choices:

* every level's pair of sibling off-diagonal blocks is compressed /
  applied as ONE ``vmap``-ed butterfly kernel over the [2^lev] block
  batch (bf_compress / bf_matvec are functional pytree transforms);
* ButterflyPACK factors HODBF exactly with randomized butterfly
  inversion; here ``solve`` is an outer GMRES on the fast HODBF matvec
  preconditioned by an HODLR (low-rank SMW) factorization of the same
  matrix — same capability surface (compress / matvec / factor / solve),
  compiler-friendly static shapes throughout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .butterfly import bf_compress, bf_matvec, bf_depth, bf_memory
from .hodlr import HODLRMatrix
from .hss import _pad_pow2


class HODBFMatrix:
    def __init__(self, A, leaf_size=64, max_rank=None, rel_tol=1e-6):
        A = jnp.asarray(A)
        self.m = A.shape[0]
        self.t = int(leaf_size)
        self.mp, self.L = _pad_pow2(self.m, self.t)
        self.r = int(max_rank) if max_rank else max(8, self.t // 2)
        self.rel_tol = rel_tol
        self.dtype = A.dtype
        self._compress(A)
        # HODLR (SMW) preconditioner over the same matrix: rank-truncated
        # off-diagonals are inexact for oscillatory operators but make an
        # effective preconditioner for the outer GMRES in solve().
        self._prec = HODLRMatrix(A, leaf_size=self.t, max_rank=self.r,
                                 rel_tol=max(rel_tol, 1e-8))
        self._factored = False

    def _compress(self, A):
        m, mp, t, r, L = self.m, self.mp, self.t, self.r, self.L
        tol = jnp.asarray(self.rel_tol,
                          jnp.real(jnp.zeros((), A.dtype)).dtype)
        if mp != m:
            Ap = jnp.zeros((mp, mp), A.dtype)
            Ap = Ap.at[:m, :m].set(A)
            Ap = Ap.at[jnp.arange(m, mp), jnp.arange(m, mp)].set(1.0)
        else:
            Ap = A
        nl = 2 ** L
        self.D = Ap.reshape(nl, t, nl, t).transpose(0, 2, 1, 3)[
            jnp.arange(nl), jnp.arange(nl)]
        # per level: butterfly pytrees for the two sibling blocks, with the
        # butterfly depth chosen per block size and the per-level rank
        # capped at what a block of that size can use (r <= block/2 keeps
        # the factorization smaller than dense; _trunc_basis's tolerance
        # masks adapt the EFFECTIVE rank per node below the cap, the
        # ButterflyPACK adaptive-rank role)
        self.bf12, self.bf21, self.bf_D, self.bf_r = [], [], [], []
        for lev in range(L - 1, -1, -1):
            half = 2 ** lev
            ml = mp // (2 * half)
            Ar = Ap.reshape(2 * half, ml, 2 * half, ml)
            i1 = 2 * jnp.arange(half)
            i2 = i1 + 1
            A12 = Ar[i1, :, i2, :]    # [half, ml, ml]
            A21 = Ar[i2, :, i1, :]
            Dh = bf_depth(ml, self.t)
            rl = min(r, max(8, ml // 2))
            comp = jax.vmap(lambda Ab: bf_compress(Ab, Dh, rl, tol))
            self.bf12.append(comp(A12))
            self.bf21.append(comp(A21))
            self.bf_D.append(Dh)
            self.bf_r.append(rl)

    # ------------------------------------------------------------------
    def matvec(self, x):
        m, mp, t, r, L = self.m, self.mp, self.t, self.r, self.L
        squeeze = x.ndim == 1
        x = jnp.asarray(x, self.dtype)
        if squeeze:
            x = x[:, None]
        k = x.shape[1]
        xp = jnp.zeros((mp, k), self.dtype).at[:m].set(x)
        nl = 2 ** L
        y = jnp.einsum("nts,nsk->ntk", self.D,
                       xp.reshape(nl, t, k)).reshape(mp, k)
        for li, lev in enumerate(range(L - 1, -1, -1)):
            half = 2 ** lev
            ml = mp // (2 * half)
            Dh, rl = self.bf_D[li], self.bf_r[li]
            xb = xp.reshape(half, 2, ml, k)
            mv = jax.vmap(lambda bf, xx: bf_matvec(bf, xx, Dh, rl))
            y12 = mv(self.bf12[li], xb[:, 1])
            y21 = mv(self.bf21[li], xb[:, 0])
            y = y + jnp.stack([y12, y21], axis=1).reshape(mp, k)
        return (y[:m, 0] if squeeze else y[:m])

    # ------------------------------------------------------------------
    def factor(self):
        self._prec.factor()
        self._factored = True

    def solve(self, b, rtol=None, maxit=200):
        """GMRES on the HODBF matvec, HODLR-SMW preconditioned."""
        from ..krylov.solvers import gmres
        if not self._factored:
            self.factor()
        rtol = self.rel_tol if rtol is None else rtol
        b = jnp.asarray(b, self.dtype)
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        cols = []
        self.iterations = 0
        for j in range(b.shape[1]):
            x, its, _ = gmres(self.matvec, self._prec.solve, b[:, j],
                              rtol=rtol, atol=0.0, maxit=maxit)
            self.iterations = max(self.iterations, its)
            cols.append(x)
        x = jnp.stack(cols, axis=1)
        return x[:, 0] if squeeze else x

    # ------------------------------------------------------------------
    def memory(self) -> int:
        tot = int(self.D.size)
        for bfs in self.bf12 + self.bf21:
            tot += bf_memory(bfs)
        return tot

    def max_rank(self) -> int:
        mr = 0
        for bfs in self.bf12 + self.bf21:
            mr = max(mr, int(np.asarray(bfs["rkU"]).max()),
                     int(np.asarray(bfs["rkV"]).max()))
        return mr
