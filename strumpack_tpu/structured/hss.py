"""HSS (hierarchically semi-separable) matrices, level-batched (JAX).

Role of the reference's ``HSS/HSSMatrix.{hpp,cpp}`` + algorithm headers
(compression HSSMatrix.compress.hpp, ULV factorization
HSSMatrix.factor.hpp:51-147, solve HSSMatrix.solve.hpp, matvec apply) —
re-designed TPU-first:

* the cluster tree is a **perfect binary tree over an identity-padded
  range** (m padded to t * 2^L): every level's nodes have identical static
  shapes, so compression, ULV and solve are all batched [2^l, ...] kernels
  — no per-node recursion, no ragged shapes;
* bases are **orthonormal with fixed max rank r and masked actual ranks**
  (truncated SVD at relative tolerance; the reference uses ID/RRQR bases
  with an E-factor, HSSBasisID.hpp:43 — orthonormal bases give the simpler
  orthogonal-elimination ULV);
* ULV uses full-QR orthogonal transforms to decouple (t - r) rows/cols per
  leaf (2r - r per internal node), LU on the decoupled block, Schur-reduced
  r x r problem passed up; root solved dense — the same elimination
  pattern as the reference's ULV with LQ (HSSMatrix.factor.hpp:122).

Construction here is **from a dense matrix** (the structured::StructuredMatrix
``construct_from_dense`` path, StructuredMatrix.hpp:464); matrix-free
randomized-sampling construction reuses the same per-level compression with
sketch products and is layered on top in hss_sample.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import trisolve as TS
import numpy as np


def _pad_pow2(m: int, leaf: int):
    L = 0
    while leaf * (2 ** L) < m:
        L += 1
    return leaf * (2 ** L), L


@partial(jax.jit, static_argnames=("r",))
def _trunc_basis(X, tol, r):
    """Orthonormal column basis of each batched block row X [..., k, m],
    rank <= r, masked at relative tolerance: returns U [..., k, r]
    (zero-padded when min(k, m) < r)."""
    Uf, S, _ = jnp.linalg.svd(X, full_matrices=False)
    q = S.shape[-1]
    if q < r:
        Uf = jnp.concatenate(
            [Uf, jnp.zeros(Uf.shape[:-1] + (r - q,), Uf.dtype)], axis=-1)
        S = jnp.concatenate(
            [S, jnp.zeros(S.shape[:-1] + (r - q,), S.dtype)], axis=-1)
    s0 = S[..., :1]
    keep = (S > tol * jnp.maximum(s0, jnp.finfo(X.dtype).tiny))[..., :r]
    U = jnp.where(keep[..., None, :], Uf[..., :, :r], 0.0)
    return U, keep.sum(axis=-1)


class HSSMatrix:
    """Compressed HSS form of a square matrix (device arrays)."""

    def __init__(self, A, leaf_size=64, max_rank=None, rel_tol=1e-6,
                 constrain=None):
        """``constrain`` is an optional GSPMD sharding-constraint
        callback applied to every node-axis-batched array during
        compression and ULV factorization: under a mesh it partitions
        the per-node SVD/QR/matmul work across devices, distributing ONE
        huge dense-built HSS front (the FrontHSSMPI role for the
        dense-constructed path, FrontHSSMPI.cpp — the sampling-built
        analog lives in hss_sample.py 'samp' mode)."""
        A = jnp.asarray(A)
        self.m = A.shape[0]
        self.t = int(leaf_size)
        self.mp, self.L = _pad_pow2(self.m, self.t)
        self.r = int(max_rank) if max_rank else max(8, self.t // 2)
        self.r = min(self.r, self.t)
        self.rel_tol = rel_tol
        self.dtype = A.dtype
        self._constrain = constrain if constrain is not None else _ident
        self._compress(A)
        self._factored = False

    # ------------------------------------------------------------------
    def _compress(self, A):
        m, mp, t, r, L = self.m, self.mp, self.t, self.r, self.L
        tol = jnp.asarray(self.rel_tol, jnp.real(jnp.zeros((), A.dtype)).dtype)
        if mp != m:
            Ap = jnp.zeros((mp, mp), A.dtype)
            Ap = Ap.at[:m, :m].set(A)
            Ap = Ap.at[jnp.arange(m, mp), jnp.arange(m, mp)].set(1.0)
        else:
            Ap = A
        nl = 2 ** L  # leaves
        con = self._constrain
        self.D = con(Ap.reshape(nl, t, nl, t).transpose(0, 2, 1, 3)[
            jnp.arange(nl), jnp.arange(nl)])  # [nl, t, t]

        # ---- leaf row/col bases
        blocks = Ap.reshape(nl, t, mp)
        # zero own columns for the off-diagonal (Hankel) block row
        col_owner = jnp.repeat(jnp.arange(nl), t)
        mask = (col_owner[None, :] != jnp.arange(nl)[:, None])
        rows_off = con(blocks * mask[:, None, :])
        U, rksU = _trunc_basis(rows_off, tol, r)         # [nl, t, r]
        cols_off = con(Ap.T.reshape(nl, t, mp) * mask[:, None, :])
        V, rksV = _trunc_basis(cols_off.conj(), tol, r)  # [nl, t, r]
        self.Uleaf, self.Vleaf = U, V
        self.ranks = [(rksU, rksV)]

        # reduced rows/cols and explicit big bases
        Rr = con(jnp.einsum("ntr,ntm->nrm", U.conj(), rows_off))  # [nl,r,mp]
        Cc = con(jnp.einsum("nmt,ntr->nmr", cols_off.conj()
                            .transpose(0, 2, 1).conj(), V))
        Ubig = U  # [nodes, block, r]
        Vbig = V
        self.Ru, self.Rv, self.B12, self.B21 = [], [], [], []
        for lev in range(L - 1, -1, -1):
            nodes = 2 ** lev
            half = nodes
            blk = mp // (2 * nodes)       # child block length
            i1 = 2 * jnp.arange(half)
            i2 = i1 + 1
            # B generators between the two children of each node
            Rr_r = Rr.reshape(2 * nodes, r, 2 * nodes, blk)
            Z12 = Rr_r[i1, :, i2, :]       # [half, r, blk]
            Z21 = Rr_r[i2, :, i1, :]
            self.B12.append(jnp.einsum("hrb,hbs->hrs", Z12, Vbig[i2]))
            self.B21.append(jnp.einsum("hrb,hbs->hrs", Z21, Vbig[i1]))
            if lev == 0:
                break
            # stack children reduced rows, zero own (merged) columns
            S = jnp.concatenate([Rr[i1], Rr[i2]], axis=1)  # [half, 2r, mp]
            col_owner = jnp.repeat(jnp.arange(nodes), 2 * blk)
            maskn = (col_owner[None, :] != jnp.arange(nodes)[:, None])
            S = con(S * maskn[:, None, :])
            Ru, _ = _trunc_basis(S, tol, r)                # [half, 2r, r]
            Rr = con(jnp.einsum("hkr,hkm->hrm", Ru.conj(), S))
            # Cc is [2*nodes, mp, r] -> stack the two children along the
            # rank axis: [half, mp, 2r]
            T = jnp.concatenate([Cc[i1], Cc[i2]], axis=2)
            T = con(T * maskn[:, :, None])
            Rv, _ = _trunc_basis(T.conj().transpose(0, 2, 1), tol, r)
            Cc = con(jnp.einsum("hmk,hkr->hmr", T, Rv))
            self.Ru.append(Ru)
            self.Rv.append(Rv)
            # explicit big bases for the next level up
            ub = Ubig.shape[1]
            Ubig2 = jnp.zeros((half, 2 * ub, 2 * r), Ubig.dtype)
            Ubig2 = Ubig2.at[:, :ub, :r].set(Ubig[i1])
            Ubig2 = Ubig2.at[:, ub:, r:].set(Ubig[i2])
            Ubig = jnp.einsum("hbk,hkr->hbr", Ubig2, Ru)
            Vbig2 = jnp.zeros((half, 2 * ub, 2 * r), Vbig.dtype)
            Vbig2 = Vbig2.at[:, :ub, :r].set(Vbig[i1])
            Vbig2 = Vbig2.at[:, ub:, r:].set(Vbig[i2])
            Vbig = jnp.einsum("hbk,hkr->hbr", Vbig2, Rv)

    # ------------------------------------------------------------------
    def matvec(self, x):
        """y = A_hss @ x (x: [m] or [m, k])."""
        m, mp, t, r, L = self.m, self.mp, self.t, self.r, self.L
        squeeze = x.ndim == 1
        x = jnp.asarray(x, self.dtype)
        if squeeze:
            x = x[:, None]
        k = x.shape[1]
        xp = jnp.zeros((mp, k), self.dtype).at[:self.m].set(x)
        nl = 2 ** L
        xb = xp.reshape(nl, t, k)
        y = jnp.einsum("nts,nsk->ntk", self.D, xb)
        # upsweep: g_node = Vbig^T x restricted — computed recursively
        g = jnp.einsum("ntr,ntk->nrk", self.Vleaf.conj(), xb)  # [nl, r, k]
        gs = [g]
        for lev in range(L - 1, 0, -1):
            half = 2 ** lev
            i1 = 2 * jnp.arange(half)
            i2 = i1 + 1
            stacked = jnp.concatenate([g[i1], g[i2]], axis=1)  # [half,2r,k]
            g = jnp.einsum("hkr,hkc->hrc", self.Rv[L - 1 - lev].conj(),
                           stacked)
            gs.append(g)
        # downsweep: f contributions
        f = None
        for lev in range(0, L):
            half = 2 ** lev
            gl = gs[L - 1 - lev]  # children-level g: [2*half, r, k]
            i1 = 2 * jnp.arange(half)
            i2 = i1 + 1
            fc1 = jnp.einsum("hrs,hsk->hrk", self.B12[L - 1 - lev], gl[i2])
            fc2 = jnp.einsum("hrs,hsk->hrk", self.B21[L - 1 - lev], gl[i1])
            fnew = jnp.zeros((2 * half, r, k), self.dtype)
            fnew = fnew.at[i1].set(fc1).at[i2].set(fc2)
            if f is not None:
                # translate parent f to children: f_child += Ru_part @ f_par
                Ru = self.Ru[L - 1 - lev]  # [half, 2r, r]
                fpar = jnp.einsum("hkr,hrc->hkc", Ru, f)  # [half, 2r, k]
                fnew = fnew.at[i1].add(fpar[:, :r]).at[i2].add(fpar[:, r:])
            f = fnew
        if f is not None:
            y = y + jnp.einsum("ntr,nrk->ntk", self.Uleaf, f)
        y = y.reshape(mp, k)[:self.m]
        return y[:, 0] if squeeze else y

    # ------------------------------------------------------------------
    def factor(self):
        """ULV factorization (HSSMatrix.factor.hpp analog)."""
        t, r, L = self.t, self.r, self.L
        dt = self.dtype
        D = self.D      # [nodes, m_l, m_l]
        U, V = self.Uleaf, self.Vleaf
        self._ulv = []
        con = getattr(self, "_constrain", None) or _ident
        for lev in range(L, 0, -1):
            nodes = 2 ** lev
            ml = D.shape[1]
            Qu, RU = jnp.linalg.qr(U, mode="complete")  # U = Qu [RU;0]
            Qv, RV = jnp.linalg.qr(V, mode="complete")
            Dp = con(jnp.einsum("nij,njk,nkl->nil",
                                Qu.conj().transpose(0, 2, 1), con(D), Qv))
            D11 = Dp[:, :r, :r]
            D12 = Dp[:, :r, r:]
            D21 = Dp[:, r:, :r]
            D22 = Dp[:, r:, r:]
            lu22, p22 = TS.unrolled_lu(D22)
            X = _lu_solve(lu22, p22, D21)     # D22^-1 D21
            Dred = D11 - jnp.matmul(D12, X, preferred_element_type=dt)
            Uhat = RU[:, :r, :]               # [nodes, r, r]
            Vhat = RV[:, :r, :]
            self._ulv.append(dict(Qu=Qu, Qv=Qv, D12=D12, D21=D21,
                                  lu22=lu22, p22=p22))
            # assemble parent D, U, V
            half = nodes // 2
            i1 = 2 * jnp.arange(half)
            i2 = i1 + 1
            B12 = self.B12[L - lev]
            B21 = self.B21[L - lev]
            Dn = jnp.zeros((half, 2 * r, 2 * r), dt)
            Dn = Dn.at[:, :r, :r].set(Dred[i1])
            Dn = Dn.at[:, r:, r:].set(Dred[i2])
            Dn = Dn.at[:, :r, r:].set(jnp.einsum(
                "hab,hbc,hdc->had", Uhat[i1], B12, Vhat[i2].conj()))
            Dn = Dn.at[:, r:, :r].set(jnp.einsum(
                "hab,hbc,hdc->had", Uhat[i2], B21, Vhat[i1].conj()))
            D = Dn
            if lev > 1:
                Ru = self.Ru[L - lev]   # [half, 2r, r]
                Rv = self.Rv[L - lev]
                Ub = jnp.zeros((half, 2 * r, 2 * r), dt)
                Ub = Ub.at[:, :r, :r].set(Uhat[i1])
                Ub = Ub.at[:, r:, r:].set(Uhat[i2])
                U = jnp.matmul(Ub, Ru, preferred_element_type=dt)
                Vb = jnp.zeros((half, 2 * r, 2 * r), dt)
                Vb = Vb.at[:, :r, :r].set(Vhat[i1])
                Vb = Vb.at[:, r:, r:].set(Vhat[i2])
                V = jnp.matmul(Vb, Rv, preferred_element_type=dt)
        # root dense LU
        lur, pr = TS.unrolled_lu(D)
        self._root = (lur, pr)
        self._factored = True

    # ------------------------------------------------------------------
    def solve(self, b):
        """Solve A x = b via the ULV factorization."""
        if not self._factored:
            self.factor()
        m, mp, t, r, L = self.m, self.mp, self.t, self.r, self.L
        dt = self.dtype
        squeeze = b.ndim == 1
        b = jnp.asarray(b, dt)
        if squeeze:
            b = b[:, None]
        k = b.shape[1]
        bp = jnp.zeros((mp, k), dt).at[:m].set(b)
        nl = 2 ** L
        bl = bp.reshape(nl, t, k)
        stack = []
        for lev in range(L, 0, -1):
            s = self._ulv[L - lev]
            bq = jnp.einsum("nij,njk->nik", s["Qu"].conj().transpose(0, 2, 1),
                            bl)
            btop, bbot = bq[:, :r], bq[:, r:]
            w = _lu_solve(s["lu22"], s["p22"], bbot)
            btop = btop - jnp.matmul(s["D12"], w, preferred_element_type=dt)
            stack.append((bbot, w))
            half = (2 ** lev) // 2
            i1 = 2 * jnp.arange(half)
            i2 = i1 + 1
            bl = jnp.concatenate([btop[i1], btop[i2]], axis=1)  # [half,2r,k]
        lur, pr = self._root
        y = _lu_solve(lur, pr, bl)   # [1, mroot, k]
        # downsweep
        for lev in range(1, L + 1):
            s = self._ulv[L - lev]
            half = 2 ** (lev - 1)
            i1 = 2 * jnp.arange(half)
            i2 = i1 + 1
            nodes = 2 ** lev
            rr = y.shape[1] // 2
            ytop = jnp.zeros((nodes, rr, k), dt)
            ytop = ytop.at[i1].set(y[:, :rr]).at[i2].set(y[:, rr:])
            bbot, w = stack[L - lev]
            ybot = w - _lu_solve(
                s["lu22"], s["p22"],
                jnp.matmul(s["D21"], ytop, preferred_element_type=dt))
            yfull = jnp.concatenate([ytop, ybot], axis=1)
            y = jnp.einsum("nij,njk->nik", s["Qv"], yfull)
        x = y.reshape(mp, k)[:m]
        return x[:, 0] if squeeze else x

    # ------------------------------------------------------------------
    def memory(self) -> int:
        """Stored floats in the compressed representation."""
        tot = self.D.size + self.Uleaf.size + self.Vleaf.size
        for a in self.Ru + self.Rv + self.B12 + self.B21:
            tot += a.size
        return int(tot)

    def max_rank(self) -> int:
        rU, rV = self.ranks[0]
        return int(max(np.asarray(rU).max(), np.asarray(rV).max()))


def _hss_flatten(h: "HSSMatrix"):
    dyn_keys = [k for k, v in sorted(h.__dict__.items())
                if k not in _HSS_STATIC]
    children = tuple(h.__dict__[k] for k in dyn_keys)
    aux = (tuple(dyn_keys),
           tuple((k, h.__dict__.get(k)) for k in _HSS_STATIC))
    return children, aux


def _hss_unflatten(aux, children):
    h = HSSMatrix.__new__(HSSMatrix)
    dyn_keys, static_items = aux
    for k, v in static_items:
        h.__dict__[k] = v
    for k, v in zip(dyn_keys, children):
        h.__dict__[k] = v
    return h


_HSS_STATIC = ("m", "t", "mp", "L", "r", "rel_tol", "dtype", "_factored",
               "_constrain")


def _ident(x):
    return x

jax.tree_util.register_pytree_node(HSSMatrix, _hss_flatten, _hss_unflatten)


def _lu_solve(lu, piv_perm, b):
    """Batched LU solve given packed lu and applied permutation."""
    bp = jnp.take_along_axis(b, piv_perm[..., None], axis=-2)
    if TS.use_loopfree(lu.dtype) and lu.ndim == 3:
        y = TS.trsm_lower(lu, bp, unit=True)
        return TS.trsm_upper(lu, y)
    y = jax.lax.linalg.triangular_solve(lu, bp, left_side=True, lower=True,
                                        unit_diagonal=True)
    return jax.lax.linalg.triangular_solve(lu, y, left_side=True, lower=False)
