"""Randomized-sampling HSS construction (matrix-free / from elements).

Role of the reference's core compression algorithm
(``HSS/HSSMatrix.compress.hpp`` / ``compress_stable.hpp``: sketch S = A R,
Sc = A^H R, bottom-up interpolative-decomposition bases with element
extraction of the D and B generators; sketch operators Gaussian or SJLT,
``HSSMatrix.sketch.hpp:260``).

TPU-first shape: the adaptive d0 + k*dd loop (HSSOptions d0=128 dd=64)
becomes a **fixed oversampled sketch with masked ranks** (SURVEY.md 7
hard-part (c)); the ID is a batched greedy row-pivoted orthogonalization
(the ``geqp3tol`` role) over all nodes of a level at once.

Interpolative bases are just a particular choice of the U/V generators, so
the result populates the same (D, Uleaf, Vleaf, Ru, Rv, B12, B21) fields as
the dense constructor in hss.py and reuses its matvec / ULV factor / solve.

Derivation of the recursions (node i, index block I, complement comp):
  row side:  A(I,:) ~= X_i A(Jg_i,:)      X_i [k,r], Jg_i selected rows
  col side:  A(:,I) ~= A(:,Kg_i) Y_i^H    Y_i [k,r], Kg_i selected cols
  Sred_i = S(Jg_i) - A(Jg_i,I) R(I)  (off-diagonal row samples at Jg)
  Gred_i = Sc(Kg_i) - A(I,Kg_i)^H R(I)
  RredC_i = Y_i^H R(I)   (column-interp-reduced randoms)
  RredR_i = X_i^H R(I)   (row-basis-reduced randoms)
  parent (children c1,c2, B12 = A(Jg_c1,Kg_c2), B21 = A(Jg_c2,Kg_c1)):
  Sloc = [Sred_c1 - B12 RredC_c2 ; Sred_c2 - B21 RredC_c1]   -> ID -> Xn
  Gloc = [Gred_c1 - B21^H RredR_c2 ; Gred_c2 - B12^H RredR_c1] -> ID -> Yn
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .hss import HSSMatrix, _pad_pow2


def _id_rows(F, tol, r):
    """Batched greedy interpolative decomposition of the rows of F.

    F [N, k, d]  ->  X [N, k, r], Jloc [N, r], ranks [N]
    such that F ~= X @ F[Jloc, :] (the geqp3tol/RRQR role)."""
    N, k, d = F.shape
    norms0 = jnp.linalg.norm(F, axis=-1).max(axis=-1)  # [N]

    def body(step, st):
        res, Jloc, sn = st
        rn = jnp.linalg.norm(res, axis=-1)            # [N, k]
        i = jnp.argmax(rn, axis=-1).astype(jnp.int32)  # [N]
        Jloc = Jloc.at[:, step].set(i)
        sn = sn.at[:, step].set(
            jnp.take_along_axis(rn, i[:, None], 1)[:, 0])
        v = jnp.take_along_axis(res, i[:, None, None], 1)[:, 0]  # [N, d]
        vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
        v = v / jnp.maximum(vn, jnp.finfo(F.dtype).tiny)
        coef = jnp.einsum("nkd,nd->nk", res, v.conj())
        res = res - coef[:, :, None] * v[:, None, :]
        return res, Jloc, sn

    _, Jloc, sn = jax.lax.fori_loop(
        0, r, body,
        (F, jnp.zeros((N, r), jnp.int32),
         jnp.zeros((N, r), jnp.real(jnp.zeros((), F.dtype)).dtype)))
    ranks = (sn > tol * jnp.maximum(
        norms0, jnp.finfo(F.dtype).tiny)[:, None]).sum(axis=1)
    rmask = jnp.arange(r)[None, :] < ranks[:, None]   # [N, r]

    # X = F Fj^H (Fj Fj^H + eps)^(-1), masked beyond rank
    Fj = jnp.take_along_axis(F, Jloc[:, :, None], 1)  # [N, r, d]
    Fj = jnp.where(rmask[:, :, None], Fj, 0.0)
    G = jnp.einsum("nrd,nsd->nrs", Fj, Fj.conj())
    eps = jnp.finfo(F.dtype).eps * jnp.maximum(
        jnp.trace(G.real, axis1=-2, axis2=-1), 1.0)[:, None, None]
    G = G + (eps + (~rmask[:, :, None]) * 1.0) * jnp.eye(r, dtype=F.dtype)
    FFj = jnp.einsum("nkd,nrd->nkr", F, Fj.conj())
    X = jnp.linalg.solve(G.transpose(0, 2, 1).conj(),
                         FFj.transpose(0, 2, 1).conj()
                         ).transpose(0, 2, 1).conj()
    X = jnp.where(rmask[:, None, :], X, 0.0)
    return X, Jloc, ranks


def hss_from_sampling(mult, elem, m, leaf_size=64, max_rank=32,
                      oversample=16, rel_tol=1e-6, dtype=jnp.float32,
                      sketch="gaussian", seed=0,
                      constrain=None) -> HSSMatrix:
    """Construct an HSSMatrix from a matvec closure + element function.

    mult(X, trans) -> A @ X (trans False) or A^H @ X (trans True)
    elem(I, J) -> A[I, J] for broadcastable index arrays

    Role of StructuredMatrix construct_partially_matrix_free
    (StructuredMatrix.hpp construct_matrix_free + element extraction)."""
    t = int(leaf_size)
    mp, L = _pad_pow2(m, t)
    r = int(min(max_rank, t))
    d = r + oversample

    key = jax.random.PRNGKey(seed)
    if sketch == "sjlt":
        # sparse Johnson-Lindenstrauss sketch (HSSMatrix.sketch.hpp role)
        nnz_col = min(8, m)
        k1, k2 = jax.random.split(key)
        rows = jax.random.randint(k1, (d, nnz_col), 0, m)
        signs = jnp.where(
            jax.random.bernoulli(k2, 0.5, (d, nnz_col)), 1.0, -1.0
        ).astype(dtype)
        R = jnp.zeros((m, d), dtype)
        R = R.at[rows.T, jnp.arange(d)[None, :]].add(signs.T)
        R = R / np.sqrt(nnz_col)
    else:
        R = jax.random.normal(key, (m, d), dtype)
    if constrain is not None:
        # intra-front distribution (FrontHSSMPI / DistSamples role):
        # the sampling matvecs and the node-batched compression shard
        # over the mesh via the caller's constraint callback — the
        # sample-column axis d and the leaf/node batch axis survive
        # every level transition, so GSPMD partitions cleanly (unlike
        # the HODLR block axis, MULTICHIP_r03 remat warnings)
        R = constrain(R)
    S = mult(R, False)
    Sc = mult(R, True)
    if constrain is not None:
        S, Sc = constrain(S), constrain(Sc)

    def pad(M):
        return jnp.zeros((mp, M.shape[1]), dtype).at[:m].set(M)

    Rp, Sp, Scp = pad(R), pad(S), pad(Sc)
    tol = jnp.asarray(rel_tol, jnp.real(jnp.zeros((), dtype)).dtype)
    nl = 2 ** L
    leaf_idx = jnp.minimum(jnp.arange(nl * t).reshape(nl, t), m - 1)
    in_range = (jnp.arange(nl * t).reshape(nl, t) < m)

    # leaf D blocks via element extraction (identity on the padded range)
    D = elem(leaf_idx[:, :, None], leaf_idx[:, None, :]).astype(dtype)
    D = jnp.where(in_range[:, :, None] & in_range[:, None, :], D,
                  jnp.eye(t, dtype=dtype)[None])

    Rb = Rp.reshape(nl, t, d)
    if constrain is not None:
        D, Rb = constrain(D), constrain(Rb)
    Floc = Sp.reshape(nl, t, d) - jnp.einsum("nts,nsd->ntd", D, Rb)
    Floc = jnp.where(in_range[:, :, None], Floc, 0.0)
    X, Jl, rksU = _id_rows(Floc, tol, r)
    Gloc = Scp.reshape(nl, t, d) - jnp.einsum(
        "nst,nsd->ntd", D.conj(), Rb)
    Gloc = jnp.where(in_range[:, :, None], Gloc, 0.0)
    Y, Kl, rksV = _id_rows(Gloc, tol, r)

    Jg = jnp.take_along_axis(leaf_idx, Jl, 1)        # [nl, r] global rows
    Kg = jnp.take_along_axis(leaf_idx, Kl, 1)
    Sred = jnp.take_along_axis(Floc, Jl[:, :, None], 1)
    Gred = jnp.take_along_axis(Gloc, Kl[:, :, None], 1)
    RredC = jnp.einsum("ntr,ntd->nrd", Y.conj(), Rb)   # Y^H R(I)
    RredR = jnp.einsum("ntr,ntd->nrd", X.conj(), Rb)   # X^H R(I)

    H = HSSMatrix.__new__(HSSMatrix)
    H.m, H.t, H.mp, H.L, H.r = m, t, mp, L, r
    H.rel_tol = rel_tol
    H.dtype = jnp.zeros((), dtype).dtype
    H._factored = False
    H._constrain = constrain
    H.D = D
    H.Uleaf = X
    H.Vleaf = Y
    H.ranks = [(rksU, rksV)]
    H.Ru, H.Rv, H.B12, H.B21 = [], [], [], []

    for lev in range(L - 1, -1, -1):
        half = 2 ** lev
        i1 = 2 * jnp.arange(half)
        i2 = i1 + 1
        B12 = elem(Jg[i1][:, :, None], Kg[i2][:, None, :]).astype(dtype)
        B21 = elem(Jg[i2][:, :, None], Kg[i1][:, None, :]).astype(dtype)
        H.B12.append(B12)
        H.B21.append(B21)
        if lev == 0:
            break
        Sloc = jnp.concatenate([
            Sred[i1] - jnp.einsum("hrs,hsd->hrd", B12, RredC[i2]),
            Sred[i2] - jnp.einsum("hrs,hsd->hrd", B21, RredC[i1])], axis=1)
        Gloc = jnp.concatenate([
            Gred[i1] - jnp.einsum("hsr,hsd->hrd", B21.conj(), RredR[i2]),
            Gred[i2] - jnp.einsum("hsr,hsd->hrd", B12.conj(), RredR[i1])],
            axis=1)
        Xn, Jl2, _ = _id_rows(Sloc, tol, r)
        Yn, Kl2, _ = _id_rows(Gloc, tol, r)
        H.Ru.append(Xn)
        H.Rv.append(Yn)
        Jg = jnp.take_along_axis(
            jnp.concatenate([Jg[i1], Jg[i2]], axis=1), Jl2, 1)
        Kg = jnp.take_along_axis(
            jnp.concatenate([Kg[i1], Kg[i2]], axis=1), Kl2, 1)
        Sred = jnp.take_along_axis(Sloc, Jl2[:, :, None], 1)
        Gred = jnp.take_along_axis(Gloc, Kl2[:, :, None], 1)
        RredC = jnp.einsum("hkr,hkd->hrd", Yn.conj(),
                           jnp.concatenate([RredC[i1], RredC[i2]], axis=1))
        RredR = jnp.einsum("hkr,hkd->hrd", Xn.conj(),
                           jnp.concatenate([RredR[i1], RredR[i2]], axis=1))
    return H


def _node_neighbor_columns(ann, m, t, L, c, seed=0):
    """Per-level candidate COLUMN sets from an approximate-kNN graph
    (host precompute for hss_from_neighbors).

    For each node of each level: the nearest neighbors of the node's
    members that lie OUTSIDE the node (nearest-first, round-robin over
    members), padded with random far-field columns up to width ``c``.
    Returns {level: [n_nodes, c] int32} for levels L (leaves) .. 1."""
    rng = np.random.default_rng(seed)
    ann = np.asarray(ann)
    out = {}
    for lev in range(L, 0, -1):
        w = t * 2 ** (L - lev)
        n_nodes = 2 ** lev
        cols = np.zeros((n_nodes, c), np.int32)
        for h in range(n_nodes):
            lo, hi = h * w, min((h + 1) * w, m)
            if lo >= m:
                cols[h] = rng.integers(0, m, c)
                continue
            nb = ann[lo:hi].T.ravel()          # nearest-first round-robin
            nb = nb[(nb >= 0) & ((nb < lo) | (nb >= hi))]
            # first occurrences keep the nearest-first order
            _, first = np.unique(nb, return_index=True)
            nb = nb[np.sort(first)][:c]
            k = len(nb)
            cols[h, :k] = nb
            if k < c:
                # far-field fill: random columns outside the node
                fill = rng.integers(0, max(m - (hi - lo), 1), c - k)
                fill = np.where(fill >= lo, fill + (hi - lo), fill)
                cols[h, k:] = np.minimum(fill, m - 1)
        out[lev] = cols
    return out


def hss_from_neighbors(elem, ann, m, leaf_size=64, max_rank=32,
                       n_extra=16, rel_tol=1e-6, dtype=jnp.float32,
                       seed=0) -> HSSMatrix:
    """ANN-based HSS compression for SYMMETRIC kernel matrices — the
    reference's neighbor-search compression
    (``HSS/HSSMatrix.compress_kernel.hpp``: interpolative bases computed
    from each cluster's approximate nearest neighbors instead of random
    sketches; no matvecs at all, only O(n · c) kernel evaluations).

    elem(I, J) -> A[I, J] (A real symmetric: K(x, y) + lam·I)
    ann [m, k]: approximate kNN ids in the CLUSTERED point order
    (kernel/clustering.py approximate_knn — NeighborSearch.cpp role).

    Rationale: after spatial clustering, the numerical row space of the
    off-diagonal block A(I, far) is captured by the columns nearest to
    the cluster (kernel decay), so the ID of A(I, neighbors ∪ randoms)
    yields the same U generators the sketching builder extracts from
    S = A R — at O(t·c) kernel entries per node instead of O(m·d) flops
    per sketch.  The V side equals the U side by symmetry."""
    t = int(leaf_size)
    mp, L = _pad_pow2(m, t)
    r = int(min(max_rank, t))
    c = max(2 * r, 32) + int(n_extra)
    cand = _node_neighbor_columns(ann, m, t, L, c, seed=seed)

    tol = jnp.asarray(rel_tol, jnp.real(jnp.zeros((), dtype)).dtype)
    nl = 2 ** L
    leaf_idx = jnp.minimum(jnp.arange(nl * t).reshape(nl, t), m - 1)
    in_range = (jnp.arange(nl * t).reshape(nl, t) < m)

    D = elem(leaf_idx[:, :, None], leaf_idx[:, None, :]).astype(dtype)
    D = jnp.where(in_range[:, :, None] & in_range[:, None, :], D,
                  jnp.eye(t, dtype=dtype)[None])

    C0 = jnp.asarray(cand[L])
    F = elem(leaf_idx[:, :, None], C0[:, None, :]).astype(dtype)
    F = jnp.where(in_range[:, :, None], F, 0.0)
    X, Jl, rks = _id_rows(F, tol, r)
    Jg = jnp.take_along_axis(leaf_idx, Jl, 1)

    H = HSSMatrix.__new__(HSSMatrix)
    H.m, H.t, H.mp, H.L, H.r = m, t, mp, L, r
    H.rel_tol = rel_tol
    H.dtype = jnp.zeros((), dtype).dtype
    H._factored = False
    H._constrain = None
    H.D = D
    H.Uleaf = X
    H.Vleaf = X.conj()
    H.ranks = [(rks, rks)]
    H.Ru, H.Rv, H.B12, H.B21 = [], [], [], []

    Kg = Jg
    rk = rks
    for lev in range(L - 1, -1, -1):
        half = 2 ** lev
        i1 = 2 * jnp.arange(half)
        i2 = i1 + 1
        B12 = elem(Jg[i1][:, :, None], Kg[i2][:, None, :]).astype(dtype)
        B21 = elem(Jg[i2][:, :, None], Kg[i1][:, None, :]).astype(dtype)
        H.B12.append(B12)
        H.B21.append(B21)
        if lev == 0:
            break
        rows2 = jnp.concatenate([Jg[i1], Jg[i2]], axis=1)      # [half, 2r]
        # rows beyond a child's achieved rank are meaningless selections:
        # zero them so the parent ID can never pick them
        rmask2 = jnp.concatenate(
            [jnp.arange(r)[None, :] < rk[i1][:, None],
             jnp.arange(r)[None, :] < rk[i2][:, None]], axis=1)
        Cp = jnp.asarray(cand[lev])
        Fp = elem(rows2[:, :, None], Cp[:, None, :]).astype(dtype)
        Fp = jnp.where(rmask2[:, :, None], Fp, 0.0)
        Xn, Jl2, rk = _id_rows(Fp, tol, r)
        H.Ru.append(Xn)
        H.Rv.append(Xn.conj())
        Jg = jnp.take_along_axis(rows2, Jl2, 1)
        Kg = Jg
    return H
