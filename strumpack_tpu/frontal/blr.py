"""BLR (block low-rank) front factorization, level-batched (JAX).

Role of the reference's ``BLR/BLRMatrix.cpp:740-1245``
(``construct_and_partial_factor``: fused build + tile compression + LU over
[F11 F12; F21 F22] with within-tile pivoting, right-looking updates) and
``FrontBLR.cpp:329`` — re-expressed TPU-first:

* fixed tile size ``t`` and **fixed maximum rank r with masked actual
  ranks** (SURVEY.md section 7 hard-part (c): adaptive-rank loops become
  fixed-size oversampling + masking so all shapes stay static);
* tiles of a whole block-row/column are processed together as batched
  [nf, nt, t, t] kernels — the OpenMP task-DAG of the reference becomes
  data parallelism over tiles and fronts (MXU-friendly batched matmuls);
* compression is a batched truncated SVD at relative tolerance
  (role of the reference's ``geqp3tol`` RRQR tiles); a Pallas RRQR kernel
  can replace it without changing the factor structure;
* within-tile partial pivoting via the batched LU kernel, like the
  reference's tile pivoting; no cross-tile pivoting (same as reference).

The Schur complement (CB) tiles are updated dense in the trailing matrix —
the reference's default dense-CB mode (FrontBLR.cpp F22 dense variant).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import trisolve as TS
import numpy as np


def choose_tile(s_pad: int, u_pad: int, leaf: int) -> int:
    """Largest tile size <= leaf dividing both padded dims, preferring a
    tiling with at least TWO separator tiles: a single-tile "BLR" front
    is a dense front in disguise — nothing compresses, and the tile-
    sharded distributed path (parallel/spmd.py mode 'tile') degenerates
    to fully replicated work."""
    if s_pad >= 128:
        for t in (256, 192, 128, 96, 64, 48, 32, 24, 16, 8, 4):
            if (t <= leaf and s_pad % t == 0 and s_pad // t >= 2
                    and (u_pad % t == 0 or u_pad == 0)):
                return t
    for t in (256, 192, 128, 96, 64, 48, 32, 24, 16, 8, 4):
        if t <= leaf and s_pad % t == 0 and (u_pad % t == 0 or u_pad == 0):
            return t
    return max(s_pad, 1)


@partial(jax.jit, static_argnames=("r", "algo"))
def _compress_tiles(T, tol, r, algo="rrqr"):
    """Batched low-rank tile compression at relative tolerance.

    Returns (U [..., t, r], V [..., r, t], ranks [...]) with columns beyond
    the numerical rank zero-masked (BLROptions rel_tol semantics).
    algo (BLROptions LowRankAlgorithm roles): "rrqr" (default, as in the
    reference — tolerance-stopped pivoted QR, ops/rrqr.py), "aca" / "baca"
    (cross approximation, element-based), or "svd" (truncated SVD,
    tightest ranks but heavy to compile on TPU).
    """
    if algo == "rrqr":
        from ..ops.rrqr import rrqr
        return rrqr(T, tol, r)
    if algo == "aca":
        from ..ops.aca import aca
        return aca(T, tol, r)
    if algo == "baca":
        from ..ops.aca import baca
        return baca(T, tol, r)
    Uf, S, Vh = jnp.linalg.svd(T, full_matrices=False)
    s0 = S[..., :1]
    keep = S > tol * jnp.maximum(s0, jnp.finfo(T.dtype).tiny)
    keep = keep[..., :r]
    Sk = jnp.where(keep, S[..., :r], 0.0)
    U = Uf[..., :, :r] * Sk[..., None, :]
    V = jnp.where(keep[..., :, None], Vh[..., :r, :], 0.0)
    ranks = keep.sum(axis=-1)
    return U, V, ranks


@partial(jax.jit,
         static_argnames=("t", "r", "nts", "nt", "adm_band", "variant",
                          "lr_algo", "constrain"))
def blr_factor_bucket(F, thresh, tol, t, r, nts, nt, adm_band=0,
                      variant="rl", lr_algo="rrqr", constrain=None):
    """Batched BLR partial factorization of [nf, p, p] fronts.

    Tiles: nt x nt of size t (p = nt*t); the leading nts tiles are the
    separator block (eliminated), the rest the Schur part.  Returns
      lud   [nf, nts, t, t]      packed tile LU factors (diagonal tiles)
      perm  [nf, nts, t]         per-tile row permutations
      Uu,Vu [nf, nts, nt, t|r..] compressed U-side tiles (block rows,
                                 cols j>k+adm_band; other slots are zero)
      Ul,Vl [nf, nts, nt, ...]   compressed L-side tiles (block cols)
      Du,Dl [nf, nts, t, t]      dense band tiles at distance 1 from the
                                 diagonal (strong admissibility,
                                 BLROptions.hpp:62; empty when adm_band=0)
      CB    [nf, u, u]           dense Schur complement
      ranks [nf, nts, nt, 2]     actual tile ranks (stats)

    ``adm_band=0`` is weak admissibility (every off-diagonal tile of an
    eliminated block row/col is compressed); ``adm_band=1`` is strong
    admissibility: the tiles adjacent to the diagonal stay dense.

    ``variant`` selects the update schedule (the reference's
    ``BLRFactorAlgorithm``, BLR/BLROptions.hpp:65):
      "rl" — right-looking: each step eagerly applies its rank-r update
             to the whole trailing submatrix (dense tile writes per step);
      "ll" — left-looking with LUAR-style accumulation
             (BLRMatrix.hpp:275-300): per-step low-rank factors are only
             *stored*; block row/col k receives all k accumulated updates
             in one contraction at its turn, and the Schur complement
             receives all nts accumulated updates in a single einsum over
             the step axis — the accumulated rank-(k*r) products feed the
             MXU as one large matmul instead of nts small scatter-updates.
             Requires weak admissibility (falls back to "rl" when
             adm_band>0).
    """
    nf, p, _ = F.shape
    dt = F.dtype
    tiles = F.reshape(nf, nt, t, nt, t).transpose(0, 1, 3, 2, 4)
    # [nf, nt(row), nt(col), t, t]
    # ``constrain``: optional GSPMD tile-sharding hook (the FrontBLRMPI /
    # ProcessorGrid2D tile-cycling role, BLR/BLRMatrixMPI.hpp:53): applied
    # to the [nf, nt, nt, t, t] tile array so large single fronts factor
    # with their tile grid distributed over the mesh — XLA partitions the
    # batched compressions/updates and inserts the panel broadcasts.
    if constrain is not None:
        tiles = constrain(tiles)

    band = adm_band if nt > 1 else 0
    ll = variant == "ll" and band == 0 and nts > 0
    lud = jnp.zeros((nf, nts, t, t), dt)
    perms = jnp.zeros((nf, nts, t), jnp.int32)
    Uu = jnp.zeros((nf, nts, nt, t, r), dt)
    Vu = jnp.zeros((nf, nts, nt, r, t), dt)
    Ul = jnp.zeros((nf, nts, nt, t, r), dt)
    Vl = jnp.zeros((nf, nts, nt, r, t), dt)
    Du = jnp.zeros((nf, nts, t, t) if band else (nf, nts, 0, 0), dt)
    Dl = jnp.zeros_like(Du)
    rk = jnp.zeros((nf, nts, nt, 2), jnp.int32)

    col_ids = jnp.arange(nt)

    for k in range(nts):
        if ll:
            # left-looking: apply the accumulated low-rank updates from
            # steps m<k to block row k and block column k only, as one
            # contraction over the accumulated (m, r) rank axes (LUAR).
            if k == 0:
                rowk_full = tiles[:, 0]        # [nf, nt, t, t]
                colk_full = tiles[:, :, 0]
            else:
                Ulk, Vlk = Ul[:, :k, k], Vl[:, :k, k]   # [nf,m,t,r],[nf,m,r,t]
                Uuk, Vuk = Uu[:, :k, k], Vu[:, :k, k]
                midr = jnp.einsum("fmat,fmjtb->fmjab", Vlk, Uu[:, :k],
                                  preferred_element_type=dt)
                rowupd = jnp.einsum("fmta,fmjab,fmjbs->fjts",
                                    Ulk, midr, Vu[:, :k],
                                    preferred_element_type=dt)
                rowk_full = tiles[:, k] - rowupd
                midc = jnp.einsum("fmiat,fmtb->fmiab", Vl[:, :k], Uuk,
                                  preferred_element_type=dt)
                colupd = jnp.einsum("fmita,fmiab,fmbs->fits",
                                    Ul[:, :k], midc, Vuk,
                                    preferred_element_type=dt)
                colk_full = tiles[:, :, k] - colupd
            Akk = rowk_full[:, k]
        else:
            Akk = tiles[:, k, k]
        from ..ops.pallas_panel_lu import batched_lu
        lu, perm = batched_lu(Akk, thresh)
        lud = lud.at[:, k].set(lu)
        perms = perms.at[:, k].set(perm)

        lub = jnp.broadcast_to(lu[:, None], (nf, nt, t, t))
        # block row k: W = L^-1 P A[k, j] for all j (mask j <= k)
        rowk = rowk_full if ll else tiles[:, k]  # [nf, nt, t, t]
        rowk = jnp.take_along_axis(rowk, perm[:, None, :, None], axis=2)
        # block col k: Z = A[i, k] U^-1 for all i
        colk = colk_full if ll else tiles[:, :, k]
        if TS.use_loopfree(dt):
            W = TS.trsm_lower(lub.reshape(-1, t, t),
                              rowk.reshape(-1, t, t),
                              unit=True).reshape(nf, nt, t, t)
            # Z U = colk  <=>  U^T Z^T = colk^T (packed lu^T has the U
            # factor in its lower triangle, which is all trsm_lower reads)
            Z = TS.trsm_lower(
                lub.transpose(0, 1, 3, 2).reshape(-1, t, t),
                colk.transpose(0, 1, 3, 2).reshape(-1, t, t)
            ).reshape(nf, nt, t, t).transpose(0, 1, 3, 2)
        else:
            W = jax.lax.linalg.triangular_solve(
                lub, rowk, left_side=True, lower=True, unit_diagonal=True)
            Z = jax.lax.linalg.triangular_solve(
                lub, colk, left_side=False, lower=False)

        # compress the eliminated block row/col tiles (j > k + band)
        Uw, Vw, rw = _compress_tiles(W, tol, r, algo=lr_algo)
        Uz, Vz, rz = _compress_tiles(Z, tol, r, algo=lr_algo)
        maskj = (col_ids > k + band)[None, :, None, None]
        Uw = jnp.where(maskj, Uw, 0.0)
        Vw = jnp.where(maskj, Vw, 0.0)
        Uz = jnp.where(maskj, Uz, 0.0)
        Vz = jnp.where(maskj, Vz, 0.0)
        Uu = Uu.at[:, k].set(Uw)
        Vu = Vu.at[:, k].set(Vw)
        Ul = Ul.at[:, k].set(Uz)
        Vl = Vl.at[:, k].set(Vz)
        rk = rk.at[:, k, :, 0].set(
            jnp.where(col_ids[None] > k + band, rw, 0).astype(jnp.int32))
        rk = rk.at[:, k, :, 1].set(
            jnp.where(col_ids[None] > k + band, rz, 0).astype(jnp.int32))

        if not ll:
            # trailing update: A[i,j] -= Z_i W_j = Uz_i (Vz_i Uw_j) Vw_j
            # [nf, i, r, t] x [nf, j, t, r] -> middle [nf, i, j, r, r]
            mid = jnp.einsum("fiab,fjbc->fijac", Vz, Uw,
                             preferred_element_type=dt)
            upd = jnp.einsum("fita,fijab,fjbs->fijts", Uz, mid, Vw,
                             preferred_element_type=dt)
            tiles = tiles - upd
            if constrain is not None:
                tiles = constrain(tiles)

        if band and k + 1 < nt:
            # strong admissibility: the distance-1 tiles stay dense; their
            # trailing-update contributions (zeroed out of the compressed
            # product above) are applied densely.
            Wd = W[:, k + 1]   # [nf, t, t]
            Zd = Z[:, k + 1]
            Du = Du.at[:, k].set(Wd)
            Dl = Dl.at[:, k].set(Zd)
            # column k+1, rows i > k+1 (compressed Z_i against dense Wd)
            vzw = jnp.einsum("fiab,fbs->fias", Vz, Wd,
                             preferred_element_type=dt)
            updc = jnp.einsum("fita,fias->fits", Uz, vzw,
                              preferred_element_type=dt)
            tiles = tiles.at[:, :, k + 1].add(-updc)
            # row k+1, cols j > k+1 (dense Zd against compressed W_j)
            zu = jnp.einsum("fta,fjar->fjtr", Zd, Uw,
                            preferred_element_type=dt)
            updr = jnp.einsum("fjtr,fjrs->fjts", zu, Vw,
                              preferred_element_type=dt)
            tiles = tiles.at[:, k + 1, :].add(-updr)
            # the (k+1, k+1) corner: dense x dense
            tiles = tiles.at[:, k + 1, k + 1].add(
                -jnp.matmul(Zd, Wd, preferred_element_type=dt))
    cb_tiles = tiles[:, nts:, nts:]
    if ll and nt > nts:
        # LUAR: the Schur block receives all nts accumulated rank-r
        # updates at once — a single contraction over the (step, rank)
        # axes, i.e. one accumulated rank-(nts*r) product per tile pair.
        VlS, UuS = Vl[:, :, nts:], Uu[:, :, nts:]
        UlS, VuS = Ul[:, :, nts:], Vu[:, :, nts:]
        mid = jnp.einsum("fmiat,fmjtb->fmijab", VlS, UuS,
                         preferred_element_type=dt)
        upd = jnp.einsum("fmita,fmijab,fmjbs->fijts", UlS, mid, VuS,
                         preferred_element_type=dt)
        cb_tiles = cb_tiles - upd
    CB = cb_tiles.transpose(0, 1, 3, 2, 4).reshape(
        nf, (nt - nts) * t, (nt - nts) * t)
    return lud, perms, Uu, Vu, Ul, Vl, Du, Dl, CB, rk


@partial(jax.jit, static_argnames=("t", "nts", "nt", "adm_band"))
def blr_fwd_bucket(lud, perms, Ul, Vl, Dl, bloc, t, nts, nt, adm_band=0):
    """Forward solve with BLR factors: y_k = Lkk^-1 P_k (b_k - updates);
    then subtract column-k low-rank contributions from rows below (plus
    the dense band tile under strong admissibility).
    bloc: [nf, p, nrhs] (sep part + accumulated upd part).  Returns
    (y [nf, s, nrhs], cbv [nf, u, nrhs])."""
    nf, p, nrhs = bloc.shape
    dt = bloc.dtype
    band = adm_band if nt > 1 else 0
    bt = bloc.reshape(nf, nt, t, nrhs)
    ys = []
    for k in range(nts):
        bk = jnp.take_along_axis(bt[:, k], perms[:, k, :, None], axis=1)
        if TS.use_loopfree(dt):
            y = TS.trsm_lower(lud[:, k], bk, unit=True)
        else:
            y = jax.lax.linalg.triangular_solve(
                lud[:, k], bk, left_side=True, lower=True,
                unit_diagonal=True)
        ys.append(y)
        # b_i -= Ul[k,i] (Vl[k,i] y)  for i > k (masked slots are zero)
        vy = jnp.einsum("fiat,ftr->fiar", Vl[:, k], y,
                        preferred_element_type=dt)
        upd = jnp.einsum("fita,fiar->fitr", Ul[:, k], vy,
                         preferred_element_type=dt)
        bt = bt - upd
        if band and k + 1 < nt:
            bt = bt.at[:, k + 1].add(
                -jnp.matmul(Dl[:, k], y, preferred_element_type=dt))
    y = jnp.concatenate(ys, axis=1) if ys else jnp.zeros((nf, 0, nrhs), dt)
    cbv = bt[:, nts:].reshape(nf, (nt - nts) * t, nrhs)
    return y, cbv


@partial(jax.jit, static_argnames=("t", "nts", "nt", "adm_band"))
def blr_bwd_bucket(lud, Uu, Vu, Du, y, xupd, t, nts, nt, adm_band=0):
    """Backward solve: x_k = Ukk^-1 (y_k - sum_{j>k} T[k,j] x_j).
    xupd: [nf, u, nrhs] solved ancestor values.  Returns x_sep."""
    nf, _, nrhs = y.shape
    dt = y.dtype
    band = adm_band if nt > 1 else 0
    u = (nt - nts) * t
    xt = jnp.concatenate(
        [jnp.zeros((nf, nts * t, nrhs), dt), xupd], axis=1
    ).reshape(nf, nt, t, nrhs)
    yt = y.reshape(nf, nts, t, nrhs)
    for k in range(nts - 1, -1, -1):
        # rhs_k = y_k - sum_j Uu[k,j] (Vu[k,j] x_j)
        vx = jnp.einsum("fjat,fjtr->fjar", Vu[:, k], xt,
                        preferred_element_type=dt)
        upd = jnp.einsum("fjta,fjar->ftr", Uu[:, k], vx,
                         preferred_element_type=dt)
        rhs = yt[:, k] - upd
        if band and k + 1 < nt:
            rhs = rhs - jnp.matmul(Du[:, k], xt[:, k + 1],
                                   preferred_element_type=dt)
        if TS.use_loopfree(dt):
            xk = TS.trsm_upper(lud[:, k], rhs)
        else:
            xk = jax.lax.linalg.triangular_solve(
                lud[:, k], rhs, left_side=True, lower=False)
        xt = xt.at[:, k].set(xk)
    return xt[:, :nts].reshape(nf, nts * t, nrhs)
