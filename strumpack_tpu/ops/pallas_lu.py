"""Pallas TPU kernels: batched small-front partial factorization.

Role of the reference's batched in-shared-memory front LU kernels
(``FrontCUDA.cu:234-309`` ``LU_block_kernel`` — all fronts of a level with
dim <= 32 factored by one batched kernel).  TPU design:

* **fronts ride the lane dimension**: the bucket is stored as ``[p, p, BB]``
  (rows, cols, fronts) so every VPU op runs 128 fronts wide regardless of
  the front size ``p`` — a ``[BB, p, p]`` layout would use only ``p`` of the
  128 lanes per vector for the typical p in {8..64};
* the grid runs over blocks of ``BB`` fronts; each program holds one
  ``[p, p, BB]`` block in VMEM and performs the right-looking elimination of
  the leading ``s`` columns *including* the trailing contribution-block
  update — one kernel does LU + trsm + Schur for the whole padded front;
* each of the ``s`` steps is a masked rank-1 update: pivot row/column are
  extracted with masked keepdims reductions (Mosaic has no dynamic vector
  indexing), the update ``F -= colk · rowk`` broadcasts ``[p,1,BB] x
  [1,p,BB]`` at full lane occupancy;
* **row partial pivoting** (the reference's ``LU_block_kernel`` behavior /
  ``getrf`` semantics) is done per front entirely in-register: the pivot
  row index is an argmax over the masked column (max + min-index masked
  reductions), and the row swap is two masked row selects; the permutation
  is carried alongside and emitted in LAPACK "applied" form (perm[i] =
  source row), identical to ``jax.lax.linalg.lu``'s third output;
* tiny-pivot replacement (``SparseSolverBase.cpp:346-350``) happens on the
  pivot after the swap; with pivoting disabled
  (``--sp_disable_pivoting``) the same kernel runs without the
  search/swap (diagonal pivoting) — the reference's preconditioner-mode
  trade-off.  Identity padding keeps ragged separator sizes exact.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fronts per kernel invocation (one full lane register) and the largest
# front the Pallas path handles; bigger fronts go to the XLA path.
_LANES = 128
MAX_PALLAS_P = 64


def _supports_pallas(dtype) -> bool:
    return (jax.default_backend() == "tpu"
            and jnp.dtype(dtype) == jnp.float32)


def _lu_kernel(thresh_ref, F_ref, out_ref, perm_ref, *, s_pad, p, pivot):
    """Full-front elimination with LOGICAL partial pivoting: the pivot row
    per column is marked (pivoted mask carried as f32 — i1 carries trip a
    Mosaic internal error), never physically moved; the caller
    triangularizes with one row gather.  ~3 full-width VPU passes per
    column (column extract, pivot-row extract, fused update+write) vs ~7
    with in-kernel swaps."""
    F = F_ref[...]                     # [p, p, BB] — rows, cols, fronts
    BB = F.shape[2]
    thresh = thresh_ref[0]
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (p, 1, 1), 0)
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, p, 1), 1)
    alive0 = rows1 < s_pad
    pivf0 = jnp.zeros((p, 1, BB), F.dtype)
    pr0 = jnp.zeros((1, p, BB), jnp.int32)

    def step(k, carry):
        F, pivf, pr = carry
        free = pivf == 0.0
        colk = jnp.sum(jnp.where(cols1 == k, F, 0.0), axis=1,
                       keepdims=True)                      # [p, 1, BB]
        if pivot:
            cand = jnp.where(alive0 & free, jnp.abs(colk), -1.0)
            amax = jnp.max(cand, axis=0, keepdims=True)    # [1, 1, BB]
            rpiv = jnp.min(jnp.where(cand == amax, rows1, p),
                           axis=0, keepdims=True)          # [1, 1, BB]
        else:
            rpiv = jnp.full((1, 1, BB), k, jnp.int32)
        ispiv = rows1 == rpiv                              # [p, 1, BB]
        piv = jnp.sum(jnp.where(ispiv, colk, 0.0), axis=0,
                      keepdims=True)                       # [1, 1, BB]
        piv = jnp.where(jnp.abs(piv) < thresh,
                        jnp.where(piv == 0, thresh,
                                  jnp.sign(piv) * thresh), piv)
        m = jnp.where(free & ~ispiv, colk / piv, 0.0)      # [p, 1, BB]
        urow = jnp.sum(jnp.where(ispiv, F, 0.0), axis=0,
                       keepdims=True)                      # [1, p, BB]
        colnew = jnp.where(ispiv, jnp.broadcast_to(piv, (p, 1, BB)),
                           jnp.where(free, m, colk))
        F = jnp.where(cols1 == k, colnew,
                      F - m * jnp.where(cols1 > k, urow, 0.0))
        pr = jnp.where(cols1 == k, jnp.broadcast_to(rpiv, (1, p, BB)), pr)
        return F, pivf + ispiv.astype(F.dtype), pr

    F, _, pr = jax.lax.fori_loop(0, s_pad, step, (F, pivf0, pr0))
    out_ref[...] = F
    perm_ref[...] = pr[0]


@partial(jax.jit, static_argnames=("s_pad", "bb", "pivot", "interpret"))
def pallas_factor_bucket(F, thresh=0.0, s_pad=None, bb=None, pivot=True,
                         interpret=False):
    """Batched partial LU of identity-padded fronts, one fused kernel.

    F [nf, p, p] -> (packed [nf, p, p], perm [nf, s_pad]) where packed
    [:s,:s] holds L\\U of P F11, [:s,s:] = U12 = L^-1 P F12, [s:,:s] = L21
    multipliers, [s:,s:] = CB (Schur complement); perm is in applied form
    (perm[i] = source row), like ``jax.lax.linalg.lu``.
    """
    nf, p, _ = F.shape
    s_pad = int(s_pad if s_pad is not None else p)
    if bb is None:
        # ~8 live [p,p,bb] f32 temporaries inside the step; stay well under
        # the (raised) VMEM budget while keeping full lanes
        bb = _LANES if p > 16 else 4 * _LANES
    nfp = -(-nf // bb) * bb
    Ft = jnp.transpose(F, (1, 2, 0))               # [p, p, nf]
    if nfp != nf:                                  # pad with identities
        pad = jnp.broadcast_to(jnp.eye(p, dtype=F.dtype)[:, :, None],
                               (p, p, nfp - nf))
        Ft = jnp.concatenate([Ft, pad], axis=2)
    thresh = jnp.reshape(jnp.asarray(thresh, F.dtype), (1,))

    grid = (nfp // bb,)
    out, perm = pl.pallas_call(
        partial(_lu_kernel, s_pad=s_pad, p=p, pivot=pivot),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((p, p, bb), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((p, p, bb), lambda i: (0, 0, i)),
            pl.BlockSpec((p, bb), lambda i: (0, i)),
        ],
        out_shape=[jax.ShapeDtypeStruct((p, p, nfp), F.dtype),
                   jax.ShapeDtypeStruct((p, nfp), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(thresh, Ft)
    packed = jnp.transpose(out[:, :, :nf], (2, 0, 1))
    pr = jnp.transpose(perm[:s_pad, :nf], (1, 0))          # [nf, s_pad]
    if pivot:
        # triangularize (the kernel pivots logically): dest rows
        # 0..s_pad-1 take the pivot rows in order; rows >= s_pad (the CB
        # block) never move
        if s_pad < p:
            tail = jnp.broadcast_to(
                jnp.arange(s_pad, p, dtype=pr.dtype)[None, :],
                (nf, p - s_pad))
            pj = jnp.concatenate([pr, tail], axis=1)
        else:
            pj = pr
        packed = jnp.take_along_axis(packed, pj[:, :, None], axis=1)
    return packed, pr


def _lu_cross_kernel(thresh_ref, A_ref, B_ref, Aout_ref, Bout_ref,
                     perm_ref, *, s, u, p, pivot):
    """Partial factorization updating only the cross region.

    Eliminating s columns of a [p, p] front touches, at step k, only
    column block A = [F11; F21] ([p, s]) and row block B = F12 ([s, u]):
    the trailing F22 updates accumulate to exactly -L21 U12, so they are
    deferred to ONE batched MXU matmul outside the kernel.  This cuts the
    per-step VPU work from p^2 to p*s + s*u — the win grows with the
    contribution-block share of the front (u/p), which dominates deep
    levels of the elimination tree.  Layout and pivoting technique are
    those of _lu_kernel (fronts on lanes, masked-reduction pivot search,
    arithmetic row swaps, tiny-pivot replacement)."""
    A = A_ref[...]                     # [p, s, BB]
    B = B_ref[...]                     # [s, u, BB]
    BB = A.shape[2]
    thresh = thresh_ref[0]
    rA = jax.lax.broadcasted_iota(jnp.int32, (p, 1, 1), 0)
    cA = jax.lax.broadcasted_iota(jnp.int32, (1, s, 1), 1)
    rB = jax.lax.broadcasted_iota(jnp.int32, (s, 1, 1), 0)
    P0 = jnp.broadcast_to(rB, (s, 1, BB)).astype(jnp.int32)

    def step(k, carry):
        A, B, P = carry
        colk = jnp.sum(jnp.where(cA == k, A, 0.0), axis=1,
                       keepdims=True)                     # [p, 1, BB]
        if pivot:
            colka = jnp.where((rA >= k) & (rA < s), jnp.abs(colk), -1.0)
            amax = jnp.max(colka, axis=0, keepdims=True)  # [1, 1, BB]
            rpiv = jnp.min(jnp.where(colka == amax, rA, p),
                           axis=0, keepdims=True)         # [1, 1, BB]
            is_kA, is_rA = rA == k, rA == rpiv
            # exact masked row swap of A and of the extracted column
            ak = jnp.sum(jnp.where(is_kA, A, 0.0), axis=0, keepdims=True)
            ar = jnp.sum(jnp.where(is_rA, A, 0.0), axis=0, keepdims=True)
            A = jnp.where(is_rA, jnp.broadcast_to(ak, (p, s, BB)), A)
            A = jnp.where(is_kA, jnp.broadcast_to(ar, (p, s, BB)), A)
            ck = jnp.sum(jnp.where(is_kA, colk, 0.0), axis=0,
                         keepdims=True)
            cr = jnp.sum(jnp.where(is_rA, colk, 0.0), axis=0,
                         keepdims=True)
            colk = jnp.where(is_rA, jnp.broadcast_to(ck, (p, 1, BB)), colk)
            colk = jnp.where(is_kA, jnp.broadcast_to(cr, (p, 1, BB)), colk)
            # rpiv < s always, so the swap also applies within B and P
            is_kB, is_rB = rB == k, rB == rpiv
            bk = jnp.sum(jnp.where(is_kB, B, 0.0), axis=0, keepdims=True)
            br = jnp.sum(jnp.where(is_rB, B, 0.0), axis=0, keepdims=True)
            B = jnp.where(is_rB, jnp.broadcast_to(bk, (s, u, BB)), B)
            B = jnp.where(is_kB, jnp.broadcast_to(br, (s, u, BB)), B)
            pk = jnp.sum(jnp.where(is_kB, P, 0), axis=0, keepdims=True,
                         dtype=jnp.int32)
            pr = jnp.sum(jnp.where(is_rB, P, 0), axis=0, keepdims=True,
                         dtype=jnp.int32)
            P = jnp.where(is_rB, jnp.broadcast_to(pk, (s, 1, BB)), P)
            P = jnp.where(is_kB, jnp.broadcast_to(pr, (s, 1, BB)), P)
        piv = jnp.sum(jnp.where(rA == k, colk, 0.0), axis=0,
                      keepdims=True)                      # [1, 1, BB]
        piv = jnp.where(jnp.abs(piv) < thresh,
                        jnp.where(piv == 0, thresh,
                                  jnp.sign(piv) * thresh), piv)
        m = jnp.where(rA > k, colk / piv, 0.0)            # [p, 1, BB]
        rowk = jnp.sum(jnp.where(rA == k, A, 0.0), axis=0,
                       keepdims=True)                     # [1, s, BB]
        updated = A - m * jnp.where(cA > k, rowk, 0.0)
        colk_new = jnp.where(rA > k, m,
                             jnp.where(rA == k,
                                       jnp.broadcast_to(piv, (p, 1, BB)),
                                       colk))
        A = jnp.where(cA == k, colk_new, updated)
        rowkB = jnp.sum(jnp.where(rB == k, B, 0.0), axis=0,
                        keepdims=True)                    # [1, u, BB]
        B = B - m[:s] * rowkB
        return A, B, P

    A, B, P = jax.lax.fori_loop(0, s, step, (A, B, P0))
    Aout_ref[...] = A
    Bout_ref[...] = B
    perm_ref[...] = P[:, 0, :]


MAX_CROSS_P = 128
# wider fronts still use the cross kernel when the bucket is deep enough
# to fill lanes (the per-front panel path underuses them there)
MAX_CROSS_WIDE_P = 640
MIN_CROSS_WIDE_NF = 32
_CROSS_VMEM_BUDGET = 80 * 1024 * 1024


def _cross_bb(p, s, u, nf):
    """Fronts-per-block choice for the cross kernel: full lanes when the
    VMEM footprint (carry + ~3 live temporaries of the [p,s]+[s,u]
    blocks) allows, halved otherwise; None when nothing >= 32 fits."""
    bb = _LANES if p * s > 2048 else 4 * _LANES
    nfp2 = 32
    while nfp2 < nf:
        nfp2 *= 2
    bb = min(bb, nfp2)          # don't pad a small batch to full lanes
    # measured on hardware: Mosaic's scoped stack holds ~15-16 live f32
    # copies of the [p,s]+[s,u] blocks (loop carries, double-buffered
    # block in/out, per-step temporaries) -> 64 bytes per element
    while bb > 32 and (p * s + s * u) * bb * 64 > _CROSS_VMEM_BUDGET:
        bb //= 2
    if (p * s + s * u) * bb * 64 > _CROSS_VMEM_BUDGET:
        return None
    return bb


def use_cross(s, p, nf):
    """Routing predicate for the cross-shape partial-factor kernel.

    Wide fronts (p > 128) qualify only when a full-lane block (bb >=
    _LANES) fits VMEM: sub-lane blocks force Mosaic into per-op
    relayouts and an ~80 s kernel compile (measured at nf=64 s=64 u=256,
    bb=32 — the round-3 cold-compile pathology), while the XLA blocked
    path factors the same bucket at >600 GF/s after a ~1 s compile."""
    if not (0 < s < p and s >= 8):
        return False
    if p <= MAX_CROSS_P:
        return True
    bb = _cross_bb(p, s, p - s, nf)
    return (p <= MAX_CROSS_WIDE_P and nf >= MIN_CROSS_WIDE_NF
            and bb is not None and bb >= _LANES)


@partial(jax.jit, static_argnames=("s_pad", "bb", "pivot", "interpret"))
def pallas_partial_factor(F, thresh=0.0, s_pad=None, bb=None, pivot=True,
                          interpret=False):
    """Partial factorization of identity-padded fronts via the cross-shape
    kernel + one batched MXU Schur matmul.

    F [nf, p, p] -> (lu [nf,s,s], perm [nf,s], L21 [nf,u,s],
    U12 [nf,s,u], CB [nf,u,u]) — the _factor_bucket contract."""
    nf, p, _ = F.shape
    s = int(s_pad if s_pad is not None else p)
    u = p - s
    assert u > 0
    if bb is None:
        bb = _cross_bb(p, s, u, nf) or 32
    nfp = -(-nf // bb) * bb
    Ft = jnp.transpose(F, (1, 2, 0))               # [p, p, nf]
    if nfp != nf:
        pad = jnp.broadcast_to(jnp.eye(p, dtype=F.dtype)[:, :, None],
                               (p, p, nfp - nf))
        Ft = jnp.concatenate([Ft, pad], axis=2)
    Fa = Ft[:, :s, :]                              # [p, s, nfp]
    Fb = Ft[:s, s:, :]                             # [s, u, nfp]
    thresh = jnp.reshape(jnp.asarray(thresh, F.dtype), (1,))

    def call(Fa_, Fb_, nb):
        # Mosaic requires the lane-dim block be a multiple of 128 or the
        # whole array: sub-128 batch blocks run as one-block calls over
        # lane chunks instead of grid steps
        return pl.pallas_call(
            partial(_lu_cross_kernel, s=s, u=u, p=p, pivot=pivot),
            grid=(nb // bb,) if bb >= _LANES else (1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((p, s, bb), lambda i: (0, 0, i)),
                pl.BlockSpec((s, u, bb), lambda i: (0, 0, i)),
            ],
            out_specs=[
                pl.BlockSpec((p, s, bb), lambda i: (0, 0, i)),
                pl.BlockSpec((s, u, bb), lambda i: (0, 0, i)),
                pl.BlockSpec((s, bb), lambda i: (0, i)),
            ],
            out_shape=[jax.ShapeDtypeStruct((p, s, nb), F.dtype),
                       jax.ShapeDtypeStruct((s, u, nb), F.dtype),
                       jax.ShapeDtypeStruct((s, nb), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(thresh, Fa_, Fb_)

    if bb >= _LANES or nfp == bb:
        A, B, perm = call(Fa, Fb, nfp)
    else:
        parts = [call(Fa[:, :, c:c + bb], Fb[:, :, c:c + bb], bb)
                 for c in range(0, nfp, bb)]
        A = jnp.concatenate([x[0] for x in parts], axis=2)
        B = jnp.concatenate([x[1] for x in parts], axis=2)
        perm = jnp.concatenate([x[2] for x in parts], axis=1)
    lu = jnp.transpose(A[:s, :, :nf], (2, 0, 1))
    L21 = jnp.transpose(A[s:, :, :nf], (2, 0, 1))
    U12 = jnp.transpose(B[:, :, :nf], (2, 0, 1))
    CB = (F[:, s:, s:]
          - jnp.matmul(L21, U12, preferred_element_type=F.dtype))
    return lu, jnp.transpose(perm[:, :nf], (1, 0)), L21, U12, CB


def nopivot_factor_bucket_xla(F, thresh, s_pad):
    """Pure-XLA fallback of the no-pivot elimination (any backend, any
    dtype).  Same packed [nf, p, p] output as the Pallas kernel."""
    nf, p, _ = F.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, p, p), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, p, p), 2)
    thresh = jnp.asarray(thresh, jnp.real(jnp.zeros((), F.dtype)).dtype)

    def step(k, F):
        piv = jnp.sum(jnp.where((rows == k) & (cols == k), F, 0),
                      axis=(1, 2), keepdims=True)
        apiv = jnp.abs(piv)
        sgn = jnp.where(piv == 0, jnp.ones((), F.dtype),
                        (piv / jnp.where(apiv == 0, 1, apiv)).astype(F.dtype))
        piv = jnp.where(apiv < thresh, sgn * thresh, piv)
        colk = jnp.sum(jnp.where(cols == k, F, 0), axis=2, keepdims=True)
        colk = jnp.where(rows[:, :, :1] > k, colk / piv, 0)
        rowk = jnp.sum(jnp.where(rows == k, F, 0), axis=1, keepdims=True)
        rmask = jnp.where(cols[:, :1] > k, rowk, 0)
        F = F - colk * rmask
        F = jnp.where((cols == k) & (rows > k),
                      jnp.broadcast_to(colk, F.shape), F)
        F = jnp.where((cols == k) & (rows == k),
                      jnp.broadcast_to(piv, F.shape), F)
        return F

    return jax.lax.fori_loop(0, s_pad, step, F)


def unpack_factors(packed, s_pad):
    """Split the packed kernel output into (lu, L21, U12, CB)."""
    s = s_pad
    return (packed[:, :s, :s], packed[:, s:, :s], packed[:, :s, s:],
            packed[:, s:, s:])
