"""Pallas TPU blocked panel LU for large fronts.

Role of the reference's big-front factorization (cuSOLVER getrf per stream,
``FrontGPU.cpp:558+``; ScaLAPACK pgetrf for MPI fronts).  The TPU problem
it solves is different from the GPU one: ``jax.lax.linalg.lu`` /
``triangular_solve`` iterate column-by-column with XLA ``while`` loops, and
on TPU every while iteration pays a fixed sync cost (measured ~0.65 ms on
the target platform) — an s=1024 front costs seconds in loop overhead
alone.  Here the entire column loop runs *inside* one Pallas kernel
(a hardware loop on-core), and everything between panels is MXU work:

* the matrix is eliminated in ``w``-wide panels (w = 128 = one lane tile);
* the **panel kernel** factors a full-height ``[p, w]`` panel with
  in-register partial pivoting (masked argmax + masked row swaps, same
  technique as ops/pallas_lu.py), tiny-pivot replacement, and emits the
  packed panel plus the full-height applied-form row permutation;
* between panels everything is XLA one-shot ops: one gather applies the
  row permutation to the other columns (LAPACK getrf semantics: swaps
  span the full row), ``L11^{-1}`` comes from an **exact Neumann-product
  inversion** of the w x w unit-lower block (``inv(I-N) =
  (I+N)(I+N^2)(I+N^4)...``, N strictly lower so N^w = 0 — log2(w) MXU
  matmuls; partial pivoting bounds |N| entries by 1), then
  ``U12 = L11^{-1} A12`` and ``A22 -= L21 U12`` run on the MXU.  The
  panel loop itself is a statically unrolled Python loop (s/w <= 8
  iterations) — the compiled program contains **no XLA while loops**.

Output is the same packed layout as ops/pallas_lu.py: [:s,:s] = L\\U of
P F11, [:s,s:] = U12, [s:,:s] = L21, [s:,s:] = CB, plus the applied-form
row permutation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trisolve import trsm_unit_lower

PANEL_W = 128
MAX_PANEL_P = 8192      # [p, w] f32 panel in VMEM: 4 MB at p=8192


def _panel_kernel(thresh_ref, A_ref, out_ref, pr_ref, *,
                  row0, w, slim, p, pivot):
    """Eliminate the w columns of one full-height panel, diagonal at
    ``row0``, with LOGICAL partial pivoting: pivot rows (restricted to
    [row0, slim), not yet pivoted) are *marked*, never physically moved —
    the caller applies the accumulated permutation with the single
    row-gather it already needs to swap the trailing columns.  This cuts
    the full-width VPU passes per column from ~7 (column extract, two
    swap-row extracts, fused swap+update+write) to ~3 (column extract,
    pivot-row extract, fused update+write); dynamic row/column slices are
    not lowerable on the lane dimension, hence the masked reductions.

    Emits the packed panel in ORIGINAL row order plus pr [w] = the chosen
    pivot row per column."""
    G = A_ref[0]                            # [p, w]
    thresh = thresh_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    upd0 = rows >= row0                     # updatable until pivoted
    alive0 = upd0 & (rows < slim)
    pr0 = jnp.zeros((1, w), jnp.int32)
    # the pivoted mask is carried as f32 (carrying i1 vectors through a
    # fori_loop trips a Mosaic internal error)
    pivf0 = jnp.zeros((p, 1), G.dtype)

    def step(k, carry):
        G, pivf, pr = carry
        free = pivf == 0.0
        col = jnp.sum(jnp.where(cols == k, G, 0.0), axis=1,
                      keepdims=True)        # [p, 1]
        if pivot:
            cola = jnp.where(alive0 & free, jnp.abs(col), -1.0)
            amax = jnp.max(cola, axis=0, keepdims=True)     # [1, 1]
            rpiv = jnp.min(jnp.where(cola == amax, rows, p),
                           axis=0, keepdims=True)           # [1, 1]
        else:
            rpiv = jnp.full((1, 1), row0 + k, jnp.int32)
        ispiv = rows == rpiv                                # [p, 1]
        piv = jnp.sum(jnp.where(ispiv, col, 0.0), axis=0,
                      keepdims=True)        # [1, 1]
        piv = jnp.where(jnp.abs(piv) < thresh,
                        jnp.where(piv == 0, thresh,
                                  jnp.sign(piv) * thresh), piv)
        upd = upd0 & free
        m = jnp.where(upd & ~ispiv, col / piv, 0.0)         # [p, 1]
        urow = jnp.sum(jnp.where(ispiv, G, 0.0), axis=0,
                       keepdims=True)       # [1, w]
        colk_new = jnp.where(ispiv, jnp.broadcast_to(piv, (p, 1)),
                             jnp.where(upd, m, col))
        G = jnp.where(cols == k, colk_new,
                      G - m * jnp.where(cols > k, urow, 0.0))
        pr = jnp.where(cols == k, jnp.broadcast_to(rpiv, (1, w)), pr)
        return G, pivf + ispiv.astype(G.dtype), pr

    G, _, pr = jax.lax.fori_loop(0, w, step, (G, pivf0, pr0))
    out_ref[0] = G
    # pr as [8, w] (8 identical sublane rows): Mosaic requires the
    # second-to-last block dim divisible by 8
    pr_ref[0] = jnp.broadcast_to(pr, (8, w))


@partial(jax.jit, static_argnames=("row0", "w", "slim", "pivot",
                                   "interpret"))
def pallas_panel_lu(panel, thresh, row0, w, slim, pivot=True,
                    interpret=False):
    """Factor one full-height [nf, p, w] panel per front; diagonal block
    at rows row0..row0+w.  Returns (packed panel in ORIGINAL row order,
    pr [nf, w] = pivot source row per column); compose with
    panel_perm() to get the applied-form row permutation."""
    nf, p, _ = panel.shape
    thresh = jnp.reshape(jnp.asarray(thresh, panel.dtype), (1,))
    out, pr = pl.pallas_call(
        partial(_panel_kernel, row0=row0, w=w, slim=slim, p=p, pivot=pivot),
        grid=(nf,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, p, w), lambda f: (f, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, p, w), lambda f: (f, 0, 0)),
            pl.BlockSpec((1, 8, w), lambda f: (f, 0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((nf, p, w), panel.dtype),
                   jax.ShapeDtypeStruct((nf, 8, w), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(thresh, panel)
    return out, pr[:, 0, :]


def panel_perm(pr, p, row0, w):
    """Applied-form row permutation [nf, p] from per-column pivot rows.

    dest row row0+k takes source pr[:, k]; the remaining not-pivoted rows
    >= row0 follow in ascending source order (LAPACK getrf semantics with
    the swaps composed); rows < row0 are fixed."""
    nf = pr.shape[0]
    i = jnp.arange(p, dtype=jnp.int32)[None, :]
    bidx = jnp.arange(nf, dtype=jnp.int32)[:, None]
    pivmask = jnp.zeros((nf, p), bool).at[
        jnp.broadcast_to(bidx, pr.shape), pr].set(True)
    nonpiv = (~pivmask) & (i >= row0)
    rank = jnp.cumsum(nonpiv.astype(jnp.int32), axis=1) - 1
    dest = jnp.where(i < row0, i, row0 + w + rank)
    dest = dest.at[jnp.broadcast_to(bidx, pr.shape), pr].set(
        row0 + jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :],
                                pr.shape))
    pj = jnp.zeros((nf, p), jnp.int32).at[
        jnp.broadcast_to(bidx, (nf, p)), dest].set(
        jnp.broadcast_to(i, (nf, p)))
    return pj


def blocked_factor_bucket(F, thresh, s_pad, pivoting=True, panel_w=PANEL_W,
                          interpret=False):
    """Blocked partial LU of a bucket of identity-padded fronts.

    Same contract as numeric._factor_bucket: returns
    (lu [nf,s,s], perm [nf,s], L21 [nf,u,s], U12 [nf,s,u], CB [nf,u,u]).
    """
    nf, p, _ = F.shape
    s = int(s_pad)
    G = F
    ptot = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32), (nf, p))
    jb = 0
    while jb < s:
        w = min(panel_w, s - jb)
        pan = jax.lax.dynamic_slice_in_dim(G, jb, w, axis=2)
        pan, pr = pallas_panel_lu(pan, thresh, row0=jb, w=w, slim=s,
                                  pivot=pivoting, interpret=interpret)
        # paste the factored panel (original row order), then apply the
        # panel's accumulated permutation to the WHOLE matrix with one
        # row gather (the kernel pivots logically — no in-kernel swaps)
        G = jax.lax.dynamic_update_slice_in_dim(G, pan, jb, axis=2)
        if pivoting:
            pj = panel_perm(pr, p, jb, w)
            G = jnp.take_along_axis(G, pj[:, :, None], axis=1)
            ptot = jnp.take_along_axis(ptot, pj, axis=1)
        if jb + w < p:
            # slice the (now permuted) factored panel back out of G
            L11 = G[:, jb:jb + w, jb:jb + w]
            A12 = G[:, jb:jb + w, jb + w:]
            U12 = trsm_unit_lower(L11, A12)
            L21 = G[:, jb + w:, jb:jb + w]
            G = jax.lax.dynamic_update_slice(G, U12, (0, jb, jb + w))
            G = jax.lax.dynamic_update_slice(
                G, G[:, jb + w:, jb + w:]
                - jnp.matmul(L21, U12, preferred_element_type=F.dtype),
                (0, jb + w, jb + w))
        jb += w
    return (G[:, :s, :s], ptot[:, :s], G[:, s:, :s], G[:, :s, s:],
            G[:, s:, s:])


def batched_lu(F, thresh=0.0, pivoting=True):
    """Full batched LU with partial pivoting + tiny-pivot replacement:
    [N, m, m] -> (packed L\\U, perm).  Routes to the Pallas fronts-on-
    lanes kernel (m <= 64) or the blocked panel LU on the TPU f32 path;
    falls back to XLA's lu elsewhere.  Drop-in for the
    lax.linalg.lu + diag-replacement idiom (BLR tile LU, ULV blocks)."""
    import os
    from . import pallas_lu as PL
    N, m, _ = F.shape
    if (PL._supports_pallas(F.dtype) and N > 0
            and not os.environ.get("STRUMPACK_TPU_NO_PALLAS")):
        if m <= PL.MAX_PALLAS_P:
            packed, perm = PL.pallas_factor_bucket(
                F, thresh=thresh, s_pad=m, pivot=pivoting)
            return packed, perm
        if m <= MAX_PANEL_P:
            lu, perm, _, _, _ = blocked_factor_bucket(
                F, thresh, m, pivoting=pivoting)
            return lu, perm
    lu, _, perm = jax.lax.linalg.lu(F)
    d = jnp.diagonal(lu, axis1=-2, axis2=-1)
    thresh = jnp.asarray(thresh, jnp.real(jnp.zeros((), F.dtype)).dtype)
    repl = jnp.where(
        jnp.abs(d) < thresh,
        jnp.where(d == 0, thresh,
                  jnp.sign(jnp.real(d)).astype(d.dtype) * thresh), d)
    ii = jnp.arange(m)
    return lu.at[:, ii, ii].set(repl), perm
