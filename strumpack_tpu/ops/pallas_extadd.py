"""Pallas TPU kernel: fused extend-add scatter as one-hot window matmuls.

Role of the reference's extend-add scatter (``FrontDense.cpp:113-152``, the
batched GPU ``extend_add_kernel`` ``FrontCUDA.cu:115``): each parent front
``F[p, p]`` accumulates its child's contribution block ``C[u, u]`` at
parent slots ``pos`` (``F[i, j] += C[pos[i], pos[j]]``).

The XLA formulation (two ``take_along_axis`` sublane gathers + two
transposes, see ``frontal/numeric.py::_extend_add_blocks``) round-trips the
``[nf, p, u]`` / ``[nf, p, p]`` intermediates through HBM four times and ran
at ~150 GB/s effective.  This kernel keeps everything in VMEM and rides the
MXU instead, exploiting a structural invariant of multifrontal extend-add:

* ``pos`` is an order-preserving map of the child update rows ``0..u-1``
  ONTO a subset of parent slots (every child row lands in the parent, in
  order).  Hence within ANY window of ``CH`` consecutive parent slots, the
  referenced child rows are **consecutive integers** — a ``CH``-row window
  of ``C`` covers them.

Per row-chunk ``mi`` of the parent front (grid step):

1. ``S = C[clo_i : clo_i + CH, :]`` — one sublane-dynamic VMEM load,
2. ``OT[r, i] = (pos[i] - clo_i == r)`` — the one-hot window selector,
   built by an iota compare (no gather),
3. ``Gt = S^T @ OT`` — ``[u, CH]``, the row-expanded chunk, transposed for
   free by contracting sublanes on the MXU,
4. for each column chunk ``mj``: ``tile = (Gt[clo_j : clo_j + CH, :])^T @
   OT_j`` — ``[CH, CH]``, again sublane-contracted, so NO transposes and no
   lane-dynamic slices appear anywhere,
5. ``F_chunk += concat(tiles)``.

Cost: ``2·CH·p·(u+p)`` flops per front (CH=64) — ~26 GFlop for the whole
32^3 Poisson plan, ~1 ms on the MXU, vs 13 ms for the gather formulation.
Empty chunks need no branch: their selectors are all-zero, so padding,
absent fronts (``idx < 0``) and invalid slots contribute exact zeros.

Exactness: selector entries are 0/1 and each output element receives
exactly one addend, so with ``precision=HIGHEST`` (true f32 MXU passes) the
kernel is bit-exact with the gather path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 64  # parent-slot chunk (rows of one grid step; MXU tile fraction)


def _fits_vmem_whole(u: int) -> bool:
    """Small-child variant: the whole [u, u] CB block lives in VMEM with
    double buffering — u=1536 blew the 24 MB scoped-vmem limit at 50^3."""
    return u * u * 4 * 2 <= 14 * 2**20


def _supports(p: int, u: int, dtype=None) -> bool:
    """Authoritative shape/dtype gate for the kernel (the plan-time caller
    passes dtype=None: dtype is only known at trace time).  Small
    children keep the whole CB block VMEM-resident; big children (the
    4096-wide top-of-tree fronts where the XLA gather path measured 6x
    off the HBM roofline, PERF.md r5 forensics) take the windowed-DMA
    variant: C stays in HBM and each grid step copies only the [w, u]
    row window it references."""
    if not (p % CH == 0 and u >= CH and u % 8 == 0
            and (dtype is None or jnp.dtype(dtype) == jnp.float32)):
        return False
    if _fits_vmem_whole(u):
        return True
    # windowed variant VMEM: S [w, u] + Gt [u, CH] + F in/out [CH, p]
    w = _win(u)
    need = (w * u + u * CH + 2 * CH * p) * 4
    return need <= 14 * 2**20


def _win(u: int) -> int:
    """Child-row window height for a child of padded size u.  8 wider than
    the CH-slot chunk so the window start can be rounded DOWN to a multiple
    of 8 (Mosaic only lowers dynamic sublane offsets it can prove are
    multiples of 8) while still covering every referenced row."""
    return CH + 8 if u >= CH + 8 else CH


def precompute_windows(pos: np.ndarray, idx: np.ndarray, u: int):
    """Host-side window metadata for one (bucket, side, child-pair).

    pos:  [nf, p] parent slot -> child row, -1 where no entry.
    idx:  [nf] child block index within the pair's CB array, -1 = not
          this pair.
    Returns (pos_masked [nf, p] i32, clo8 [nf, nch] i32) or None when the
    consecutive-window invariant does not hold (caller falls back to XLA).
    clo8 = window start / 8: the kernel multiplies by 8 in-register so
    Mosaic can statically prove the sublane offset is 8-aligned.
    """
    nf, p = pos.shape
    assert p % CH == 0
    nch = p // CH
    pos_m = np.where((idx[:, None] >= 0) & (pos >= 0), pos, -1)
    pos_m = pos_m.astype(np.int32)
    v = pos_m.reshape(nf, nch, CH)
    valid = v >= 0
    cnt = valid.sum(axis=2)
    vmin = np.where(valid, v, np.iinfo(np.int32).max).min(axis=2)
    vmax = np.where(valid, v, -1).max(axis=2)
    # the invariant: valid child rows within a chunk are consecutive
    if not np.all((cnt == 0) | (vmax - vmin + 1 == cnt)):
        return None
    if not np.all(vmax < u):
        return None
    w = _win(u)
    # 8-aligned window start covering [vmin, vmax]: floor8(vmin) <= vmin,
    # and vmax <= vmin + CH - 1 <= floor8(vmin) + 7 + CH - 1 < floor8 + w;
    # clamped so the w-row load stays in bounds (u - w is 8-aligned).
    clo = np.where(cnt == 0, 0,
                   np.minimum((np.maximum(vmin, 0) // 8) * 8, max(u - w, 0)))
    assert np.all((cnt == 0) | ((clo <= np.maximum(vmin, 0))
                                & (vmax < clo + w)))
    return pos_m, (clo // 8).astype(np.int32)


def _ea_kernel(idx_ref, clo8_ref, pos_ref, C_ref, Fin_ref, Fout_ref, gt_scr,
               *, u, p):
    f = pl.program_id(0)
    mi = pl.program_id(1)
    nch = p // CH
    w = _win(u)
    dtype = Fin_ref.dtype

    def selector(m, clo):
        # OT[r, i] = 1 iff pos[m*CH + i] == clo + r   (one-hot window map).
        # pos arrives pre-windowed [1, nch, CH] so selecting window m is a
        # sublane-dim slice — Mosaic forbids non-128-aligned lane slices.
        pv = pos_ref[0, pl.ds(m, 1), :]                      # [1, CH]
        pb = jnp.broadcast_to(pv, (w, CH))
        r = jax.lax.broadcasted_iota(jnp.int32, (w, CH), 0)
        return ((pb - clo == r) & (pb >= 0)).astype(dtype)

    # window starts stored /8 and rescaled HERE so Mosaic can prove the
    # dynamic sublane offsets below are 8-aligned
    clo_i = clo8_ref[f, mi] * 8
    OT_i = selector(mi, clo_i)
    S = C_ref[0, pl.ds(clo_i, w), :]                         # [w, u]
    # Gt[c, i] = sum_r S[r, c] * OT_i[r, i]  ->  [u, CH] row-expanded^T
    gt_scr[...] = jax.lax.dot_general(
        S, OT_i, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=dtype)
    tiles = []
    for mj in range(nch):
        clo_j = clo8_ref[f, mj] * 8
        OT_j = selector(mj, clo_j)
        S2 = gt_scr[pl.ds(clo_j, w), :]                      # [w(c), CH(i)]
        # tile[i, j] = sum_c S2[c, i] * OT_j[c, j] = Gt[pos_j, i]^T
        tiles.append(jax.lax.dot_general(
            S2, OT_j, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype))
    Fout_ref[0] = Fin_ref[0] + jnp.concatenate(tiles, axis=1)


def _ea_kernel_big(idx_ref, clo8_ref, pos_ref, C_ref, Fin_ref, Fout_ref,
                   s_scr, gt_scr, sem, *, u, p):
    """Windowed-DMA variant for children too big for VMEM: C stays in
    HBM (memory_space=ANY) and each (front, row-chunk) grid step copies
    only the [w, u] row window its one-hot selectors reference."""
    f = pl.program_id(0)
    mi = pl.program_id(1)
    nch = p // CH
    w = _win(u)
    dtype = Fin_ref.dtype

    def selector(m, clo):
        pv = pos_ref[0, pl.ds(m, 1), :]                      # [1, CH]
        pb = jnp.broadcast_to(pv, (w, CH))
        r = jax.lax.broadcasted_iota(jnp.int32, (w, CH), 0)
        return ((pb - clo == r) & (pb >= 0)).astype(dtype)

    clo_i = clo8_ref[f, mi] * 8
    cp = pltpu.make_async_copy(
        C_ref.at[idx_ref[f], pl.ds(clo_i, w), :], s_scr, sem)
    cp.start()
    OT_i = selector(mi, clo_i)
    cp.wait()
    gt_scr[...] = jax.lax.dot_general(
        s_scr[...], OT_i, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=dtype)
    tiles = []
    for mj in range(nch):
        clo_j = clo8_ref[f, mj] * 8
        OT_j = selector(mj, clo_j)
        S2 = gt_scr[pl.ds(clo_j, w), :]                      # [w(c), CH(i)]
        tiles.append(jax.lax.dot_general(
            S2, OT_j, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype))
    Fout_ref[0] = Fin_ref[0] + jnp.concatenate(tiles, axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def extend_add_pallas(F, C, idx, pos_m, clo, *, interpret=False):
    """F[f] += C[idx[f]][pos, pos] for one (side, child-pair); F aliased.

    F [nf, p, p] f32; C [nfc, u, u]; idx [nf] i32 (clamped for the block
    index map; invalid fronts contribute zero via all -1 pos rows);
    pos_m [nf, p] i32 (-1 = no entry); clo [nf, p//CH] i32 window
    starts / 8 (see precompute_windows).
    """
    nf, p, _ = F.shape
    nfc, u, _ = C.shape
    nch = p // CH
    idx_c = jnp.maximum(idx, 0)
    if not _fits_vmem_whole(u):
        pos3 = pos_m.reshape(nf, nch, CH)
        w = _win(u)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nf, nch),
            in_specs=[
                pl.BlockSpec((1, nch, CH),
                             lambda f, mi, idx_r, clo_r: (f, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec((1, CH, p),
                             lambda f, mi, idx_r, clo_r: (f, mi, 0)),
            ],
            out_specs=pl.BlockSpec((1, CH, p),
                                   lambda f, mi, idx_r, clo_r: (f, mi, 0)),
            scratch_shapes=[pltpu.VMEM((w, u), F.dtype),
                            pltpu.VMEM((u, CH), F.dtype),
                            pltpu.SemaphoreType.DMA],
        )
        return pl.pallas_call(
            partial(_ea_kernel_big, u=u, p=p),
            out_shape=jax.ShapeDtypeStruct(F.shape, F.dtype),
            grid_spec=grid_spec,
            input_output_aliases={4: 0},
            interpret=interpret,
        )(idx_c, clo, pos3, C, F)
    # pos_m arrives [nf, p]; a (1, p) block would violate Mosaic's rule that
    # the last two block dims be divisible by (8, 128) or equal the array
    # dims (nf is arbitrary).  Reshape to [nf, nch, CH]: the trailing block
    # dims (nch, CH) EQUAL the trailing array dims (always lowerable), and
    # window selection inside the kernel becomes a sublane-dim slice
    # (lane-dim slices must be 128-aligned; CH-wide ones are not).
    pos3 = pos_m.reshape(nf, nch, CH)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # idx_c, clo
        grid=(nf, nch),
        in_specs=[
            pl.BlockSpec((1, nch, CH),
                         lambda f, mi, idx_r, clo_r: (f, 0, 0)),
            pl.BlockSpec((1, u, u),
                         lambda f, mi, idx_r, clo_r: (idx_r[f], 0, 0)),
            pl.BlockSpec((1, CH, p), lambda f, mi, idx_r, clo_r: (f, mi, 0)),
        ],
        out_specs=pl.BlockSpec((1, CH, p),
                               lambda f, mi, idx_r, clo_r: (f, mi, 0)),
        scratch_shapes=[pltpu.VMEM((u, CH), F.dtype)],
    )
    return pl.pallas_call(
        partial(_ea_kernel, u=u, p=p),
        out_shape=jax.ShapeDtypeStruct(F.shape, F.dtype),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},    # F (5th positional input) -> out
        interpret=interpret,
    )(idx_c, clo, pos3, C, F)
