"""Pallas TPU kernel: batched small-front partial factorization.

Role of the reference's batched in-shared-memory front LU kernels
(``FrontCUDA.cu:234-309`` ``LU_block_kernel`` — all fronts of a level with
dim <= 32 factored by one batched kernel).  TPU design:

* grid over blocks of BB fronts; each program holds [BB, p, p] in VMEM and
  runs the right-looking elimination of the leading ``s`` columns with the
  trailing (contribution-block) update included — one kernel does LU +
  trsm + Schur for the whole padded front;
* the elimination vectorizes across the batch (sublanes) and the row/col
  axes (lanes) — each of the ``s`` steps is a masked rank-1 update on the
  [BB, p, p] block;
* no row pivoting (diagonal pivoting with tiny-pivot replacement) — the
  reference's preconditioner-mode trade-off, selected via
  ``--sp_disable_pivoting``; identity padding keeps ragged separator sizes
  exact.

The same kernel layout serves the forward/backward solves (solve kernels
use masked triangular sweeps over the stored factors).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lu_kernel(ds_ref, F_ref, out_ref, *, s_pad, p, thresh):
    F = F_ref[...]                     # [BB, p, p]
    BB = F.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (BB, p, p), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BB, p, p), 2)

    def step(k, F):
        # extract pivot / row k / column k via masked keepdims reductions
        # (Mosaic has no dynamic vector indexing, and rank-1 intermediates
        # break its layout inference — keep every tensor >= 2D)
        piv = jnp.sum(jnp.where((rows == k) & (cols == k), F, 0.0),
                      axis=2, keepdims=True)
        piv = jnp.sum(piv, axis=1, keepdims=True)   # [BB, 1, 1]
        piv = jnp.where(jnp.abs(piv) < thresh,
                        jnp.where(piv == 0, thresh,
                                  jnp.sign(piv) * thresh), piv)
        colk = jnp.sum(jnp.where(cols == k, F, 0.0), axis=2,
                       keepdims=True)               # [BB, p, 1]
        colk = jnp.where(rows[:, :, :1] > k, colk / piv, 0.0)
        rowk = jnp.sum(jnp.where(rows == k, F, 0.0), axis=1,
                       keepdims=True)               # [BB, 1, p]
        rmask = jnp.where(cols[:, :1, :] > k, rowk, 0.0)
        F = F - colk * rmask
        # write multipliers into column k, restore pivot on the diagonal
        F = jnp.where((cols == k) & (rows > k),
                      jnp.broadcast_to(colk, (BB, p, p)), F)
        F = jnp.where((cols == k) & (rows == k),
                      jnp.broadcast_to(piv, (BB, p, p)), F)
        return F

    F = jax.lax.fori_loop(0, s_pad, step, F)
    out_ref[...] = F


@partial(jax.jit, static_argnames=("s_pad", "bb", "thresh"))
def pallas_factor_bucket(F, ds, thresh=0.0, s_pad=None, bb=None):
    """Batched no-pivot partial LU of identity-padded fronts.

    F [nf, p, p] -> packed factors [nf, p, p] where [:s,:s] holds L\\U,
    [:s,s:] = U12, [s:,:s] = L21 multipliers, [s:,s:] = CB.
    """
    nf, p, _ = F.shape
    s_pad = int(s_pad if s_pad is not None else p)
    if bb is None:
        bb = max(1, min(nf, (2 * 1024 * 1024) // (p * p * 4)))
        while nf % bb:
            bb -= 1
    thresh = float(thresh)

    grid = (nf // bb,)
    out = pl.pallas_call(
        partial(_lu_kernel, s_pad=s_pad, p=p, thresh=thresh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, p, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, p, p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, p, p), F.dtype),
    )(ds.astype(jnp.int32), F)
    return out


def unpack_factors(packed, s_pad):
    """Split the packed kernel output into (lu, L21, U12, CB)."""
    s = s_pad
    return (packed[:, :s, :s], packed[:, s:, :s], packed[:, :s, s:],
            packed[:, s:, s:])
