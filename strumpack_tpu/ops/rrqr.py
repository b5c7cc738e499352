"""Batched rank-revealing QR with tolerance early-stop (geqp3tol role).

Role of the reference's custom LAPACK ``xgeqp3tol`` (dense/lapack/
[sdcz]geqp3tol.f — column-pivoted QR that stops once the trailing diagonal
of R falls below a relative/absolute tolerance), the RRQR core of BLR tile
compression (BLROptions LowRankAlgorithm::RRQR, the reference DEFAULT) and
of HSS interpolative decompositions.

TPU-first shape: fixed max rank ``r`` with masked actual rank (static
shapes, no data-dependent early exit inside jit — SURVEY.md section 7
hard-part (c)).  Each of the r steps is a full-column-norm pivot search +
one batched rank-1 Gram-Schmidt update: the pivot rule (largest residual
column norm) is exactly geqp3's, so ranks match the reference's within
floating-point ties.  All step work is batched elementwise/reduction ops
on the VPU plus one [m]x[m,n] contraction per step; the loop is a
``lax.fori_loop`` so the compiled program stays small regardless of r.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("r",))
def rrqr(T, tol, r):
    """Batched truncated column-pivoted QR of tiles T [..., m, n].

    Returns ``(U [..., m, r], V [..., r, n], ranks [...])`` with
    ``T ~= U @ V``: U holds the orthonormal Q columns, V the rows of
    ``R P^T`` (pivoting folded back, so no permutation output is needed).
    Columns/rows beyond the detected rank are zero-masked.  The rank is
    the geqp3tol stopping rule: contributions stop once the pivot column
    norm (= |R[k,k]|) drops to ``tol`` relative to the first pivot.
    """
    m, n = T.shape[-2], T.shape[-1]
    batch = T.shape[:-2]
    dt = T.dtype
    rdt = jnp.real(jnp.zeros((), dt)).dtype
    N = int(np.prod(batch)) if batch else 1
    Tf = T.reshape(N, m, n)

    def body(k, st):
        R, U, V, pv = st
        cn = jnp.sqrt(jnp.sum(jnp.abs(R) ** 2, axis=-2))       # [N, n]
        j = jnp.argmax(cn, axis=-1)                            # [N]
        nrm = jnp.take_along_axis(cn, j[:, None], -1)[:, 0]    # [N]
        q = jnp.take_along_axis(R, j[:, None, None], -1)[..., 0]  # [N, m]
        q = q / jnp.where(nrm > 0, nrm, 1.0).astype(dt)[:, None]
        # v = q^H R picks up v[j] = nrm, so U V reconstructs the pivot
        # column exactly; the rank-1 deflation zeroes it in the residual
        v = jnp.einsum("bm,bmn->bn", jnp.conj(q), R,
                       preferred_element_type=dt)
        R = R - q[:, :, None] * v[:, None, :]
        U = U.at[:, :, k].set(q)
        V = V.at[:, k, :].set(v)
        pv = pv.at[:, k].set(nrm)
        return R, U, V, pv

    if r <= 16:
        # fully unrolled: XLA while-loop iterations are host-stepped on
        # this platform (~0.65 ms each through the tunnel, PERF.md)
        R = Tf
        qs, vs, pvs = [], [], []
        for _ in range(r):
            cn = jnp.sqrt(jnp.sum(jnp.abs(R) ** 2, axis=-2))
            j = jnp.argmax(cn, axis=-1)
            nrm = jnp.take_along_axis(cn, j[:, None], -1)[:, 0]
            q = jnp.take_along_axis(R, j[:, None, None], -1)[..., 0]
            q = q / jnp.where(nrm > 0, nrm, 1.0).astype(dt)[:, None]
            v = jnp.einsum("bm,bmn->bn", jnp.conj(q), R,
                           preferred_element_type=dt)
            R = R - q[:, :, None] * v[:, None, :]
            qs.append(q)
            vs.append(v)
            pvs.append(nrm)
        U = jnp.stack(qs, axis=-1)
        V = jnp.stack(vs, axis=1)
        pv = jnp.stack(pvs, axis=-1)
    else:
        # chunk-unrolled fori_loop: 8 static steps per loop iteration cut
        # the host-stepped round-trips 8x while keeping the program ~8x
        # smaller than a full unroll (a fully unrolled r=128 RRQR per BLR
        # tile SIGKILLed the 50^3 remote compile)
        CH = 8
        rr = -(-r // CH) * CH

        def chunk(it, st):
            R, U, V, pv = st
            for i in range(CH):
                k = it * CH + i
                R, U, V, pv = body(k, (R, U, V, pv))
            return R, U, V, pv

        U0 = jnp.zeros((N, m, rr), dt)
        V0 = jnp.zeros((N, rr, n), dt)
        pv0 = jnp.zeros((N, rr), rdt)
        _, U, V, pv = jax.lax.fori_loop(0, rr // CH, chunk,
                                        (Tf, U0, V0, pv0))
        U, V, pv = U[:, :, :r], V[:, :r, :], pv[:, :r]
    # geqp3tol semantics: keep columns while |R[k,k]| > rtol * |R[0,0]|
    # (monotone in exact arithmetic; enforce with a running cummax guard
    # against FP noise in the tail)
    keep = pv > tol * jnp.maximum(pv[:, :1], jnp.finfo(rdt).tiny)
    ranks = jnp.cumprod(keep.astype(jnp.int32), axis=-1).sum(axis=-1)
    mask = jnp.arange(r)[None] < ranks[:, None]
    U = jnp.where(mask[:, None, :], U, 0.0)
    V = jnp.where(mask[:, :, None], V, 0.0)
    return (U.reshape(batch + (m, r)), V.reshape(batch + (r, n)),
            ranks.reshape(batch))
