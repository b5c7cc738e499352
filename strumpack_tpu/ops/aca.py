"""Adaptive cross approximation (element-based low-rank).

Role of the reference's ``dense/ACA.{hpp,cpp}`` (adaptive cross
approximation with partial pivoting) and ``dense/BACA.{hpp,cpp}`` (blocked
variant) — the element-access low-rank compressors selectable for BLR tiles
(BLROptions LowRankAlgorithm::{ACA,BACA}).

TPU-first shape: fixed max rank r with masked actual rank (static shapes);
the pivot search loop is a Python loop of r steps over batched residual
updates — each step is rank-1 (ACA) or rank-b (BACA) elementwise work on
the VPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("r",))
def aca(T, tol, r):
    """Batched full-pivoted ACA of dense tiles T [..., m, n].

    Returns (U [..., m, r], V [..., r, n], ranks [...]) with columns/rows
    beyond the detected rank zeroed; stops contributing when the pivot
    magnitude falls below tol * (first pivot).  The rank loop is a
    lax.fori_loop so the compiled program stays small regardless of r
    (unlike an unrolled loop or a batched SVD).
    """
    m, n = T.shape[-2], T.shape[-1]
    batch = T.shape[:-2]
    dt = T.dtype
    N = int(np.prod(batch)) if batch else 1
    Tf = T.reshape(N, m, n)

    def body(k, st):
        R, U, V, pv = st
        absR = jnp.abs(R).reshape(N, m * n)
        i = jnp.argmax(absR, axis=-1)
        pi, pj = i // n, i % n
        piv = jnp.take_along_axis(R.reshape(N, m * n), i[:, None], -1)[:, 0]
        safe_piv = jnp.where(jnp.abs(piv) > 0, piv, 1.0)
        col = jnp.take_along_axis(R, pj[:, None, None], -1)[..., 0]
        row = jnp.take_along_axis(R, pi[:, None, None], -2)[:, 0, :]
        u = col / safe_piv[:, None]
        R = R - u[:, :, None] * row[:, None, :]
        U = U.at[:, :, k].set(u)
        V = V.at[:, k, :].set(row)
        pv = pv.at[:, k].set(jnp.abs(piv))
        return R, U, V, pv

    U0 = jnp.zeros((N, m, r), dt)
    V0 = jnp.zeros((N, r, n), dt)
    pv0 = jnp.zeros((N, r), jnp.real(jnp.zeros((), dt)).dtype)
    _, U, V, pv = jax.lax.fori_loop(0, r, body, (Tf, U0, V0, pv0))
    ranks = (pv > tol * jnp.maximum(
        pv[:, 0], jnp.finfo(dt).tiny)[:, None]).sum(axis=-1)
    mask = jnp.arange(r)[None] < ranks[:, None]
    U = jnp.where(mask[:, None, :], U, 0.0)
    V = jnp.where(mask[:, :, None], V, 0.0)
    return (U.reshape(batch + (m, r)), V.reshape(batch + (r, n)),
            ranks.reshape(batch))


@partial(jax.jit, static_argnames=("r", "b"))
def baca(T, tol, r, b=4):
    """Blocked ACA (BACA.cpp role): b pivot rows/cols per step via a
    residual-norm block pivot; same masked-rank contract as aca()."""
    m, n = T.shape[-2], T.shape[-1]
    batch = T.shape[:-2]
    dt = T.dtype
    R = T
    U = jnp.zeros(batch + (m, r), dt)
    V = jnp.zeros(batch + (r, n), dt)
    nsteps = (r + b - 1) // b
    norms0 = jnp.linalg.norm(T, axis=(-2, -1))
    step_norms = []
    for s in range(nsteps):
        k0 = s * b
        bb = min(b, r - k0)
        # pick the bb rows with largest residual norms
        rn = jnp.linalg.norm(R, axis=-1)                # [..., m]
        _, rows = jax.lax.top_k(rn, bb)                 # [..., bb]
        Rrows = jnp.take_along_axis(R, rows[..., :, None], -2)  # [.., bb, n]
        # column pivots: bb largest-norm columns of those rows
        cn = jnp.linalg.norm(Rrows, axis=-2)            # [..., n]
        _, cols = jax.lax.top_k(cn, bb)
        core = jnp.take_along_axis(Rrows, cols[..., None, :], -1)  # [bb,bb]
        Rcols = jnp.take_along_axis(R, cols[..., None, :], -1)  # [.., m, bb]
        # pseudo-inverse: the core block can be rank-deficient once the
        # residual rank drops below the block size
        corei = jnp.linalg.pinv(core, rtol=1e-10)
        Ub = jnp.matmul(Rcols, corei, preferred_element_type=dt)
        R = R - jnp.matmul(Ub, Rrows, preferred_element_type=dt)
        step_norms.append(jnp.linalg.norm(R, axis=(-2, -1)))
        U = jax.lax.dynamic_update_slice_in_dim(U, Ub, k0, axis=-1)
        V = jax.lax.dynamic_update_slice_in_dim(V, Rrows, k0, axis=-2)
    sn = jnp.stack(step_norms, axis=-1)                 # [..., nsteps]
    done = sn <= tol * jnp.maximum(norms0, jnp.finfo(dt).tiny)[..., None]
    nused = nsteps - done.sum(axis=-1) + 1
    ranks = jnp.minimum(nused * b, r)
    mask = jnp.arange(r) < ranks[..., None]
    U = jnp.where(mask[..., None, :], U, 0.0)
    V = jnp.where(mask[..., :, None], V, 0.0)
    return U, V, ranks
