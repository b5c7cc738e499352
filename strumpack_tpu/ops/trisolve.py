"""Loop-free batched triangular solves for TPU.

XLA's ``triangular_solve`` iterates with a ``while`` loop (fixed per-
iteration sync cost on TPU — see ops/pallas_panel_lu.py); these replace it
in the hot factor/solve paths with statically-unrolled block substitution:

* bw x bw diagonal blocks are inverted *exactly* via the Neumann product
  ``inv(I-N) = (I+N)(I+N^2)(I+N^4)...`` (N strictly triangular, N^bw = 0,
  log2(bw) matmuls);
* the sweep across blocks is a Python-unrolled right-looking substitution
  (one MXU gemm per block step).

bw = 32 keeps the explicit inversion at substitution-level accuracy
(inverting much wider triangles amplifies f32 rounding).

Role of the reference's trsv/trsm solve kernels (FrontDense.cpp:286-330,
batched GPU solve kernels in FrontCUDA.cu).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TRSM_BW = 32


def unit_tri_inv(T, lower=True):
    """Exact inverse of batched *unit* triangular [nf, w, w] via the
    Neumann product (log2(w) matmuls, no substitution loop)."""
    nf, w, _ = T.shape
    eye = jnp.eye(w, dtype=T.dtype)
    N = -(jnp.tril(T, -1) if lower else jnp.triu(T, 1))
    M = eye + N
    Npow = N
    steps = max(0, int(np.ceil(np.log2(max(w, 2)))) - 1)
    for _ in range(steps):
        Npow = jnp.matmul(Npow, Npow, preferred_element_type=T.dtype)
        M = M + jnp.matmul(M, Npow, preferred_element_type=T.dtype)
    return M


def trsm_unit_lower(L, B, bw=TRSM_BW):
    """X = L^{-1} B, L batched unit-lower [nf,w,w], B [nf,w,m]."""
    nf, w, _ = L.shape
    if w <= bw:
        return jnp.matmul(unit_tri_inv(L, lower=True), B,
                          preferred_element_type=L.dtype)
    X = B
    nb = -(-w // bw)
    parts = []
    for i in range(nb):
        i0, i1 = i * bw, min((i + 1) * bw, w)
        Linv = unit_tri_inv(L[:, i0:i1, i0:i1], lower=True)
        Xi = jnp.matmul(Linv, X[:, i0:i1], preferred_element_type=L.dtype)
        parts.append(Xi)
        if i1 < w:
            X = jax.lax.dynamic_update_slice_in_dim(
                X, X[:, i1:] - jnp.matmul(L[:, i1:, i0:i1], Xi,
                                          preferred_element_type=L.dtype),
                i1, axis=1)
    return jnp.concatenate(parts, axis=1)


def _diag_scale(T):
    d = jnp.diagonal(T, axis1=-2, axis2=-1)
    safe = jnp.where(d == 0, jnp.ones((), T.dtype), d)
    return safe


def trsm_lower(L, B, bw=TRSM_BW, unit=False):
    """X = L^{-1} B for batched non-unit (or unit) lower triangular."""
    if unit:
        return trsm_unit_lower(L, B, bw)
    d = _diag_scale(L)
    Ln = L / d[:, :, None]             # row-scaled: L = D @ Ln, Ln unit
    return trsm_unit_lower(Ln, B / d[:, :, None], bw)


def trsm_upper(U, B, bw=TRSM_BW, unit=False):
    """X = U^{-1} B for batched upper triangular [nf,w,w]: bottom-up
    block substitution with exactly-inverted unit diagonal blocks."""
    nf, w, _ = U.shape
    if not unit:
        d = _diag_scale(U)
        U = U / d[:, :, None]
        B = B / d[:, :, None]
    if w <= bw:
        return jnp.matmul(unit_tri_inv(U, lower=False), B,
                          preferred_element_type=U.dtype)
    X = B
    nb = -(-w // bw)
    parts = []
    for i in range(nb - 1, -1, -1):
        i0, i1 = i * bw, min((i + 1) * bw, w)
        Uinv = unit_tri_inv(U[:, i0:i1, i0:i1], lower=False)
        Xi = jnp.matmul(Uinv, X[:, i0:i1], preferred_element_type=U.dtype)
        parts.append(Xi)
        if i0 > 0:
            X = jax.lax.dynamic_update_slice_in_dim(
                X, X[:, :i0] - jnp.matmul(U[:, :i0, i0:i1], Xi,
                                          preferred_element_type=U.dtype),
                0, axis=1)
    return jnp.concatenate(parts[::-1], axis=1)


# beyond this triangle width the unrolled block substitution's HLO cost
# (w/32 Python-unrolled block steps, each with log2(32) Neumann matmuls)
# outweighs its win over XLA's native triangular_solve: device while
# loops run at ~0.3 us/iteration on this platform (re-measured round 4),
# and native trsm on wide triangles is MXU-blocked by XLA itself
LOOPFREE_MAX_W = 96


def use_loopfree(dtype, w=None) -> bool:
    """Use the unrolled solves on the TPU f32 path for NARROW triangles
    (w <= LOOPFREE_MAX_W, where per-iteration loop overhead would exceed
    the tiny per-step work); XLA's native triangular_solve elsewhere
    (wide triangles, and f64 CPU tests keep LAPACK-grade substitution)."""
    if w is not None and w > LOOPFREE_MAX_W:
        return False
    return (jax.default_backend() == "tpu"
            and jnp.dtype(dtype) == jnp.float32)


def unrolled_lu(F, thresh=0.0, max_m=128):
    """vmap-safe pivoted LU: Python-unrolled masked elimination over the
    last two axes (static row/column indices, so it composes with vmap —
    unlike pallas_call — and contains no XLA while loop — unlike
    lax.linalg.lu).  Used by the HSS/HODLR ULV blocks, which are factored
    inside vmapped per-front closures.  Returns (packed L\\U, perm in
    applied form).  Falls back to lax.linalg.lu off the TPU f32 path or
    beyond max_m."""
    m = F.shape[-1]
    if not use_loopfree(F.dtype) or m > max_m or m == 0:
        lu, _, perm = jax.lax.linalg.lu(F)
        if thresh is not None:
            d = jnp.diagonal(lu, axis1=-2, axis2=-1)
            th = jnp.asarray(thresh, d.real.dtype)
            repl = jnp.where(jnp.abs(d) < th,
                             jnp.where(d == 0, th,
                                       jnp.sign(d.real).astype(d.dtype)
                                       * th), d)
            ii = jnp.arange(m)
            lu = lu.at[..., ii, ii].set(repl)
        return lu, perm
    th = jnp.asarray(thresh, F.dtype)
    ar = jnp.arange(m)
    P = jnp.broadcast_to(ar, F.shape[:-1]).astype(jnp.int32)
    for k in range(m):
        colk = jnp.abs(F[..., :, k])
        cand = jnp.where(ar >= k, colk, -1.0)
        rpiv = jnp.argmax(cand, axis=-1)             # [...]
        rowk = F[..., k, :]
        rowr = jnp.take_along_axis(
            F, rpiv[..., None, None], axis=-2)[..., 0, :]
        is_r = (ar[:, None] == rpiv[..., None, None])   # [..., m, 1]
        F = F.at[..., k, :].set(rowr)
        F = jnp.where(is_r, rowk[..., None, :], F)
        pk = P[..., k]
        pr = jnp.take_along_axis(P, rpiv[..., None], axis=-1)[..., 0]
        P = P.at[..., k].set(pr)
        P = jnp.where(ar == rpiv[..., None], pk[..., None], P)
        piv = F[..., k, k]
        piv = jnp.where(jnp.abs(piv) < th,
                        jnp.where(piv == 0, th, jnp.sign(piv) * th), piv)
        mult = jnp.where(ar > k, F[..., :, k] / piv[..., None], 0.0)
        upd = jnp.where(ar > k, F[..., k, :], 0.0)
        F = F - mult[..., :, None] * upd[..., None, :]
        F = F.at[..., :, k].set(
            jnp.where(ar > k, mult, F[..., :, k]))
        F = F.at[..., k, k].set(piv)
    return F, P
