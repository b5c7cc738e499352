"""Numeric multifrontal factorization / solve over a LevelPlan (JAX).

Role of the reference's numeric phase: FrontDense::factor_phase1/2
(FrontDense.cpp:207-284, assembly + LU + trsm + gemm Schur update), the GPU
level-batched traversal (FrontGPU.cpp:470-640) and the two-phase solve
(FrontDense.cpp:286-330) — re-expressed TPU-first:

* one batched dense kernel sequence per (level, bucket), all static shapes;
* assembly = one scatter-add of gathered matrix values + two extend-add
  gathers from the child level's flat CB buffer (see plan.py);
* contribution blocks of level k live in one flat device buffer consumed by
  level k+1's assembly — extend-add never leaves the device, exactly like
  the reference's GPU path where "the CB of level l stays on device".

Per-bucket jitted callables are cached by shape (jax.jit's trace cache), so
identical bucket shapes across levels and across factorizations share
compilations.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .plan import BucketPlan, LevelPlan


# ---------------------------------------------------------------------------
# device-side bucket data
# ---------------------------------------------------------------------------

class BucketDev:
    """Device copies of a BucketPlan's index arrays."""

    def __init__(self, bp: BucketPlan):
        self.bp = bp
        self.asm_bidx = jnp.asarray(bp.asm_bidx)
        self.asm_r = jnp.asarray(bp.asm_r)
        self.asm_c = jnp.asarray(bp.asm_c)
        self.asm_vidx = jnp.asarray(bp.asm_vidx)
        self.has_L = bool((bp.posL >= 0).any())
        self.has_R = bool((bp.posR >= 0).any())
        self.posL = jnp.asarray(bp.posL)
        self.posR = jnp.asarray(bp.posR)
        self.offL = jnp.asarray(bp.offL)
        self.offR = jnp.asarray(bp.offR)
        self.strideL = jnp.asarray(bp.strideL)
        self.strideR = jnp.asarray(bp.strideR)
        self.voffL = jnp.asarray(bp.voffL)
        self.voffR = jnp.asarray(bp.voffR)
        self.sep_glob = jnp.asarray(bp.sep_glob)
        self.upd_glob = jnp.asarray(bp.upd_glob)


class PlanDev:
    def __init__(self, plan: LevelPlan):
        self.plan = plan
        self.levels = [[BucketDev(bp) for bp in lvl] for lvl in plan.levels]


# ---------------------------------------------------------------------------
# per-bucket kernels (shape-polymorphic via jit cache)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nf", "p"))
def _assemble_scatter(vals_ext, bidx, r, c, vidx, nf, p):
    F = jnp.zeros((nf, p, p), dtype=vals_ext.dtype)
    return F.at[bidx, r, c].add(vals_ext[vidx])


@jax.jit
def _extend_add(F, cb_flat, pos, off, stride):
    """F[f,i,j] += cb_flat[off[f] + pos[f,i]*stride[f] + pos[f,j]] (masked)."""
    idx = (off[:, None, None] + pos[:, :, None] * stride[:, None, None]
           + pos[:, None, :])
    mask = (pos[:, :, None] >= 0) & (pos[:, None, :] >= 0)
    safe = jnp.clip(idx, 0, cb_flat.shape[0] - 1)
    return F + jnp.where(mask, cb_flat[safe], jnp.zeros((), F.dtype))


@partial(jax.jit, static_argnames=("s_pad",))
def _factor_bucket(F, thresh, s_pad):
    """Batched partial factorization of identity-padded fronts.

    Returns (lu, perm, L21, U12, CB):
      lu   [nf,s,s]  packed L\\U of P F11 (tiny pivots replaced on the diag)
      perm [nf,s]    row permutation (applied form of the LAPACK pivots)
      U12  [nf,s,u]  = L^-1 P F12
      L21  [nf,u,s]  = F21 U^-1
      CB   [nf,u,u]  = F22 - L21 U12   (contribution block)
    Mirrors FrontDense::factor_phase2 (FrontDense.cpp:254-284) with the
    reference's tiny-pivot replacement (threshold sqrt(eps)*|A|_1,
    SparseSolverBase.cpp:346-350) applied to the U diagonal.
    """
    s = s_pad
    F11 = F[:, :s, :s]
    lu, _, perm = jax.lax.linalg.lu(F11)
    d = jnp.diagonal(lu, axis1=-2, axis2=-1)
    absd = jnp.abs(d)
    repl = jnp.where(absd < thresh,
                     jnp.where(d == 0, thresh,
                               jnp.sign(jnp.real(d)).astype(d.dtype) * thresh
                               ) * jnp.ones((), d.dtype),
                     d)
    ii = jnp.arange(s)
    lu = lu.at[:, ii, ii].set(repl)
    F12 = jnp.take_along_axis(F[:, :s, s:], perm[:, :, None], axis=1)
    U12 = jax.lax.linalg.triangular_solve(
        lu, F12, left_side=True, lower=True, unit_diagonal=True)
    L21 = jax.lax.linalg.triangular_solve(
        lu, F[:, s:, :s], left_side=False, lower=False, unit_diagonal=False)
    CB = F[:, s:, s:] - jnp.matmul(L21, U12,
                                   preferred_element_type=F.dtype)
    return lu, perm, L21, U12, CB


@jax.jit
def _ext_add_vec(v, cbv_flat, pos, voff):
    idx = voff[:, None] + pos
    mask = pos >= 0
    safe = jnp.clip(idx, 0, cbv_flat.shape[0] - 1)
    return v + jnp.where(mask[:, :, None], cbv_flat[safe],
                         jnp.zeros((), v.dtype))


@partial(jax.jit, static_argnames=("s_pad",))
def _fwd_bucket(lu, perm, L21, bloc, s_pad):
    """Forward solve of one bucket: y = L^-1 P b_sep; cbv = b_upd - L21 y.
    Mirrors FrontDense fwd_solve_phase2 (FrontDense.cpp:286-305)."""
    s = s_pad
    bsep = jnp.take_along_axis(bloc[:, :s], perm[:, :, None], axis=1)
    y = jax.lax.linalg.triangular_solve(
        lu, bsep, left_side=True, lower=True, unit_diagonal=True)
    cbv = bloc[:, s:] - jnp.matmul(L21, y, preferred_element_type=y.dtype)
    return y, cbv


@jax.jit
def _bwd_bucket(lu, U12, y, xupd):
    """Backward solve: x_sep = U^-1 (y - U12 x_upd).
    Mirrors FrontDense bwd_solve_phase1 (FrontDense.cpp:307-330)."""
    z = y - jnp.matmul(U12, xupd, preferred_element_type=y.dtype)
    return jax.lax.linalg.triangular_solve(
        lu, z, left_side=True, lower=False, unit_diagonal=False)


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------

class Factors:
    """Numeric LU factors in level-batched layout (device arrays)."""

    def __init__(self, pdev: PlanDev, dtype):
        self.pdev = pdev
        self.dtype = dtype
        self.lu = {}     # (lvl, bkt) -> [nf,s,s]
        self.perm = {}
        self.L21 = {}
        self.U12 = {}
        self.blr = {}    # (lvl, bkt) -> (lud, perms, Uu, Vu, Ul, Vl)
        self.blr_ranks = {}

    def max_rank(self) -> int:
        """Largest compressed tile rank (reference 'maximum rank' stat)."""
        import numpy as np
        m = 0
        for r in self.blr_ranks.values():
            m = max(m, int(np.asarray(r).max()) if r.size else 0)
        return m


def factorize(pdev: PlanDev, Avals, thresh=0.0, dtype=None,
              blr_tol=1e-4) -> Factors:
    """Numeric factorization given device values of the permuted matrix."""
    plan = pdev.plan
    Avals = jnp.asarray(Avals, dtype=dtype)
    dtype = Avals.dtype
    vals_ext = jnp.concatenate(
        [Avals, jnp.array([0.0, 1.0], dtype=dtype)])
    rdt = jnp.real(jnp.zeros((), dtype)).dtype
    thresh = jnp.asarray(thresh, dtype=rdt)
    tol = jnp.asarray(blr_tol, dtype=rdt)
    fac = Factors(pdev, dtype)
    cb_flat = jnp.zeros((0,), dtype=dtype)
    for li, level in enumerate(pdev.levels):
        cb_parts = []
        for bi, bd in enumerate(level):
            bp = bd.bp
            F = _assemble_scatter(vals_ext, bd.asm_bidx, bd.asm_r, bd.asm_c,
                                  bd.asm_vidx, nf=bp.nf, p=bp.p)
            if bd.has_L:
                F = _extend_add(F, cb_flat, bd.posL, bd.offL, bd.strideL)
            if bd.has_R:
                F = _extend_add(F, cb_flat, bd.posR, bd.offR, bd.strideR)
            if bp.blr:
                from . import blr as B
                t = bp.tile
                nt, nts = bp.p // t, bp.s_pad // t
                lud, perms, Uu, Vu, Ul, Vl, CB, rk = B.blr_factor_bucket(
                    F, thresh, tol, t=t, r=bp.max_rank, nts=nts, nt=nt)
                fac.blr[(li, bi)] = (lud, perms, Uu, Vu, Ul, Vl)
                fac.blr_ranks[(li, bi)] = rk
            else:
                lu, perm, L21, U12, CB = _factor_bucket(F, thresh,
                                                        s_pad=bp.s_pad)
                fac.lu[(li, bi)] = lu
                fac.perm[(li, bi)] = perm
                fac.L21[(li, bi)] = L21
                fac.U12[(li, bi)] = U12
            cb_parts.append(CB.reshape(-1))
        cb_flat = (jnp.concatenate(cb_parts) if cb_parts
                   else jnp.zeros((0,), dtype=dtype))
    return fac


def solve(fac: Factors, b) -> jnp.ndarray:
    """Multifrontal solve for x with the factors; b is [n] or [n, nrhs] in
    the *permuted+scaled* ordering (the driver handles transforms)."""
    pdev = fac.pdev
    plan = pdev.plan
    n = plan.n
    b = jnp.asarray(b, dtype=fac.dtype)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    nrhs = b.shape[1]
    bext = jnp.concatenate([b, jnp.zeros((1, nrhs), b.dtype)], axis=0)

    # forward: deepest level first
    ys = {}
    cbv_flat = jnp.zeros((0, nrhs), dtype=b.dtype)
    for li, level in enumerate(pdev.levels):
        parts = []
        for bi, bd in enumerate(level):
            bp = bd.bp
            bloc = jnp.concatenate(
                [bext[bd.sep_glob], jnp.zeros((bp.nf, bp.u_pad, nrhs),
                                              b.dtype)], axis=1)
            if bd.has_L:
                bloc = _ext_add_vec(bloc, cbv_flat, bd.posL, bd.voffL)
            if bd.has_R:
                bloc = _ext_add_vec(bloc, cbv_flat, bd.posR, bd.voffR)
            if bp.blr:
                from . import blr as B
                lud, perms, Uu, Vu, Ul, Vl = fac.blr[(li, bi)]
                t = bp.tile
                y, cbv = B.blr_fwd_bucket(lud, perms, Ul, Vl, bloc, t=t,
                                          nts=bp.s_pad // t, nt=bp.p // t)
            else:
                y, cbv = _fwd_bucket(fac.lu[(li, bi)], fac.perm[(li, bi)],
                                     fac.L21[(li, bi)], bloc, s_pad=bp.s_pad)
            ys[(li, bi)] = y
            parts.append(cbv.reshape(-1, nrhs))
        cbv_flat = (jnp.concatenate(parts) if parts
                    else jnp.zeros((0, nrhs), b.dtype))

    # backward: root level last in pdev.levels -> iterate reversed
    xext = jnp.zeros((n + 1, nrhs), dtype=b.dtype)
    for li in range(len(pdev.levels) - 1, -1, -1):
        for bi, bd in enumerate(pdev.levels[li]):
            bp = bd.bp
            xupd = xext[bd.upd_glob]
            if bp.blr:
                from . import blr as B
                lud, perms, Uu, Vu, Ul, Vl = fac.blr[(li, bi)]
                t = bp.tile
                xsep = B.blr_bwd_bucket(lud, Uu, Vu, ys[(li, bi)], xupd,
                                        t=t, nts=bp.s_pad // t,
                                        nt=bp.p // t)
            else:
                xsep = _bwd_bucket(fac.lu[(li, bi)], fac.U12[(li, bi)],
                                   ys[(li, bi)], xupd)
            xext = xext.at[bd.sep_glob.reshape(-1)].set(
                xsep.reshape(-1, nrhs), mode="drop")
            xext = xext.at[n].set(jnp.zeros((nrhs,), b.dtype))
    x = xext[:n]
    return x[:, 0] if squeeze else x
