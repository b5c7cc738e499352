"""Double-float (two-f32) compensated arithmetic for f64-quality residuals.

TPUs have no native f64; the reference's f64 accuracy contract (residual
1e-10, BASELINE.md) is met on-chip by evaluating the *residual path* of
iterative refinement in double-float arithmetic: each value is an unevaluated
sum hi + lo of two f32 (~48-bit effective mantissa, unit roundoff ~1e-14).

Implements Dekker/Knuth error-free transformations on the VPU (no FMA
dependency: Dekker split multiplication) and a padded-ELL spmv whose
accumulation is compensated.  This is the on-TPU analog of the reference's
mixed-precision refinement (SparseSolverMixedPrecision.cpp:64-130) when the
"high" precision itself must be emulated.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def two_sum(a, b):
    """Error-free transformation: a + b = s + e exactly (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b = s + e, requires |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split of f32 into high/low 12-bit halves."""
    c = a * jnp.float32(4097.0)   # 2^12 + 1
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: a * b = p + e exactly (Dekker, no FMA)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_from_f64(x):
    """Host-side conversion f64 -> (hi, lo) f32 pair."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def df_to_f64(hi, lo):
    import numpy as np
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


def df_add(xh, xl, yh, yl):
    """(xh,xl) + (yh,yl), double-float."""
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return fast_two_sum(s, e)


def df_neg(xh, xl):
    return -xh, -xl


def df_scale_add(xh, xl, a, yh, yl):
    """(x) + a*(y) with f32 scalar a (compensated product)."""
    ph, pe = two_prod(a, yh)
    pe = pe + a * yl
    sh, se = two_sum(xh, ph)
    se = se + (xl + pe)
    return fast_two_sum(sh, se)


@jax.jit
def df_spmv_ell(vals, vals_lo, cols, xh, xl):
    """Compensated padded-ELL spmv: y = A x with A AND x double-float.

    vals/vals_lo [n, w] f32 (A's values split hi + lo — without the lo
    part the residual floor is eps_f32 * |A| ~ 1e-8 componentwise, the
    round-4 chip measurement); cols [n, w]; x pair [n].  The row
    accumulation keeps a running compensation term, ~1e-14 effective."""
    n, w = vals.shape
    xh_e = jnp.concatenate([xh, jnp.zeros((1,), jnp.float32)])
    xl_e = jnp.concatenate([xl, jnp.zeros((1,), jnp.float32)])
    gxh = xh_e[cols]       # [n, w]
    gxl = xl_e[cols]

    def body(j, acc):
        sh, sl = acc
        ph, pe = two_prod(vals[:, j], gxh[:, j])
        pe = pe + vals[:, j] * gxl[:, j] + vals_lo[:, j] * gxh[:, j]
        th, te = two_sum(sh, ph)
        te = te + (sl + pe)
        sh, sl = fast_two_sum(th, te)
        return sh, sl

    z = jnp.zeros((n,), jnp.float32)
    sh, sl = jax.lax.fori_loop(0, w, body, (z, z))
    return sh, sl


def make_df_ir(pdev, rtol, atol, maxit):
    """Jitted double-float iterative refinement: f32 factor corrections,
    compensated (f32x2) residuals — f64-equivalent convergence on chips
    without native f64."""
    from ..frontal import numeric

    def run(fac_tree, vals, vals_lo, cols, bh, bl):
        bnorm = jnp.linalg.norm(bh.astype(jnp.float32))
        tol = jnp.maximum(jnp.float32(rtol) * bnorm, jnp.float32(atol))

        def prec(r):
            x = numeric._solve_impl(pdev, pdev.arrays, fac_tree,
                                    r[:, None])
            return x[:, 0]

        def cond(st):
            xh, xl, rh, rl, rn, it = st
            return (it < maxit) & (rn > tol)

        def body(st):
            xh, xl, rh, rl, rn, it = st
            d = prec(rh)
            xh, xl = df_scale_add(xh, xl, jnp.float32(1.0), d,
                                  jnp.zeros_like(d))
            ah, al = df_spmv_ell(vals, vals_lo, cols, xh, xl)
            rh, rl = df_add(bh, bl, -ah, -al)
            return xh, xl, rh, rl, jnp.linalg.norm(rh), it + 1

        z = jnp.zeros_like(bh)
        st = (z, z, bh, bl, bnorm, jnp.zeros((), jnp.int32))
        xh, xl, rh, rl, rn, it = jax.lax.while_loop(cond, body, st)
        return xh, xl, it, rn / jnp.maximum(bnorm, jnp.float32(1e-30))

    return jax.jit(run)
