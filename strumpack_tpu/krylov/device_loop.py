"""Fully-on-device outer iterations (jitted lax.while_loop).

The host-loop solvers in solvers.py mirror the reference's structure (one
reduction per iteration); through the single-chip tunnel every host sync
costs ~50-100 ms, so the production path runs the entire iteration on
device: preconditioner application (the whole multifrontal solve) and the
spmv are traceable, and the loop is a lax.while_loop with the convergence
test in the condition.  Mixed precision follows
SparseSolverMixedPrecision.cpp:64-130: the residual/update run in
``refine`` dtype, the preconditioner in the (lower) factor dtype.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..frontal import numeric
from ..ops.spmv import spmv_ell


def make_device_ir(pdev, ell, rtol, atol, maxit):
    """Returns jitted (fac_tree, vals, cols, b) -> (x, iters, relres).

    b may be [n] or [n, nrhs]: the blocked variant runs ONE iteration
    stream for all right-hand sides (the reference's DenseMatrix-rhs
    iterative refinement, IterativeSolvers.hpp:56-141) — the multifrontal
    preconditioner and the spmv batch over the rhs axis, and the loop
    runs until every column's residual converges."""

    def run(fac_tree, vals, cols, b):
        rdt = b.dtype
        squeeze = b.ndim == 1
        B = b[:, None] if squeeze else b
        bnorm = jnp.linalg.norm(B, axis=0)               # [nrhs]
        tol = jnp.maximum(rtol * bnorm, atol)

        def prec(R):
            rl = R.astype(_factor_dtype(fac_tree))
            return numeric._solve_impl(pdev, pdev.arrays, fac_tree,
                                       rl).astype(rdt)

        def cond(st):
            x, r, rn, it = st
            return (it < maxit) & jnp.any(rn > tol)

        def body(st):
            x, r, rn, it = st
            x = x + prec(r)
            r = B - spmv_ell(vals, cols, x)
            return x, r, jnp.linalg.norm(r, axis=0), it + 1

        x, r, rn, it = jax.lax.while_loop(
            cond, body,
            (jnp.zeros_like(B), B, bnorm, jnp.zeros((), jnp.int32)))
        rel = jnp.max(rn / jnp.maximum(bnorm, jnp.finfo(rdt).tiny))
        return (x[:, 0] if squeeze else x), it, rel

    return jax.jit(run)


def _factor_dtype(fac_tree):
    if "fdt" in fac_tree:   # explicit marker (robust to quantized buckets)
        return fac_tree["fdt"].dtype
    for v in fac_tree["lu"].values():
        return v.dtype
    for v in fac_tree["blr"].values():
        return v[0].dtype
    raise ValueError("empty factor tree")
