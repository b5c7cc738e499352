"""Mesh-sharded outer iterations.

Role of the reference's distributed sparse pieces: block-row distributed
CSR spmv with halo exchange (``CSRMatrixMPI.{hpp,cpp}`` spmv buffers
:239-240) and the MPI Krylov variants (``IterativeRefinementMPI.cpp``,
allreduce dot products).  TPU-native mapping:

* Krylov vectors are sharded over the mesh's ``b`` axis (block-row
  distribution); the padded-ELL spmv shards over its row axis, with XLA
  inserting the gather of remote x entries (the halo exchange role) —
  collectives ride ICI;
* dot products / norms over sharded vectors lower to psum (the allreduce
  role);
* the preconditioner (whole multifrontal solve) gathers the residual to
  replicated, runs the level-batched solve (itself bucket-sharded when
  executed under the same mesh), and re-shards the correction.

The entire refinement loop is one jitted program over the mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..frontal import numeric
from ..ops.spmv import spmv_ell


def make_sharded_ir(pdev, mesh: Mesh, rtol, atol, maxit):
    """Jitted (fac_tree, vals, cols, b) -> (x, it, relres) with block-row
    sharding over mesh axis 'b'."""
    rowshard = NamedSharding(mesh, P(*( ("b",) + (None,) * 1)))
    repl = NamedSharding(mesh, P())

    def run(fac_tree, vals, cols, b):
        rdt = b.dtype
        vals = jax.lax.with_sharding_constraint(vals, rowshard)
        cols = jax.lax.with_sharding_constraint(cols, rowshard)
        b = jax.lax.with_sharding_constraint(b, NamedSharding(mesh, P("b")))
        bnorm = jnp.linalg.norm(b)   # psum-lowered reduction
        tol = jnp.maximum(rtol * bnorm, atol)

        def prec(r):
            rfull = jax.lax.with_sharding_constraint(r, repl)
            rl = rfull.astype(_fdt(fac_tree))
            x = numeric._solve_impl(pdev, pdev.arrays, fac_tree,
                                    rl[:, None])[:, 0]
            return jax.lax.with_sharding_constraint(
                x.astype(rdt), NamedSharding(mesh, P("b")))

        def cond(st):
            x, r, rn, it = st
            return (it < maxit) & (rn > tol)

        def body(st):
            x, r, rn, it = st
            x = x + prec(r)
            r = b - spmv_ell(vals, cols, x)
            r = jax.lax.with_sharding_constraint(
                r, NamedSharding(mesh, P("b")))
            return x, r, jnp.linalg.norm(r), it + 1

        x, r, rn, it = jax.lax.while_loop(
            cond, body,
            (jnp.zeros_like(b), b, bnorm, jnp.zeros((), jnp.int32)))
        return x, it, rn / jnp.maximum(bnorm, jnp.finfo(rdt).tiny)

    return jax.jit(run)


def _fdt(fac_tree):
    if "fdt" in fac_tree:   # explicit marker (robust to quantized buckets)
        return fac_tree["fdt"].dtype
    for v in fac_tree["lu"].values():
        return v.dtype
    for v in fac_tree["blr"].values():
        return v[0].dtype
    raise ValueError("empty factor tree")


def make_sharded_bicgstab(pdev, mesh: Mesh, rtol, atol, maxit):
    """Mesh-sharded preconditioned BiCGStab (BiCGStabMPI role,
    iterative/BiCGStabMPI.cpp): the whole iteration is one jitted
    while_loop over the mesh — block-row sharded spmv and vectors,
    psum-lowered vdots, replicated preconditioner application.
    Breakdown guards (rho, denom, omega = 0) end the loop via a flag."""
    rowshard = NamedSharding(mesh, P(*(("b",) + (None,) * 1)))
    repl = NamedSharding(mesh, P())
    vec = lambda v: jax.lax.with_sharding_constraint(
        v, NamedSharding(mesh, P("b")))

    def run(fac_tree, vals, cols, b):
        rdt = b.dtype
        vals = jax.lax.with_sharding_constraint(vals, rowshard)
        cols = jax.lax.with_sharding_constraint(cols, rowshard)
        b = vec(b)
        bnorm = jnp.linalg.norm(b)
        tol = jnp.maximum(rtol * bnorm, atol)
        tiny = jnp.finfo(rdt).tiny

        def prec(r):
            rfull = jax.lax.with_sharding_constraint(r, repl)
            rl = rfull.astype(_fdt(fac_tree))
            x = numeric._solve_impl(pdev, pdev.arrays, fac_tree,
                                    rl[:, None])[:, 0]
            return vec(x.astype(rdt))

        def spmv(x):
            return vec(spmv_ell(vals, cols, x))

        def cond(st):
            x, r, rt, p, v, rho_o, alpha, omega, rn, it, brk = st
            return (it < maxit) & (rn > tol) & ~brk

        def body(st):
            x, r, rt, p, v, rho_o, alpha, omega, rn, it, brk = st
            rho = jnp.vdot(rt, r)
            beta = (rho / jnp.where(rho_o == 0, 1, rho_o)) * (
                alpha / jnp.where(omega == 0, 1, omega))
            p = jnp.where(it == 0, r, r + beta * (p - omega * v))
            phat = prec(p)
            v = spmv(phat)
            denom = jnp.vdot(rt, v)
            alpha = rho / jnp.where(denom == 0, 1, denom)
            s = r - alpha * v
            shat = prec(s)
            t = spmv(shat)
            tt = jnp.vdot(t, t)
            omega = jnp.where(tt == 0, 0.0,
                              jnp.vdot(t, s) / jnp.where(tt == 0, 1, tt))
            x = x + alpha * phat + omega * shat
            r = s - omega * t
            brk = (rho == 0) | (denom == 0) | (omega == 0)
            return (x, vec(r), rt, p, v, rho, alpha, omega,
                    jnp.linalg.norm(r), it + 1, brk)

        z = jnp.zeros_like(b)
        st = (z, b, b, z, z, jnp.ones((), rdt), jnp.ones((), rdt),
              jnp.ones((), rdt), bnorm, jnp.zeros((), jnp.int32),
              jnp.zeros((), bool))
        x, r, rt, p, v, rho_o, alpha, omega, rn, it, brk = (
            jax.lax.while_loop(cond, body, st))
        return x, it, rn / jnp.maximum(bnorm, tiny)

    return jax.jit(run)


def make_sharded_gmres(pdev, mesh: Mesh, rtol, atol, maxit, restart):
    """Mesh-sharded restarted GMRES (GMResMPI role): block-row sharded
    spmv and Krylov basis, psum-lowered dots, replicated preconditioner
    application — built on the on-device GMRES machinery."""
    from ..krylov.device_gmres import make_device_gmres
    base = make_device_gmres(pdev, rtol, atol, maxit, restart)
    rowshard = NamedSharding(mesh, P("b", None))
    repl = NamedSharding(mesh, P())

    def run(fac_tree, vals, cols, b):
        vals = jax.lax.with_sharding_constraint(vals, rowshard)
        cols = jax.lax.with_sharding_constraint(cols, rowshard)
        b = jax.lax.with_sharding_constraint(b, NamedSharding(mesh, P("b")))
        return base(fac_tree, vals, cols, b)

    return jax.jit(run)
