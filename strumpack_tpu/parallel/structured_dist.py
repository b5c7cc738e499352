"""Mesh-distributed structured dense matrices.

Role of the reference's MPI structured stack — ``HSS::HSSMatrixMPI``
(HSS/HSSMatrixMPI.hpp: BLACS-grid HSS with distributed compression /
ULV / solve), ``BLR::BLRMatrixMPI`` (BLR/BLRMatrixMPI.hpp:120:
``ProcessorGrid2D`` tile-cyclic layout, broadcast-based tile LU) and the
``structured::StructuredMatrix`` MPI factories
(StructuredMatrix.hpp:70-160 taking ``DistributedMatrix`` / 2D
block-cyclic inputs) — re-designed for a TPU mesh:

* the operand lives 2D-sharded over mesh axes ``(r, c)`` (the analog of
  the 2D block-cyclic / tile-cyclic process grids); tile and leaf-block
  batches inherit that sharding, so compression is data-parallel across
  the mesh;
* the algorithms are the SAME level-batched kernels as the single-chip
  path (frontal/blr.py tile LU, structured/hss.py HSS) traced under jit
  with sharding constraints — XLA inserts the broadcasts/reductions the
  reference implements by hand (row/col tile broadcasts in
  BLRMatrixMPI::partial_factor, sub-communicator gathers in
  HSSMatrixMPI) as ICI collectives;
* no pencil of MPI code: rank-local layouts, alltoallv packing and
  BLACS contexts have no role on a TPU mesh.

Validated on a virtual multi-device CPU mesh (tests/test_dist.py), the
same way the reference tests MPI ranks by oversubscription.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..structured.structured import (StructuredMatrix, StructuredOptions,
                                     Type)


def _grid_axes(mesh: Mesh):
    names = mesh.axis_names
    if "r" in names and "c" in names:
        return "r", "c"
    if len(names) >= 2:
        return names[0], names[1]
    return names[0], None


def _shard2d(mesh):
    r, c = _grid_axes(mesh)
    return NamedSharding(mesh, P(r, c))


class DistBLR(StructuredMatrix):
    """BLRMatrixMPI role: the padded operand (and its tile grid) is
    sharded over the (r, c) mesh axes; compression, tile LU and the solve
    sweeps run as one SPMD program each."""

    def __init__(self, A, mesh: Mesh, opts: StructuredOptions):
        from ..frontal.blr import choose_tile, _compress_tiles
        self.mesh = mesh
        A = jnp.asarray(A)
        self.rows = self.cols = A.shape[0]
        m = self.rows
        t = choose_tile(max(m, opts.leaf_size), 0, opts.leaf_size)
        self.mpad = ((m + t - 1) // t) * t
        self.t = t
        self.r = min(opts.max_rank or t // 2, t)
        self.opts = opts
        sh = _shard2d(mesh)
        rax, cax = _grid_axes(mesh)

        def prep(A):
            Ap = jnp.zeros((self.mpad, self.mpad), A.dtype)
            Ap = Ap.at[:m, :m].set(A)
            ii = jnp.arange(m, self.mpad)
            Ap = Ap.at[ii, ii].set(1.0)
            return jax.lax.with_sharding_constraint(Ap, sh)

        self.Ap = jax.jit(prep, out_shardings=sh)(A)
        nt = self.mpad // t

        def compress(Ap):
            tiles = Ap.reshape(nt, t, nt, t).transpose(0, 2, 1, 3)
            # tile-cyclic role: tile-grid axes sharded over the mesh grid
            tiles = jax.lax.with_sharding_constraint(
                tiles, NamedSharding(mesh, P(rax, cax, None, None)))
            tol = jnp.asarray(opts.rel_tol,
                              jnp.real(jnp.zeros((), Ap.dtype)).dtype)
            U, V, ranks = _compress_tiles(tiles, tol, self.r)
            ii = jnp.arange(nt)
            return tiles[ii, ii], U, V, ranks

        self._diag, self._U, self._V, ranks = jax.jit(compress)(self.Ap)
        off = ~np.eye(nt, dtype=bool)
        self._ranks = np.asarray(ranks)[off]
        self._fac = None

    def mult(self, x):
        nt, t = self.mpad // self.t, self.t
        squeeze = x.ndim == 1
        x = jnp.asarray(x, self.Ap.dtype)
        if squeeze:
            x = x[:, None]

        @jax.jit
        def mv(diag, U, V, x):
            xp = jnp.zeros((self.mpad, x.shape[1]),
                           x.dtype).at[:self.rows].set(x)
            xb = xp.reshape(nt, t, -1)
            vx = jnp.einsum("ijrt,jtk->ijrk", V, xb)
            y = jnp.einsum("ijtr,ijrk->itk", U, vx)
            ii = jnp.arange(nt)
            y = (y - jnp.einsum("itr,irk->itk", U[ii, ii], vx[ii, ii])
                 + jnp.einsum("its,isk->itk", diag, xb))
            return y.reshape(self.mpad, -1)[:self.rows]

        y = mv(self._diag, self._U, self._V, x)
        return y[:, 0] if squeeze else y

    def factor(self):
        from ..frontal.blr import blr_factor_bucket
        t = self.t
        nt = self.mpad // t
        rax, cax = _grid_axes(self.mesh)
        sh = _shard2d(self.mesh)

        @jax.jit
        def fac(Ap):
            Ap = jax.lax.with_sharding_constraint(Ap, sh)
            tol = jnp.asarray(self.opts.rel_tol,
                              jnp.real(jnp.zeros((), Ap.dtype)).dtype)
            return blr_factor_bucket(Ap[None], jnp.asarray(0.0, tol.dtype),
                                     tol, t=t, r=self.r, nts=nt, nt=nt)

        self._fac = fac(self.Ap)

    def solve(self, b):
        from ..frontal.blr import blr_fwd_bucket, blr_bwd_bucket
        if self._fac is None:
            self.factor()
        lud, perms, Uu, Vu, Ul, Vl, Du, Dl, CB, rk = self._fac
        t = self.t
        nt = self.mpad // t
        squeeze = b.ndim == 1
        b = jnp.asarray(b, self.Ap.dtype)
        if squeeze:
            b = b[:, None]

        @jax.jit
        def sol(lud, perms, Uu, Vu, Ul, Vl, Du, Dl, b):
            bp = jnp.zeros((self.mpad, b.shape[1]),
                           b.dtype).at[:self.rows].set(b)
            y, _ = blr_fwd_bucket(lud, perms, Ul, Vl, Dl, bp[None], t=t,
                                  nts=nt, nt=nt)
            x = blr_bwd_bucket(lud, Uu, Vu, Du, y,
                               jnp.zeros((1, 0, b.shape[1]), b.dtype),
                               t=t, nts=nt, nt=nt)
            return x[0, :self.rows]

        x = sol(lud, perms, Uu, Vu, Ul, Vl, Du, Dl, b)
        return x[:, 0] if squeeze else x

    def rank(self):
        return int(self._ranks.max()) if self._ranks.size else 0

    def memory(self):
        return int(self._diag.size * self._diag.dtype.itemsize
                   + 2 * self.t * self._ranks.sum()
                   * self._diag.dtype.itemsize)


def _node_constrain(mesh: Mesh):
    """Sharding-constraint callback over the node/block-pair axis of
    level-batched structured arrays: shard the largest axis divisible by
    the device count (skipping small arrays — constraining them forces
    pointless reshards).  The standalone-facade analog of
    parallel/spmd._struct_constrain."""
    import math
    axes = tuple(mesh.axis_names)
    ndev = int(math.prod(mesh.shape.values()))

    def con(x):
        if ndev <= 1 or getattr(x, "size", 0) < (1 << 18):
            return x
        best, bestlen = -1, 0
        for ax, ln in enumerate(getattr(x, "shape", ())):
            if ln % ndev == 0 and ln >= 2 * ndev and ln > bestlen:
                best, bestlen = ax, ln
        if best < 0:
            return x
        spec = [None] * x.ndim
        spec[best] = axes
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec)))

    return con


class DistHSS(StructuredMatrix):
    """HSSMatrixMPI role: HSS built under jit from the 2D-sharded
    operand; the leaf-block batch (the bulk of compression work) is
    sharded over the mesh via the node-axis ``constrain`` hook, upper
    tree levels shrink geometrically and replicate — the analog of the
    reference's per-level sub-communicators
    (HSSMatrixMPI.compress.hpp:36-188)."""

    def __init__(self, A, mesh: Mesh, opts: StructuredOptions):
        from ..structured.hss import HSSMatrix
        self.mesh = mesh
        A = jnp.asarray(A)
        self.rows = self.cols = A.shape[0]
        sh = _shard2d(mesh)
        con = _node_constrain(mesh)

        def build(A):
            H = HSSMatrix(A, leaf_size=opts.leaf_size,
                          max_rank=opts.max_rank or opts.leaf_size,
                          rel_tol=opts.rel_tol, constrain=con)
            H.factor()
            return H

        self.H = jax.jit(build, in_shardings=sh)(A)

    def mult(self, x):
        return jax.jit(lambda H, x: H.matvec(x))(self.H, x)

    def factor(self):
        pass  # factored at construction (ULV inside the jitted build)

    def solve(self, b):
        return jax.jit(lambda H, b: H.solve(b))(self.H, b)

    def rank(self):
        return self.H.max_rank()

    def memory(self):
        return self.H.memory()


class DistHODLR(StructuredMatrix):
    """HODLRMatrixMPI role (HODLR/HODLRMatrix.hpp MPI ctor): HODLR
    compression + SMW factorization under jit with the block-pair-axis
    ``constrain`` hook partitioning every level's work over the mesh."""

    _cls = "hodlr"

    def __init__(self, A, mesh: Mesh, opts: StructuredOptions):
        from ..structured.hodbf import HODBFMatrix
        from ..structured.hodlr import HODLRMatrix
        self.mesh = mesh
        A = jnp.asarray(A)
        self.rows = self.cols = A.shape[0]
        sh = _shard2d(mesh)
        con = _node_constrain(mesh)
        cls = HODBFMatrix if self._cls == "hodbf" else HODLRMatrix

        def build(A):
            return cls(A, leaf_size=opts.leaf_size,
                       max_rank=opts.max_rank or opts.leaf_size,
                       rel_tol=opts.rel_tol, constrain=con)

        self.H = jax.jit(build, in_shardings=sh)(A)
        self._solver = None

    def mult(self, x):
        return jax.jit(lambda H, x: H.matvec(x))(self.H, jnp.asarray(x))

    def factor(self):
        if self._solver is None:
            self.H.factor()
            self._solver = True

    def solve(self, b):
        self.factor()
        return self.H.solve(jnp.asarray(b))

    def rank(self):
        return self.H.max_rank()

    def memory(self):
        return self.H.memory()


class DistHODBF(DistHODLR):
    """Distributed HODBF (butterfly-compressed HODLR with the TRUE
    direct factorization, the ButterflyPACK-MPI role)."""

    _cls = "hodbf"

    def solve(self, b):
        self.factor()
        return self.H.solve_direct(jnp.asarray(b))


def construct_from_dense_dist(A, mesh: Mesh,
                              opts: StructuredOptions | None = None,
                              **kw) -> StructuredMatrix:
    """Mesh-distributed analog of structured::construct_from_dense with a
    DistributedMatrix input (StructuredMatrix.hpp:515)."""
    opts = opts or StructuredOptions(**kw)
    if opts.type == Type.BLR:
        return DistBLR(A, mesh, opts)
    if opts.type == Type.HSS:
        return DistHSS(A, mesh, opts)
    if opts.type == Type.HODLR:
        return DistHODLR(A, mesh, opts)
    if opts.type in (Type.HODBF, Type.BUTTERFLY):
        return DistHODBF(A, mesh, opts)
    raise ValueError(f"no distributed construction for {opts.type}")


def construct_from_elements_dist(elem, n, mesh: Mesh,
                                 opts: StructuredOptions | None = None,
                                 **kw) -> StructuredMatrix:
    """Mesh analog of the MPI construct_from_elements factories: the
    element function is evaluated under jit with the target 2D sharding,
    so each device materializes only its shard of the operand."""
    opts = opts or StructuredOptions(**kw)
    sh = _shard2d(mesh)

    @partial(jax.jit, out_shardings=sh)
    def build():
        I = jnp.arange(n)
        return elem(I[:, None], I[None, :])

    return construct_from_dense_dist(build(), mesh, opts)
