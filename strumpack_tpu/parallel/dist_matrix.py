"""General mesh-distributed dense matrices (DistributedMatrix role).

Role of the reference's ``dense/DistributedMatrix.{hpp,cpp}`` +
``ScaLAPACKWrapper``/``BLACSGrid`` (DistributedMatrix.hpp:84: 2D
block-cyclic dense matrices with the p?geadd/p?gemm/p?trsm/p?getrf/
p?laswp/p?potrf operation surface and grid redistribution via
p?gemr2d) — re-designed for a TPU mesh:

* the matrix lives 2D-sharded over mesh axes ``(r, c)``
  (``NamedSharding(P("r", "c"))``) — XLA:TPU's tiled layout plus GSPMD
  fills the block-cyclic role: the compiler chooses per-device tiles
  and inserts the broadcasts/reductions ScaLAPACK implements by hand;
* every operation is a jitted GSPMD program with sharding-constrained
  inputs/outputs; collectives ride ICI;
* redistribution between grids (``p?gemr2d``) is ``jax.device_put``
  with the target sharding — one all-to-all, no rank-local packing
  code;
* factorizations reuse the tile-cyclic / blocked 2D LU kernels of
  ``dist2d.py`` (the p?getrf role) under the same mesh.

The op surface below mirrors the reference's DenseMatrix/
DistributedMatrix methods actually used by STRUMPACK's solvers
(DistributedMatrix.hpp:190-420): scale/add/axpby, gemm, trsm, laswp,
getrf/solve, norms, transpose, sub-block extraction/assignment.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _grid_axes(mesh: Mesh):
    names = mesh.axis_names
    if "r" in names and "c" in names:
        return "r", "c"
    if len(names) >= 2:
        return names[0], names[1]
    return names[0], None


class DistributedMatrix:
    """A dense [m, n] matrix 2D-sharded over a mesh's (r, c) axes."""

    def __init__(self, A, mesh: Mesh, axes=None):
        self.mesh = mesh
        self.axes = tuple(axes) if axes else _grid_axes(mesh)
        self.sharding = NamedSharding(mesh, P(*self.axes))
        A = jnp.asarray(A)
        assert A.ndim == 2
        self.data = jax.device_put(A, self.sharding)

    # -- basic properties ------------------------------------------------
    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    def _like(self, data):
        out = object.__new__(DistributedMatrix)
        out.mesh, out.axes, out.sharding = (self.mesh, self.axes,
                                            self.sharding)
        out.data = jax.device_put(data, self.sharding)
        return out

    def to_host(self):
        return np.asarray(self.data)

    # -- redistribution (p?gemr2d role) ----------------------------------
    def redistribute(self, mesh: Mesh | None = None, axes=None):
        """Move to another mesh/axis layout: ONE collective resharding
        (device_put with the target sharding), the p?gemr2d role."""
        return DistributedMatrix(self.data, mesh or self.mesh, axes)

    # -- elementwise (p?geadd / scale / axpby) ---------------------------
    def scale(self, alpha):
        return self._like(self.data * alpha)

    def add(self, B, alpha=1.0):
        """self + alpha * B (geadd role)."""
        Bd = B.data if isinstance(B, DistributedMatrix) else jnp.asarray(B)
        return self._like(self.data + alpha * Bd)

    def axpby(self, alpha, B, beta):
        Bd = B.data if isinstance(B, DistributedMatrix) else jnp.asarray(B)
        return self._like(alpha * self.data + beta * Bd)

    def transpose(self):
        return self._like(self.data.T)

    # -- norms (p?lange roles) -------------------------------------------
    def normF(self):
        return float(jnp.linalg.norm(self.data))

    def norm1(self):
        return float(jnp.abs(self.data).sum(axis=0).max())

    def normI(self):
        return float(jnp.abs(self.data).sum(axis=1).max())

    # -- gemm (p?gemm role) ----------------------------------------------
    def gemm(self, B, ta=False, tb=False, alpha=1.0, beta=0.0, C=None):
        """alpha * op(A) op(B) + beta * C as one GSPMD program."""
        Bd = B.data if isinstance(B, DistributedMatrix) else jnp.asarray(B)
        Cd = None if C is None else (
            C.data if isinstance(C, DistributedMatrix) else jnp.asarray(C))
        sh = self.sharding

        @partial(jax.jit, out_shardings=sh)
        def go(A, Bd, Cd):
            Ax = A.T if ta else A
            Bx = Bd.T if tb else Bd
            Y = alpha * jnp.matmul(Ax, Bx,
                                   preferred_element_type=A.dtype)
            if Cd is not None:
                Y = Y + beta * Cd
            return Y

        return self._like(go(self.data, Bd, Cd))

    # -- triangular solve (p?trsm role) ----------------------------------
    def trsm(self, B, lower=True, unit=False, left=True):
        """op(self)^-1 B (or B op(self)^-1) with self triangular."""
        Bd = B.data if isinstance(B, DistributedMatrix) else jnp.asarray(B)
        sh = self.sharding

        @partial(jax.jit, out_shardings=sh)
        def go(T, Bd):
            return jax.lax.linalg.triangular_solve(
                T, Bd, left_side=left, lower=lower, unit_diagonal=unit)

        return self._like(go(self.data, Bd))

    # -- row permutation (p?laswp role) ----------------------------------
    def laswp(self, perm, fwd=True):
        perm = jnp.asarray(perm)

        @partial(jax.jit, out_shardings=self.sharding)
        def go(A, perm):
            if fwd:
                return A[perm]
            inv = jnp.zeros_like(perm).at[perm].set(
                jnp.arange(perm.shape[0]))
            return A[inv]

        return self._like(go(self.data, perm))

    # -- LU (p?getrf / p?getrs roles) ------------------------------------
    def getrf(self, blk: int = 256, thresh: float = 0.0):
        """2D-sharded blocked LU with cross-panel partial pivoting
        (pgetrf role) via dist2d.sharded_blocked_lu_pivoted; returns
        (LU DistributedMatrix, perm) and caches them for solve()."""
        from .dist2d import sharded_blocked_lu_pivoted
        m = self.shape[0]
        blk = min(blk, m)
        while m % blk:           # largest divisor of m not above blk
            blk -= 1
        LU, perm = sharded_blocked_lu_pivoted(self.data, self.mesh,
                                              blk=blk, thresh=thresh)
        self._lu = (self._like(LU), perm, blk)
        return self._lu[0], perm

    def solve(self, b):
        """x = A^-1 b after getrf (p?getrs role)."""
        from .dist2d import sharded_lu_solve_pivoted
        if not hasattr(self, "_lu"):
            self.getrf()
        LU, perm, blk = self._lu
        squeeze = np.ndim(b) == 1
        bd = jnp.asarray(b)
        if squeeze:
            bd = bd[:, None]
        x = sharded_lu_solve_pivoted(LU.data, perm, bd, self.mesh,
                                     blk=blk)
        return x[:, 0] if squeeze else x

    # -- Cholesky (p?potrf role) -----------------------------------------
    def potrf(self):
        sh = self.sharding

        @partial(jax.jit, out_shardings=sh)
        def go(A):
            return jnp.linalg.cholesky(A)

        L = self._like(go(self.data))
        self._chol = L
        return L

    # -- sub-blocks (DistributedMatrix extraction/assignment roles) ------
    def extract(self, r0, r1, c0, c1):
        """Copy of rows [r0, r1) x cols [c0, c1) (extract_rows/cols
        role); stays 2D-sharded."""
        return self._like(jax.lax.slice(self.data, (r0, c0), (r1, c1)))

    def assign(self, r0, c0, B):
        Bd = B.data if isinstance(B, DistributedMatrix) else jnp.asarray(B)
        return self._like(
            jax.lax.dynamic_update_slice(self.data, Bd, (r0, c0)))
