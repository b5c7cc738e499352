"""Distributed sparse solver driver over a jax mesh.

Role of the reference's ``SparseSolverMPIDist``
(StrumpackSparseSolverMPIDist.hpp:71 / SparseSolverMPIDist.cpp: the fully
distributed driver with block-row input, distributed reordering, and the
same reorder→factor→solve surface).  TPU-native mapping:

* the host does the symbolic phase exactly like the single-chip driver
  (the reference's distributed symbolic phase exists because no single MPI
  rank can hold the matrix; on a TPU host the planning data fits and the
  *numeric* phases are what shard);
* factorization/solve run under the mesh: level buckets shard over axis
  ``b`` (proportional-mapping role), 2D root LU over (``r``, ``c``) when
  present, outer Krylov via the sharded IR/GMRES loops (allreduce role).
"""
from __future__ import annotations

import numpy as np

from ..options import KrylovSolver, SPOptions
from ..solver import SparseSolver
from ..utils.params import ReturnCode


class DistributedSparseSolver(SparseSolver):
    """SparseSolver variant executing the numeric phases over a mesh.

    mesh axes: 'b' (front-batch, required); optional 'r', 'c' for the
    2D-sharded root-front LU.
    """

    def __init__(self, mesh, opts: SPOptions | None = None, verbose=None):
        super().__init__(opts, verbose)
        self.mesh = mesh
        self._step = None

    def factor(self) -> ReturnCode:
        # numeric factorization happens fused with the solve step under the
        # mesh (the sharded program factors + solves in one dispatch); here
        # we only ensure the plan exists
        if self.A is None:
            return ReturnCode.MATRIX_NOT_SET
        if not self._reordered:
            rc = self.reorder()
            if rc != ReturnCode.SUCCESS:
                return rc
        return ReturnCode.SUCCESS

    def solve(self, b, x0=None):
        import jax
        import jax.numpy as jnp
        if self.A is None:
            return None, ReturnCode.MATRIX_NOT_SET
        rc = self.factor()
        if rc != ReturnCode.SUCCESS:
            return None, rc
        opts = self.opts
        fd = jnp.dtype(opts.factor_dtype)
        bp = self._transform_b(b)

        solver = opts.krylov_solver
        if solver == KrylovSolver.AUTO:
            solver = KrylovSolver.REFINE

        from ..frontal import numeric
        if solver == KrylovSolver.DIRECT:
            from .dist import (from_global, make_sharded_factor_solve,
                               to_global)
            if self._step is None:
                eps = np.finfo(np.dtype(opts.factor_dtype)).eps
                thresh = (np.sqrt(eps) * self.Ap.norm1()
                          if opts.replace_tiny_pivots else 0.0)
                self._step = make_sharded_factor_solve(
                    self.pdev, self.mesh, dtype=fd, thresh=thresh)
            # full-f32 matmul precision: TPU's default bf16 matmuls degrade
            # the direct residual to ~1e-3 (PERF.md); precision is baked at
            # trace time, so the context must wrap the jitted call
            with self.mesh, jax.default_matmul_precision(
                    opts.matmul_precision):
                # to_global lifts the (replicated) inputs onto the full
                # mesh — in multi-process mode that is what makes the same
                # program run across hosts (DCN between, ICI within)
                xp = from_global(self._step(
                    to_global(np.asarray(self.Ap.data, dtype=fd), self.mesh),
                    to_global(np.asarray(bp, dtype=fd), self.mesh)),
                    self.mesh)
            self.its = 1
            return self._transform_x(xp), ReturnCode.SUCCESS

        # Krylov: factor once (sharded buckets execute under the mesh via
        # the standard whole-phase program), then a sharded outer loop
        with self.mesh:
            fac = numeric.factorize(
                self.pdev, self.Ap.data, dtype=np.dtype(opts.factor_dtype),
                blr_tol=opts.blr.rel_tol, spd=opts.positive_definite,
                hss_tol=opts.hss.rel_tol,
                matmul_precision=opts.matmul_precision)
            from .krylov_dist import (make_sharded_bicgstab,
                                      make_sharded_gmres, make_sharded_ir)
            rd = jnp.dtype(opts.refine_dtype)
            bdev = jnp.asarray(bp, dtype=rd)
            if solver in (KrylovSolver.PREC_GMRES, KrylovSolver.GMRES):
                fn = make_sharded_gmres(self.pdev, self.mesh, opts.rel_tol,
                                        opts.abs_tol, opts.maxit,
                                        opts.gmres_restart)
            elif solver in (KrylovSolver.PREC_BICGSTAB,
                            KrylovSolver.BICGSTAB):
                fn = make_sharded_bicgstab(self.pdev, self.mesh,
                                           opts.rel_tol, opts.abs_tol,
                                           opts.maxit)
            else:
                fn = make_sharded_ir(self.pdev, self.mesh, opts.rel_tol,
                                     opts.abs_tol, opts.maxit)
            with jax.default_matmul_precision(opts.matmul_precision):
                x, it, rel = fn(fac.tree, self.ell.vals, self.ell.cols,
                                bdev)
            xp = np.asarray(x)
        self.its = int(it)
        self.achieved_rtol = float(rel)
        rc = (ReturnCode.SUCCESS if self.its < opts.maxit
              or self.achieved_rtol <= opts.rel_tol
              else ReturnCode.NO_CONVERGENCE)
        return self._transform_x(xp), rc
