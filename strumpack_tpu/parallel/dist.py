"""Multi-device execution of the level-batched multifrontal solver.

Role of the reference's distributed stack (EliminationTreeMPIDist
proportional mapping, FrontDenseMPI 2D block-cyclic fronts, ExtendAdd
alltoallv — SURVEY.md sections 2.12, 3.3) re-mapped onto a TPU mesh:

* the *batch axis of each level bucket* is sharded over the mesh's ``b``
  axis — the analog of proportional mapping of independent subtrees to
  ranks (all fronts of a level are independent tasks);
* the flat contribution-block buffer is kept replicated across ``b``; the
  extend-add gathers then compile to an all-gather of each level's CB
  parts — the analog of the reference's alltoallv extend-add, riding ICI;
* large top-level fronts (batch 1) are replicated in round 1; a 2D
  block-sharded panel LU over (``r``, ``c``) mesh axes is the planned
  upgrade (SURVEY.md section 7 step 6, "hardest kernel").

The returned step function is a single jit over the whole level loop, so
XLA sees one program and schedules collectives with compute.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..frontal.numeric import PlanDev, _ext_add_vec, _extend_add_blocks


def _blk_2d(s: int) -> int:
    for b in (512, 256, 128, 64, 32, 16, 8):
        if s % b == 0 and s // b >= 2:
            return b
    return s


def _shard_bucket(arr, mesh, nf):
    """Shard a [nf, ...] bucket tensor over the 'b' mesh axis when the
    batch divides evenly; replicate otherwise (top-of-tree buckets)."""
    nb = mesh.shape["b"]
    if nf % nb == 0 and nf >= nb:
        spec = P("b", *([None] * 1))
        return jax.lax.with_sharding_constraint(
            arr, NamedSharding(mesh, P(*(("b",) + (None,) * (arr.ndim - 1)))))
    return jax.lax.with_sharding_constraint(
        arr, NamedSharding(mesh, P(*((None,) * arr.ndim))))


def plan_arrays_for_mesh(pdev: PlanDev, mesh: Mesh):
    """The plan's index arrays as arrays usable under ``mesh``.  Single
    process: the PlanDev device copies.  Multi-process (multi-host — the
    reference's across-node MPI distribution, SURVEY.md 2.12): every
    process holds the same host plan, so the arrays are lifted to GLOBAL
    replicated arrays over the full mesh; XLA then lowers the program's
    collectives onto ICI within a host and DCN between hosts."""
    import jax
    if jax.process_count() == 1:
        return pdev.arrays
    from jax.experimental import multihost_utils
    host = {f"{li},{bi}": bd.host_arrays
            for li, lvl in enumerate(pdev.levels)
            for bi, bd in enumerate(lvl)}
    return jax.tree_util.tree_map(
        lambda a: multihost_utils.host_local_array_to_global_array(
            a, mesh, P()), host)


def to_global(x, mesh):
    """Replicate a host array onto every device of a (possibly multi-host)
    mesh; no-op wrapper in single-process mode."""
    import jax
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jnp.asarray(x)
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(x, mesh, P())


def make_sharded_factor_solve(pdev: PlanDev, mesh: Mesh, dtype=jnp.float32,
                              thresh: float = 0.0):
    """Build a jitted (Avals, b) -> x full factor+solve step with bucket
    batches sharded over mesh axis 'b'."""
    plan = pdev.plan
    n = plan.n
    arrays = plan_arrays_for_mesh(pdev, mesh)

    def step(Avals, b):
        Avals = Avals.astype(dtype)
        vals_ext = jnp.concatenate(
            [Avals, jnp.array([0.0, 1.0], dtype=dtype)])
        th = jnp.asarray(thresh, dtype=jnp.zeros((), dtype).real.dtype)

        lus, perms, L21s, U12s = {}, {}, {}, {}
        cb_list = []
        for li, level in enumerate(pdev.levels):
            parts = []
            for bi, bd in enumerate(level):
                bp = bd.bp
                a = arrays[f"{li},{bi}"]
                F = jnp.zeros((bp.nf, bp.p, bp.p), dtype=dtype)
                F = F.at[a["asm_bidx"], a["asm_r"], a["asm_c"]].add(
                    vals_ext[a["asm_vidx"]])
                F = _shard_bucket(F, mesh, bp.nf)
                # pairs-based extend-add (leading-axis block takes of the
                # replicated child CBs -> one-hot MXU matmuls); XLA turns
                # the sharded-F updates into the alltoallv-role collectives
                if bd.has_L:
                    F = _extend_add_blocks(F, cb_list, a["posL"],
                                           bd.pairsL, a)
                if bd.has_R:
                    F = _extend_add_blocks(F, cb_list, a["posR"],
                                           bd.pairsR, a)
                s = bp.s_pad
                use_2d = (bp.nf == 1 and bp.u_pad == 0 and "r" in
                          mesh.axis_names and "c" in mesh.axis_names
                          and s >= 2 * _blk_2d(s))
                if use_2d:
                    from .dist2d import sharded_blocked_lu
                    LU2, perms2 = sharded_blocked_lu(
                        F[0], mesh, _blk_2d(s), th)
                    lus[(li, bi)] = ("2d", LU2, perms2, _blk_2d(s))
                    parts.append(jnp.zeros((bp.nf, 0, 0), dtype))
                    continue
                lu, _, perm = jax.lax.linalg.lu(F[:, :s, :s])
                d = jnp.diagonal(lu, axis1=-2, axis2=-1)
                repl = jnp.where(jnp.abs(d) < th,
                                 jnp.where(d == 0, th, jnp.sign(d.real)
                                           .astype(d.dtype) * th), d)
                ii = jnp.arange(s)
                lu = lu.at[:, ii, ii].set(repl)
                F12 = jnp.take_along_axis(F[:, :s, s:], perm[:, :, None],
                                          axis=1)
                U12 = jax.lax.linalg.triangular_solve(
                    lu, F12, left_side=True, lower=True, unit_diagonal=True)
                L21 = jax.lax.linalg.triangular_solve(
                    lu, F[:, s:, :s], left_side=False, lower=False)
                CB = F[:, s:, s:] - jnp.matmul(
                    L21, U12, preferred_element_type=dtype)
                lus[(li, bi)] = lu
                perms[(li, bi)] = perm
                L21s[(li, bi)] = L21
                U12s[(li, bi)] = U12
                parts.append(jax.lax.with_sharding_constraint(
                    CB, NamedSharding(mesh, P(None, None, None))))
            cb_list = parts

        # ---- solve (single rhs) ----
        b1 = b.astype(dtype)[:, None]
        bext = jnp.concatenate([b1, jnp.zeros((1, 1), dtype)], axis=0)
        ys = {}
        cbv_list = []
        for li, level in enumerate(pdev.levels):
            parts = []
            for bi, bd in enumerate(level):
                bp = bd.bp
                a = arrays[f"{li},{bi}"]
                bloc = jnp.concatenate(
                    [bext[a["sep_glob"]],
                     jnp.zeros((bp.nf, bp.u_pad, 1), dtype)], axis=1)
                if bd.has_L:
                    bloc = _ext_add_vec(bloc, cbv_list, a["posL"],
                                        bd.pairsL, a)
                if bd.has_R:
                    bloc = _ext_add_vec(bloc, cbv_list, a["posR"],
                                        bd.pairsR, a)
                s = bp.s_pad
                entry = lus[(li, bi)]
                if isinstance(entry, tuple) and entry[0] == "2d":
                    ys[(li, bi)] = bloc[:, :s]   # solved in backward sweep
                    parts.append(jnp.zeros((bp.nf, 0, 1), dtype))
                    continue
                bsep = jnp.take_along_axis(bloc[:, :s],
                                           perms[(li, bi)][:, :, None], 1)
                y = jax.lax.linalg.triangular_solve(
                    entry, bsep, left_side=True, lower=True,
                    unit_diagonal=True)
                ys[(li, bi)] = y
                parts.append(bloc[:, s:] - jnp.matmul(
                    L21s[(li, bi)], y, preferred_element_type=dtype))
            cbv_list = parts

        xext = jnp.zeros((n + 1, 1), dtype)
        for li in range(len(pdev.levels) - 1, -1, -1):
            for bi, bd in enumerate(pdev.levels[li]):
                bp = bd.bp
                a = arrays[f"{li},{bi}"]
                xupd = xext[a["upd_glob"]]
                entry = lus[(li, bi)]
                if isinstance(entry, tuple) and entry[0] == "2d":
                    from .dist2d import sharded_lu_solve
                    _, LU2, perms2, blk = entry
                    xsep = sharded_lu_solve(LU2, perms2, ys[(li, bi)][0],
                                            mesh, blk)[None]
                else:
                    z = ys[(li, bi)] - jnp.matmul(
                        U12s[(li, bi)], xupd, preferred_element_type=dtype)
                    xsep = jax.lax.linalg.triangular_solve(
                        entry, z, left_side=True, lower=False)
                xext = xext.at[a["sep_glob"].reshape(-1)].set(
                    xsep.reshape(-1, 1))
                xext = xext.at[n].set(jnp.zeros((1,), dtype))
        return xext[:n, 0]

    repl = NamedSharding(mesh, P())
    return jax.jit(step, in_shardings=(repl, repl), out_shardings=repl)
