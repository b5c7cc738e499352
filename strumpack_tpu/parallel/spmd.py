"""SPMD multifrontal execution over a device mesh (shard_map design).

Round-2 redesign of the distributed path (VERDICT.md next-round items 2-3):
the round-1 `parallel/dist.py` routed every front through
``jax.lax.linalg.lu`` (the while-loop primitive measured at ~3.4 GF/s on
this platform, PERF.md) and replicated all child contribution blocks on
every device.  This module instead runs THE SAME numeric bucket kernels as
the single-chip path (Pallas fused/panel LU, loop-free trisolve, BLR tile
LU, HSS fronts — frontal/numeric.py) inside a ``jax.shard_map`` over the
mesh's front-batch axis ``b``:

* every bucket's fronts are partitioned contiguously over ``b`` (each
  device owns nf/nb fronts) — the proportional-mapping role of
  `EliminationTreeMPIDist.cpp:630-694`, here with PERFECT balance because
  all fronts of a bucket share one padded shape, so equal counts = equal
  modeled work (flops and memory are per-front constants);
* contribution blocks live SHARDED over ``b``; each level's extend-add
  all-gathers the child CB batch over ICI before the gather/Pallas
  scatter — the explicit-collective analog of the reference's alltoallv
  extend-add (`FrontMPI.cpp:60-119`, `ExtendAdd.cpp`);
* buckets too small to split (nf not divisible by nb — the top of the
  tree) are computed redundantly on every device (cheap by construction:
  the work model below confirms they are the tree's tail), except the ROOT
  front, which — when the mesh has (r, c) axes — is factored by the
  2D-sharded blocked LU of `dist2d.py` (the FrontDenseMPI /
  ScaLAPACK-pgetrf role) outside the shard_map region;
* the backward solve merges per-device scatter deltas with one psum per
  level (disjoint separator rows make add == set).

The whole factor+solve step is ONE jitted program: XLA schedules the
all-gathers with compute, and a 1-device mesh runs the identical kernels
as the non-mesh single-chip path.

Known limitation: no split-program mode under the mesh yet — plans far
above ~40 buckets (64^3-class) should use the single-chip split path or
the sharded Krylov drivers; the mesh step targets the per-front-
distributed regime.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..frontal import numeric
from ..frontal.numeric import PackedArrays


# ---------------------------------------------------------------------------
# work model (proportional-mapping role)
# ---------------------------------------------------------------------------

def bucket_flops(bp) -> float:
    """Analytic dense partial-factorization flops of one bucket (the
    FLOPS work model of EliminationTreeMPIDist.cpp:512-574)."""
    s, u, nf = bp.s_pad, bp.u_pad, bp.nf
    return nf * (2.0 / 3.0 * s ** 3 + 2.0 * s * s * u + 2.0 * s * u * u)


def bucket_bytes(bp, itemsize=4) -> float:
    """FACTOR_MEMORY work model: bytes of factors + CB held per bucket."""
    s, u, nf = bp.s_pad, bp.u_pad, bp.nf
    return nf * (s * s + 2 * s * u + u * u) * itemsize


def choose_modes(pdev, mesh, blk2d=None):
    """Per-bucket execution mode over the mesh: 'shard' (front batch split
    over 'b'), 'repl' (computed redundantly — the small top-of-tree tail),
    or '2d' (root front on the (r, c) grid).  Returns (modes, report)."""
    nb = int(mesh.shape.get("b", 1))
    has_rc = ("r" in mesh.axis_names and "c" in mesh.axis_names
              and mesh.shape["r"] * mesh.shape["c"] > 1)
    modes, total, repl_fl = {}, 0.0, 0.0
    nlev = len(pdev.levels)
    for li, lvl in enumerate(pdev.levels):
        for bi, bd in enumerate(lvl):
            bp = bd.bp
            fl = bucket_flops(bp)
            total += fl
            dense = not (bp.blr or bp.hss or bp.hodlr or bp.hodbf
                         or bp.hss_sample)
            if (has_rc and li == nlev - 1 and bp.nf == 1 and bp.u_pad == 0
                    and dense and bp.s_pad >= 2 * _blk_2d(bp.s_pad)):
                modes[(li, bi)] = "2d"
            elif nb > 1 and bp.nf % nb == 0 and bp.nf >= nb:
                modes[(li, bi)] = "shard"
            else:
                modes[(li, bi)] = "repl"
                repl_fl += fl
    report = {"total_flops": total, "replicated_flops": repl_fl,
              "replicated_frac": repl_fl / max(total, 1.0)}
    return modes, report


def _blk_2d(s: int) -> int:
    for b in (512, 256, 128, 64, 32, 16, 8):
        if s % b == 0 and s // b >= 2:
            return b
    return s


# ---------------------------------------------------------------------------
# sharded plan staging
# ---------------------------------------------------------------------------

class _BD:
    """Device-local BucketDev view (trace-time fields only)."""
    __slots__ = ("bp", "has_L", "has_R", "pairsL", "pairsR",
                 "umaxL", "umaxR")


def _shard_asm(arrs, nf, nb, zslot):
    """Partition the flat assembly index arrays by owning device and pad
    each device's chunk to a common length with no-op entries (value index
    -> the 0.0 slot of vals_ext, target F[0, 0, 0])."""
    nfl = nf // nb
    bidx, r, c, v = (np.asarray(arrs["asm_bidx"]), np.asarray(arrs["asm_r"]),
                     np.asarray(arrs["asm_c"]), np.asarray(arrs["asm_vidx"]))
    dev = bidx // nfl
    counts = np.bincount(dev, minlength=nb)
    K = max(int(counts.max(initial=0)), 1)
    ob = np.zeros((nb, K), bidx.dtype)
    orr = np.zeros((nb, K), r.dtype)
    oc = np.zeros((nb, K), c.dtype)
    ov = np.full((nb, K), zslot, v.dtype)
    for d in range(nb):
        sel = dev == d
        k = int(counts[d])
        ob[d, :k] = bidx[sel] - d * nfl
        orr[d, :k] = r[sel]
        oc[d, :k] = c[sel]
        ov[d, :k] = v[sel]
    return dict(asm_bidx=ob, asm_r=orr, asm_c=oc, asm_vidx=ov)


def _put_rows(host, nb, mesh):
    """Pack {key: {name: [nb, ...]}} into per-dtype [nb, L] blobs placed
    sharded over mesh axis 'b' (one row per device), plus the per-row
    layout consumed by PackedArrays inside the shard_map body."""
    blobs_parts, offsets, layout = {}, {}, {}
    for key, entry in host.items():
        lay = {}
        for name, arr in entry.items():
            arr = np.asarray(arr)
            assert arr.shape[0] == nb, (key, name, arr.shape)
            dt = arr.dtype.name
            flat = arr.reshape(nb, -1)
            off = offsets.get(dt, 0)
            blobs_parts.setdefault(dt, []).append(flat)
            offsets[dt] = off + flat.shape[1]
            lay[name] = (dt, off, arr.shape[1:])
        layout[key] = lay
    sharding = NamedSharding(mesh, P("b", None))
    blobs = {}
    for dt, parts in blobs_parts.items():
        b2 = np.concatenate(parts, axis=1)
        if jax.process_count() == 1:
            blobs[dt] = jax.device_put(b2, sharding)
        else:
            blobs[dt] = jax.make_array_from_callback(
                b2.shape, sharding, lambda idx, _b=b2: _b[idx])
    return blobs, layout


class ShardedPlan:
    """Host staging of a PlanDev for SPMD execution: per-device sliced
    bucket plans + index arrays packed into 'b'-sharded row blobs."""

    def __init__(self, pdev, mesh):
        self.pdev = pdev
        self.nb = int(mesh.shape.get("b", 1))
        self.modes, self.report = choose_modes(pdev, mesh)
        nb = self.nb
        zslot = pdev.plan.nnz
        self.levels = []           # local _BD clones (body trace view)
        self.body_levels = []      # level indices handled inside shard_map
        self.root2d = []           # [(li, bi)] of 2D-grid fronts
        host = {}
        for li, lvl in enumerate(pdev.levels):
            row = []
            body_any = False
            for bi, bd in enumerate(lvl):
                mode = self.modes[(li, bi)]
                if mode == "2d":
                    self.root2d.append((li, bi))
                    row.append(None)
                    continue
                body_any = True
                bp = bd.bp
                nf = bp.nf
                c = _BD()
                c.has_L, c.has_R = bd.has_L, bd.has_R
                c.pairsL, c.pairsR = bd.pairsL, bd.pairsR
                c.umaxL, c.umaxR = bd.umaxL, bd.umaxR
                arrs = dict(bd.host_arrays)
                if mode == "shard":
                    nfl = nf // nb
                    st = _shard_asm(arrs, nf, nb, zslot)
                    for k, v in arrs.items():
                        if k.startswith("asm_"):
                            continue
                        v = np.asarray(v)
                        if v.ndim >= 1 and v.shape[0] == nf:
                            st[k] = v.reshape((nb, nfl) + v.shape[1:])
                        else:
                            st[k] = np.broadcast_to(
                                v, (nb,) + v.shape).copy()
                    c.bp = dataclasses.replace(
                        bp, fronts=bp.fronts[:min(nfl, len(bp.fronts))],
                        ds=bp.ds[:nfl], du=bp.du[:nfl])
                else:  # repl: every device gets the full bucket
                    st = {k: np.broadcast_to(
                        np.asarray(v), (nb,) + np.asarray(v).shape).copy()
                        for k, v in arrs.items()}
                    c.bp = bp
                host[f"{li},{bi}"] = st
                row.append(c)
            self.levels.append(row)
            if body_any:
                self.body_levels.append(li)
        self.blobs, self.layout = _put_rows(host, nb, mesh)

    def gather(self, li, bi, cb):
        """Child-CB fetch collective: all-gather sharded buckets' CB batch
        over 'b' (the alltoallv-role); replicated buckets are full."""
        if self.modes[(li, bi)] == "shard" and self.nb > 1:
            return jax.lax.all_gather(cb, "b", axis=0, tiled=True)
        return cb

    def acc(self, local_blobs):
        """PackedArrays view over one device's blob rows ([1, L] each)."""
        return PackedArrays(
            {dt: b.reshape(-1) for dt, b in local_blobs.items()},
            self.layout)


# ---------------------------------------------------------------------------
# the factor+solve step
# ---------------------------------------------------------------------------

def make_sharded_factor_solve(pdev, mesh: Mesh, dtype=jnp.float32,
                              thresh: float = 0.0, hss_tol=1e-4,
                              blr_tol=1e-4):
    """Build a jitted (Avals, b) -> x full factor+solve step over ``mesh``
    (axes: 'b' front batch; optional 'r','c' 2D grid for the root front).
    b may be [n] or [n, nrhs]."""
    sp = ShardedPlan(pdev, mesh)
    plan = pdev.plan
    n = plan.n
    nb = sp.nb
    rdt = jnp.real(jnp.zeros((), dtype)).dtype
    th = jnp.asarray(thresh, rdt)
    tol = jnp.asarray(blr_tol, rdt)
    bl = sp.body_levels
    # replicated (global) arrays for the 2D root part
    from .dist import plan_arrays_for_mesh
    arrays_g = plan_arrays_for_mesh(pdev, mesh) if sp.root2d else None

    smap = partial(jax.shard_map, mesh=mesh, check_vma=False)

    def factor_body(blobs, Avals, th, tol):
        a = sp.acc(blobs)
        vals_ext = jnp.concatenate(
            [Avals, jnp.array([0.0, 1.0], dtype=dtype)])
        out = {"lu": {}, "perm": {}, "L21": {}, "U12": {}, "blr": {},
               "blr_ranks": {}, "hss": {}}
        cb_loc, cb_full = [], []
        for li in bl:
            # positional placeholders keep child-bucket indexing (the
            # extend-add pairs' bk) aligned when a 2D root shares a level
            parts = [jnp.zeros((1, 0, 0), dtype) if bd is None else
                     numeric._bucket_factor_step(
                         li, bi, bd, a[f"{li},{bi}"], vals_ext, cb_full,
                         th, tol, False, hss_tol, out)
                     for bi, bd in enumerate(sp.levels[li])]
            cb_loc = parts
            cb_full = [sp.gather(li, bi, cb)
                       for bi, cb in enumerate(parts)]
        return out, cb_loc

    def fwd_body(blobs, tree, bext):
        a = sp.acc(blobs)
        nrhs = bext.shape[1]
        ys = {}
        cbv_loc, cbv_full = [], []
        for li in bl:
            parts = []
            for bi, bd in enumerate(sp.levels[li]):
                if bd is None:
                    parts.append(jnp.zeros((1, 0, nrhs), dtype))
                    continue
                y, cbv = numeric._bucket_fwd_step(
                    li, bi, bd, a[f"{li},{bi}"], tree, bext, cbv_full)
                ys[f"{li},{bi}"] = y
                parts.append(cbv)
            cbv_loc = parts
            cbv_full = [sp.gather(li, bi, cbv)
                        for bi, cbv in enumerate(parts)]
        return ys, cbv_loc

    def bwd_body(blobs, tree, ys, xext):
        a = sp.acc(blobs)
        me = jax.lax.axis_index("b")
        nrhs = xext.shape[1]
        for li in reversed(bl):
            tot = None
            for bi, bd in enumerate(sp.levels[li]):
                if bd is None:
                    continue
                d = numeric._bucket_bwd_step(
                    li, bi, bd, a[f"{li},{bi}"], tree,
                    ys[f"{li},{bi}"], xext, delta=True)
                if sp.modes[(li, bi)] != "shard":
                    # replicated bucket: count one device's copy only
                    d = jnp.where(me == 0, d, jnp.zeros_like(d))
                tot = d if tot is None else tot + d
            if tot is not None:
                xext = xext + jax.lax.psum(tot, "b")
                xext = xext.at[n].set(jnp.zeros((nrhs,), xext.dtype))
        return xext[:n][None]

    def step(blobs, arrays_g, Avals, b):
        Avals = Avals.astype(dtype)
        squeeze = b.ndim == 1
        b2 = b.astype(dtype)
        if squeeze:
            b2 = b2[:, None]
        nrhs = b2.shape[1]

        tree, cb_loc = smap(
            factor_body,
            in_specs=(P("b"), P(), P(), P()),
            out_specs=P("b"))(blobs, Avals, th, tol)

        root = {}
        if sp.root2d:
            vals_ext = jnp.concatenate(
                [Avals, jnp.array([0.0, 1.0], dtype=dtype)])
            for (li, bi) in sp.root2d:
                bd = pdev.levels[li][bi]
                bp = bd.bp
                ag = arrays_g[f"{li},{bi}"]
                F = jnp.zeros((1, bp.p, bp.p), dtype=dtype)
                F = F.at[ag["asm_bidx"], ag["asm_r"], ag["asm_c"]].add(
                    vals_ext[ag["asm_vidx"]])
                if bd.has_L:
                    F = numeric._extend_add_blocks(
                        F, cb_loc, ag["posL"], bd.pairsL, ag,
                        pallas_ok=(nb == 1))
                if bd.has_R:
                    F = numeric._extend_add_blocks(
                        F, cb_loc, ag["posR"], bd.pairsR, ag,
                        pallas_ok=(nb == 1))
                blk = _blk_2d(bp.s_pad)
                from .dist2d import sharded_blocked_lu_pivoted
                LU2, perms2 = sharded_blocked_lu_pivoted(F[0], mesh, blk,
                                                         th)
                root[(li, bi)] = (LU2, perms2, blk)

        bext = jnp.concatenate([b2, jnp.zeros((1, nrhs), dtype)], axis=0)
        ys, cbv_loc = smap(
            fwd_body,
            in_specs=(P("b"), P("b"), P()),
            out_specs=P("b"))(blobs, tree, bext)

        xext = jnp.zeros((n + 1, nrhs), dtype)
        for (li, bi), (LU2, perms2, blk) in root.items():
            from .dist2d import sharded_lu_solve_pivoted as \
                sharded_lu_solve
            bd = pdev.levels[li][bi]
            ag = arrays_g[f"{li},{bi}"]
            bloc = bext[ag["sep_glob"]]          # [1, s_pad, nrhs]
            if bd.has_L:
                bloc = numeric._ext_add_vec(bloc, cbv_loc, ag["posL"],
                                            bd.pairsL, ag)
            if bd.has_R:
                bloc = numeric._ext_add_vec(bloc, cbv_loc, ag["posR"],
                                            bd.pairsR, ag)
            xsep = sharded_lu_solve(LU2, perms2, bloc[0], mesh, blk)
            xext = xext.at[ag["sep_glob"].reshape(-1)].set(
                xsep.reshape(-1, nrhs))
            xext = xext.at[n].set(jnp.zeros((nrhs,), dtype))

        xs = smap(
            bwd_body,
            in_specs=(P("b"), P("b"), P("b"), P()),
            out_specs=P("b"))(blobs, tree, ys, xext)
        x = xs[0]
        return x[:, 0] if squeeze else x

    repl = NamedSharding(mesh, P())
    # mesh-global arrays (blobs, plan arrays) must be jit ARGUMENTS, not
    # closure constants: multi-process global jax.Arrays cannot be closed
    # over (they span non-addressable devices)
    jf = jax.jit(step, in_shardings=(None, None, repl, repl),
                 out_shardings=repl)

    def run(Avals, b):
        return jf(sp.blobs, arrays_g if arrays_g is not None else {},
                  Avals, b)

    return run
