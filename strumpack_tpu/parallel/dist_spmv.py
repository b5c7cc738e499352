"""Block-row distributed sparse matrix with HALO-EXCHANGE spmv.

Role of the reference's ``CSRMatrixMPI`` (sparse/CSRMatrixMPI.hpp:72-262:
block-row partition, split diagonal/off-diagonal storage, persistent spmv
buffers with point-to-point halo exchange :239-240).  The round-2 sharded
spmv relied on GSPMD resharding the whole x vector (an all-gather —
O(n) bytes per device per spmv); this class is the explicit-collective
analog of the reference's design:

* rows partitioned contiguously over the mesh axis; each device stores
  its block split into a DIAGONAL part (columns it owns, local indices)
  and an OFF-DIAGONAL part (columns owned by others) — both padded ELL;
* a static halo plan: for every (src -> dst) device pair, the src-local
  x entries dst's off-diagonal block reads, padded to the global max
  count K — the persistent-buffer role;
* spmv under ``shard_map``: each device gathers its send rows, ONE
  ``lax.all_to_all`` moves the halos (the alltoallv role, O(boundary)
  bytes, riding ICI), then two padded-ELL products accumulate
  y = D x_loc + O x_halo on the VPU.

For a 3D stencil block-row partition the halo is O(n^(2/3)) per device,
so spmv communication drops from O(n) to the surface terms.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _build_ell_local(rows_r, cols_l, vidx, nrows, width_pad, zcol, znnz):
    """COO (local row, local col, value idx) -> padded ELL."""
    order = np.lexsort((cols_l, rows_r))
    r, c, v = rows_r[order], cols_l[order], vidx[order]
    counts = np.bincount(r, minlength=nrows)
    w = max(int(counts.max(initial=0)), 1)
    w = max(w, width_pad)
    off = np.zeros(nrows + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    k = np.arange(len(r)) - off[r]
    cols = np.full((nrows, w), zcol, np.int32)
    vv = np.full((nrows, w), znnz, np.int32)
    cols[r, k] = c
    vv[r, k] = v
    return cols, vv


def _make_mv(mesh: Mesh, axes: tuple, nd: int, nb: int, n: int,
             replicate_out=False):
    """The jitted halo-exchange spmv program.  ``axes`` is the tuple of
    mesh axis names the rows shard over (jointly, axis-major device
    order); one ``lax.all_to_all`` over those axes moves the halos."""
    spec = P(axes)

    @partial(jax.jit, out_shardings=(NamedSharding(mesh, P())
                                     if replicate_out else None))
    def _mv(dvals, ovals, dcols, ocols, sendidx, x):
        xp = jnp.zeros((nd * nb,), x.dtype).at[:n].set(x)
        xp = jax.lax.with_sharding_constraint(
            xp, NamedSharding(mesh, spec))

        def body(dv, ov, dc, oc, si, xl):
            xl = xl.reshape(-1)                       # [nb]
            xle = jnp.concatenate([xl, jnp.zeros((1,), xl.dtype)])
            sendbuf = xle[jnp.minimum(si[0], nb)]     # [nd, K]
            halo = jax.lax.all_to_all(sendbuf, axes, 0, 0)
            haloe = jnp.concatenate(
                [halo.reshape(-1), jnp.zeros((1,), xl.dtype)])
            y = jnp.einsum("rw,rw->r", dv[0], xle[dc[0]])
            y = y + jnp.einsum("rw,rw->r", ov[0], haloe[oc[0]])
            return y[None]

        y = jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec, spec, spec, spec, spec, spec),
            out_specs=spec, check_vma=False)(
            dvals, ovals, dcols, ocols, sendidx, xp)
        return y.reshape(-1)[:n]

    return _mv


class DistCSR:
    """Halo-exchange block-row distributed CSR over one mesh axis."""

    def __init__(self, A, mesh: Mesh, axis: str = "b", dtype=None):
        self.mesh = mesh
        self.axis = axis
        nd = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        assert mesh.shape[axis] == nd, "use a 1D mesh for DistCSR"
        n = A.n
        nb = -(-n // nd)
        self.n, self.nd, self.nb = n, nd, nb
        rowptr, colind = np.asarray(A.rowptr), np.asarray(A.colind)
        dt = np.float32 if dtype is None else np.dtype(dtype)

        dcols, dvidx, ocols, ovidx = [], [], [], []
        halo_lists = [[None] * nd for _ in range(nd)]  # [dst][src]
        wdi = wof = 1
        per_dev = []
        for d in range(nd):
            lo, hi = d * nb, min((d + 1) * nb, n)
            p0, p1 = rowptr[lo], rowptr[hi]
            rr = np.repeat(np.arange(hi - lo, dtype=np.int64),
                           np.diff(rowptr[lo:hi + 1]))
            cc = colind[p0:p1].astype(np.int64)
            vv = np.arange(p0, p1, dtype=np.int64)
            own = (cc >= lo) & (cc < hi)
            per_dev.append((rr, cc, vv, own, lo))
            # halo columns grouped by owner
            hc = np.unique(cc[~own])
            for s in range(nd):
                sl, sh = s * nb, min((s + 1) * nb, n)
                halo_lists[d][s] = hc[(hc >= sl) & (hc < sh)] - sl
        K = max((len(h) for row in halo_lists for h in row), default=0)
        K = max(K, 1)
        self.halo_K = K

        send = np.zeros((nd, nd, K), np.int32)   # [src, dst, K] src-local
        for d in range(nd):
            for s in range(nd):
                h = halo_lists[d][s]
                send[s, d, :len(h)] = h
        # halo slot of a global column (per dst device)
        halo_slot = []
        for d in range(nd):
            m = {}
            for s in range(nd):
                for j, c in enumerate(halo_lists[d][s]):
                    m[int(s * nb + c)] = s * K + j
            halo_slot.append(m)

        for d in range(nd):
            rr, cc, vv, own, lo = per_dev[d]
            dc, dv = _build_ell_local(rr[own], (cc[own] - lo).astype(np.int64),
                                      vv[own], nb, 1, nb, A.nnz)
            slots = np.asarray([halo_slot[d][int(c)] for c in cc[~own]],
                               np.int64)
            oc, ov = _build_ell_local(rr[~own], slots, vv[~own], nb, 1,
                                      nd * K, A.nnz)
            dcols.append(dc); dvidx.append(dv)
            ocols.append(oc); ovidx.append(ov)
            wdi = max(wdi, dc.shape[1])
            wof = max(wof, oc.shape[1])

        def stack(parts, w, fill):
            out = np.full((nd, nb, w), fill, np.int32)
            for d, pt in enumerate(parts):
                out[d, :, :pt.shape[1]] = pt
            return out

        sharding = NamedSharding(mesh, P(axis))
        self.dcols = jax.device_put(stack(dcols, wdi, nb), sharding)
        self.dvidx = jax.device_put(stack(dvidx, wdi, A.nnz), sharding)
        self.ocols = jax.device_put(stack(ocols, wof, nd * K), sharding)
        self.ovidx = jax.device_put(stack(ovidx, wof, A.nnz), sharding)
        self.sendidx = jax.device_put(send, sharding)
        self._nnz = A.nnz
        self._local = False
        self.set_values(A.data.astype(dt))
        self._mv = _make_mv(mesh, (axis,), nd, nb, n)
        self._mv_repl = None

    # -- fully-distributed construction (no global CSR anywhere) --------
    @classmethod
    def from_local_block(cls, begin_row, local_rowptr, local_colind,
                         local_vals, n, mesh: Mesh, dtype=None):
        """Build the halo-exchange DistCSR from each process's contiguous
        block of rows WITHOUT ever assembling the global pattern or
        values (``CSRMatrixMPI`` constructor role, CSRMatrixMPI.hpp:72 —
        the reference likewise builds split diag/offdiag storage and the
        spmv graph from the local block plus point-to-point exchanges).

        Row blocks are re-partitioned to the device-block boundaries via
        one host alltoallv (bounded: each row moves once), halo lists are
        exchanged pairwise, and the sharded jax arrays are created with
        ``make_array_from_single_device_arrays`` — every process only
        ever touches its own devices' shards.  Rows shard jointly over
        ALL mesh axes (axis-major device order)."""
        import jax as _jax
        from . import p2p
        self = object.__new__(cls)
        axes = tuple(mesh.axis_names)
        devflat = mesh.devices.flatten()
        nd = int(devflat.size)
        nb = -(-n // nd)
        self.mesh, self.axes = mesh, axes
        self.n, self.nd, self.nb = n, nd, nb
        nproc = _jax.process_count()
        pid = _jax.process_index()
        owner = [int(d.process_index) for d in devflat]
        my_devs = [d for d in range(nd) if owner[d] == pid]
        dt = np.float64 if dtype is None else np.dtype(dtype)

        lrp = np.asarray(local_rowptr, np.int64)
        lci = np.asarray(local_colind, np.int64)
        lv = np.asarray(local_vals)
        begin = int(begin_row)
        nloc = len(lrp) - 1
        counts_loc = np.diff(lrp)

        # --- route rows to their device-owner processes ---------------
        send = {q: [] for q in range(nproc)}
        send_plan = []              # (q, d, nnz_lo, nnz_hi) value routing
        for d in range(nd):
            lo, hi = d * nb, min((d + 1) * nb, n)
            a, bnd = max(lo, begin), min(hi, begin + nloc)
            if a >= bnd:
                continue
            i0, i1 = a - begin, bnd - begin
            p0, p1 = int(lrp[i0]), int(lrp[i1])
            q = owner[d]
            send[q].append((d, a, counts_loc[i0:i1], lci[p0:p1],
                            lv[p0:p1]))
            send_plan.append((q, d, p0, p1))
        self._send_plan = send_plan
        recv = p2p.alltoallv({q: v for q, v in send.items() if v})

        dev_rows = {}
        for src, items in recv.items():
            for (d, a, cnts, cols, vals) in items:
                dev_rows.setdefault(d, []).append((a, cnts, cols, vals,
                                                   src))
        # per-device CSR fragments in global row order; remember the
        # (src, nnz) segment order so set_local_values can re-route
        recv_plan = {}
        dev_csr = {}
        for d in my_devs:
            lo, hi = d * nb, min((d + 1) * nb, n)
            parts = sorted(dev_rows.get(d, []), key=lambda t: t[0])
            counts_d = np.zeros(nb, np.int64)
            cols_l, vals_l, plan = [], [], []
            for (a, cnts, cols, vals, src) in parts:
                counts_d[a - lo:a - lo + len(cnts)] = cnts
                cols_l.append(cols)
                vals_l.append(vals)
                plan.append((src, a, len(cols)))
            cc = (np.concatenate(cols_l) if cols_l
                  else np.zeros(0, np.int64))
            vv = (np.concatenate(vals_l) if vals_l
                  else np.zeros(0, dt))
            recv_plan[d] = plan
            dev_csr[d] = (counts_d, cc, vv)
        self._recv_plan = recv_plan

        # --- pool size / halo lists (local), then global maxima --------
        halo_mine = {}              # d -> {s: src-local halo indices}
        lmax = 0
        for d in my_devs:
            counts_d, cc, vv = dev_csr[d]
            lmax = max(lmax, len(vv))
            lo, hi = d * nb, min((d + 1) * nb, n)
            own = (cc >= lo) & (cc < hi)
            hc = np.unique(cc[~own])
            halo_mine[d] = {}
            for s in range(nd):
                sl, sh = s * nb, min((s + 1) * nb, n)
                h = hc[(hc >= sl) & (hc < sh)] - sl
                if len(h):
                    halo_mine[d][s] = h
        kmax = max((len(h) for hm in halo_mine.values()
                    for h in hm.values()), default=0)
        from jax.experimental import multihost_utils as mh
        if nproc > 1:
            gm = np.asarray(mh.process_allgather(
                np.asarray([lmax, kmax], np.int64))).reshape(-1, 2)
            lmax, kmax = int(gm[:, 0].max()), int(gm[:, 1].max())
        L = max(lmax, 1)
        K = max(kmax, 1)
        self.halo_K = K
        self._L = L

        # --- exchange halo lists with the source-owner processes -------
        halo_out = {q: [] for q in range(nproc)}
        for d, hm in halo_mine.items():
            for s, h in hm.items():
                halo_out[owner[s]].append((s, d, h))
        got = p2p.alltoallv({q: v for q, v in halo_out.items() if v})
        send_rows = {s: np.zeros((nd, K), np.int32) for s in my_devs}
        for src, items in got.items():
            for (s, d, h) in items:
                send_rows[s][d, :len(h)] = h

        # --- per-device ELL blocks (widths globally padded) ------------
        wdi = wof = 1
        ells = {}
        for d in my_devs:
            counts_d, cc, vv = dev_csr[d]
            lo, hi = d * nb, min((d + 1) * nb, n)
            off = np.zeros(nb + 1, np.int64)
            np.cumsum(counts_d, out=off[1:])
            rr = np.repeat(np.arange(nb, dtype=np.int64), counts_d)
            vidx = np.arange(len(cc), dtype=np.int64)
            own = (cc >= lo) & (cc < hi)
            dc, dv = _build_ell_local(rr[own],
                                      (cc[own] - lo).astype(np.int64),
                                      vidx[own], nb, 1, nb, L)
            slot = {}
            for s, h in halo_mine[d].items():
                for j, c in enumerate(h):
                    slot[int(s * nb + c)] = s * K + j
            slots = np.asarray([slot[int(c)] for c in cc[~own]], np.int64)
            oc, ov = _build_ell_local(rr[~own], slots, vidx[~own], nb, 1,
                                      nd * K, L)
            ells[d] = (dc, dv, oc, ov)
            wdi = max(wdi, dc.shape[1])
            wof = max(wof, oc.shape[1])
        if nproc > 1:
            gw = np.asarray(mh.process_allgather(
                np.asarray([wdi, wof], np.int64))).reshape(-1, 2)
            wdi, wof = int(gw[:, 0].max()), int(gw[:, 1].max())

        def padw(a, w, fill):
            out = np.full((1, a.shape[0], w), fill, np.int32)
            out[0, :, :a.shape[1]] = a
            return out

        hd, hv, ho, hov = {}, {}, {}, {}
        for d in my_devs:
            dc, dv, oc, ov = ells[d]
            hd[d] = padw(dc, wdi, nb)
            hv[d] = padw(dv, wdi, L)
            ho[d] = padw(oc, wof, nd * K)
            hov[d] = padw(ov, wof, L)
        self._h_dvidx, self._h_ovidx = hv, hov
        self._pools = {d: dev_csr[d][2] for d in my_devs}
        self._my_devs = my_devs
        self._pid, self._nproc = pid, nproc

        shard = NamedSharding(mesh, P(axes))
        self._shard = shard

        def mk(gshape, payloads):
            arrs = []
            for dev, idx in shard.devices_indices_map(gshape).items():
                if dev.process_index != pid:
                    continue
                d = idx[0].start if idx[0].start is not None else 0
                arrs.append(_jax.device_put(payloads[d], dev))
            return _jax.make_array_from_single_device_arrays(
                gshape, shard, arrs)

        self._mk = mk
        self.dcols = mk((nd, nb, wdi), hd)
        self.ocols = mk((nd, nb, wof), ho)
        self.sendidx = mk((nd, nd, K),
                          {d: send_rows[d][None] for d in my_devs})
        self._dt = dt
        self._local = True
        self._stage_local_vals()
        self._mv = _make_mv(mesh, axes, nd, nb, n)
        self._mv_repl = None
        return self

    def _stage_local_vals(self):
        """(Re)build dvals/ovals from the per-device value pools."""
        nd, nb, L = self.nd, self.nb, self._L
        hd, ho = {}, {}
        for d in self._my_devs:
            ext = np.zeros(L + 1, self._dt)
            pool = self._pools[d]
            ext[:len(pool)] = pool.astype(self._dt)
            hd[d] = ext[np.asarray(self._h_dvidx[d])]
            ho[d] = ext[np.asarray(self._h_ovidx[d])]
        wdi = self._h_dvidx[self._my_devs[0]].shape[2] \
            if self._my_devs else 1
        wof = self._h_ovidx[self._my_devs[0]].shape[2] \
            if self._my_devs else 1
        self.dvals = self._mk((nd, nb, wdi), hd)
        self.ovals = self._mk((nd, nb, wof), ho)

    def set_local_values(self, local_vals):
        """New values, same pattern, from each process's original block
        rows (collective: re-routes the value segments along the
        construction-time plan)."""
        from . import p2p
        lv = np.asarray(local_vals)
        out = {}
        for (q, d, p0, p1) in self._send_plan:
            out.setdefault(q, []).append((d, self._pid, lv[p0:p1]))
        got = p2p.alltoallv(out)
        segs = {}      # d -> {src: vals}
        for src, items in got.items():
            for (d, sp, vals) in items:
                segs.setdefault(d, {})[sp] = vals
        for d in self._my_devs:
            parts = [segs[d][src] for (src, a, ln) in self._recv_plan[d]]
            self._pools[d] = (np.concatenate(parts) if parts
                              else np.zeros(0, self._dt))
        self._stage_local_vals()

    def set_values(self, data):
        """New values, same pattern (update_matrix_values role)."""
        assert not self._local, "use set_local_values"
        ext = np.concatenate([np.asarray(data),
                              np.zeros((1,), np.asarray(data).dtype)])
        sharding = NamedSharding(self.mesh, P(self.axis))
        self.dvals = jax.device_put(ext[np.asarray(self.dvidx)], sharding)
        self.ovals = jax.device_put(ext[np.asarray(self.ovidx)], sharding)

    def spmv(self, x):
        return self._mv(self.dvals, self.ovals, self.dcols, self.ocols,
                        self.sendidx, jnp.asarray(x))

    def spmv_host(self, x):
        """Host-vector spmv: lifts a replicated host x onto the mesh,
        runs the halo-exchange product, returns a host np array (the
        outer-Krylov building block for the fully-distributed driver)."""
        import jax as _jax
        if self._mv_repl is None:
            axes = self.axes if self._local else (self.axis,)
            self._mv_repl = _make_mv(self.mesh, axes, self.nd, self.nb,
                                     self.n, replicate_out=True)
        if _jax.process_count() == 1:
            y = self._mv_repl(self.dvals, self.ovals, self.dcols,
                              self.ocols, self.sendidx, jnp.asarray(x))
            return np.asarray(y)
        from jax.experimental import multihost_utils as mh
        xg = mh.host_local_array_to_global_array(np.asarray(x),
                                                 self.mesh, P())
        y = self._mv_repl(self.dvals, self.ovals, self.dcols,
                          self.ocols, self.sendidx, xg)
        return np.asarray(mh.global_array_to_host_local_array(
            y, self.mesh, P()))
