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
        self.set_values(A.data.astype(dt))

        @partial(jax.jit)
        def _mv(dvals, ovals, dcols, ocols, sendidx, x):
            xp = jnp.zeros((nd * nb,), x.dtype).at[:n].set(x)
            xp = jax.lax.with_sharding_constraint(
                xp, NamedSharding(mesh, P(axis)))

            def body(dv, ov, dc, oc, si, xl):
                xl = xl.reshape(-1)                       # [nb]
                xle = jnp.concatenate([xl, jnp.zeros((1,), xl.dtype)])
                sendbuf = xle[jnp.minimum(si[0], nb)]     # [nd, K]
                halo = jax.lax.all_to_all(sendbuf, axis, 0, 0)
                haloe = jnp.concatenate(
                    [halo.reshape(-1), jnp.zeros((1,), xl.dtype)])
                y = jnp.einsum("rw,rw->r", dv[0], xle[dc[0]])
                y = y + jnp.einsum("rw,rw->r", ov[0], haloe[oc[0]])
                return y[None]

            y = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                          P(axis)),
                out_specs=P(axis), check_vma=False)(
                dvals, ovals, dcols, ocols, sendidx, xp)
            return y.reshape(-1)[:n]

        self._mv = _mv

    def set_values(self, data):
        """New values, same pattern (update_matrix_values role)."""
        ext = np.concatenate([np.asarray(data),
                              np.zeros((1,), np.asarray(data).dtype)])
        sharding = NamedSharding(self.mesh, P(self.axis))
        self.dvals = jax.device_put(ext[np.asarray(self.dvidx)], sharding)
        self.ovals = jax.device_put(ext[np.asarray(self.ovidx)], sharding)

    def spmv(self, x):
        return self._mv(self.dvals, self.ovals, self.dcols, self.ocols,
                        self.sendidx, jnp.asarray(x))
