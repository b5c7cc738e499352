"""Column matching for numerical stability (host).

Role of the reference's MC64 integration (``sparse/MC64ad.cpp`` — HSL MC64
max-product bipartite matching with row/column scalings, dispatched via
``MatchingJob`` StrumpackOptions.hpp:120-130 and applied in
``SparseSolverBase::reorder`` :327-344).

Implementation: maximum product-of-diagonals matching computed as a
min-weight perfect bipartite matching on w_ij = log(max_i|a_ij|) - log|a_ij|
(scipy's Jonker-Volgenant solver), followed by Sinkhorn-style row/column
scaling of the matched matrix so the matched diagonal is ~1 and off-diagonals
are O(1) — the same normalization MC64 job 5's dual variables produce.
"""
from __future__ import annotations

import numpy as np

from .csr import CSRMatrix


def max_product_matching(A: CSRMatrix):
    """Return (colperm q, dr, dc): A[:, q] has a structurally nonzero
    diagonal maximizing prod|a_{i,q[i]}|; dr/dc scale so diag(dr)A[:,q]diag
    becomes ~unit-diagonal.  q[i] = original column matched to row i."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import min_weight_full_bipartite_matching

    n = A.n
    absA = np.abs(A.data).astype(np.float64)
    if (absA == 0).any():
        # explicit zeros cannot be matched; drop them from the graph
        keep = absA > 0
    else:
        keep = slice(None)
    rows = np.repeat(np.arange(n), np.diff(A.rowptr))[keep]
    cols = A.colind[keep]
    vals = absA[keep]
    cmax = np.zeros(n)
    np.maximum.at(cmax, cols, vals)
    w = np.log(cmax[cols]) - np.log(vals)
    # strictly positive weights required by the scipy solver's sparsity
    # convention (0 == no edge); shift by epsilon
    w = w + 1e-300
    B = csr_matrix((w, (rows, cols)), shape=(n, n))
    r, c = min_weight_full_bipartite_matching(B)
    q = np.empty(n, dtype=np.int64)
    q[r] = c
    dr, dc = matching_scaling(A, q)
    return q, dr, dc


def matching_scaling(A: CSRMatrix, q):
    """Row/col scalings for a fixed matching q (recomputed on value updates
    while q — and hence the sparsity plan — stays fixed)."""
    n = A.n
    absA = np.abs(A.data).astype(np.float64)
    dr = np.ones(n)
    dc = np.ones(n)
    iq = np.empty(n, dtype=np.int64)
    iq[q] = np.arange(n)
    rows_all = np.repeat(np.arange(n), np.diff(A.rowptr))
    diag_mask = iq[A.colind] == rows_all
    for _ in range(5):
        # scale matched diagonal toward 1 (sqrt split between row and col)
        scaled = absA * dr[rows_all] * dc[A.colind]
        dvals = np.ones(n)
        dvals[rows_all[diag_mask]] = scaled[diag_mask]
        dvals[dvals == 0] = 1.0
        dr *= 1.0 / np.sqrt(dvals)
        dc[q] *= 1.0 / np.sqrt(dvals)
    return dr, dc


def apply_matching(A: CSRMatrix, q, dr, dc) -> CSRMatrix:
    """Return diag(dr) @ A @ diag(dc) with columns permuted so that matched
    entries land on the diagonal: out[:, i] = (scaled A)[:, q[i]]."""
    S = A.scale_rows_cols(dr, dc).to_scipy()
    iq = np.empty(A.n, dtype=np.int64)
    iq[q] = np.arange(A.n)
    out = S[:, q].tocsr()
    out.sort_indices()
    return CSRMatrix(A.n, out.indptr, out.indices, out.data)
