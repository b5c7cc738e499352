"""Approximate minimum degree ordering (host).

Role of the reference's ``sparse/ordering/minimum_degree/AMDReordering.hpp``
+ ``amdbar.F`` (Amestoy-Davis-Duff AMD).  This is a compact quotient-graph
minimum-degree with element absorption — not the full AMD heuristic set, but
the same external-degree greedy core; adequate as a fallback ordering for
small/irregular problems (the primary ordering is nested dissection).
"""
from __future__ import annotations

import heapq

import numpy as np


def amd_order(rowptr, colind, n) -> np.ndarray:
    """Return perm with perm[new] = old (elimination order)."""
    # adjacency sets, diagonal removed
    adj = [set() for _ in range(n)]
    for i in range(n):
        for p in range(rowptr[i], rowptr[i + 1]):
            j = int(colind[p])
            if j != i:
                adj[i].add(j)
                adj[j].add(i)

    eliminated = np.zeros(n, dtype=bool)
    heap = [(len(adj[i]), i) for i in range(n)]
    heapq.heapify(heap)
    perm = []
    while heap:
        d, v = heapq.heappop(heap)
        if eliminated[v] or d != len(adj[v]):
            continue  # stale entry
        eliminated[v] = True
        perm.append(v)
        nbrs = [u for u in adj[v] if not eliminated[u]]
        # form clique among neighbors (element absorption)
        for u in nbrs:
            adj[u].discard(v)
            adj[u].update(w for w in nbrs if w != u)
            heapq.heappush(heap, (len(adj[u]), u))
        adj[v] = set()
    return np.asarray(perm, dtype=np.int64)
