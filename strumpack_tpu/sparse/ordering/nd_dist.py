"""Distributed-work nested dissection (MatrixReorderingMPI role).

Role of the reference's parallel reordering
(``sparse/ordering/MatrixReorderingMPI.{hpp,cpp}``: ParMETIS/PT-Scotch
compute the ND in parallel; each rank then owns local subtrees,
``MatrixReorderingMPI.hpp:101-132``).  TPU-native mapping over
``jax.distributed`` processes:

* every process deterministically computes the TOP ``ceil(log2 P)``
  bisection levels (cheap: a few BFS sweeps over the pattern each
  process already holds — the distributed block-row input is
  allgathered by the driver);
* the resulting subgraphs are ordered IN PARALLEL, subgraph g on
  process ``g % P``, with the native multilevel ND (the heavy
  O(n log n) part of the analysis — this is where ParMETIS spends its
  time too);
* per-subgraph permutations + separator subtrees are allgathered
  (padded host arrays through ``multihost_utils.process_allgather``)
  and composed into the global postorder (perm, iperm, SeparatorTree)
  identically on every process.

Memory stays host-global (each process holds the full pattern — the
documented ceiling, PARITY.md); the reordering WORK is what distributes.
"""
from __future__ import annotations

import numpy as np

from ..separator_tree import TreeBuilder
from .nd import _bisect, nested_dissection


def _top_bisection(rowptr, colind, n, levels):
    """Deterministic top ``levels`` bisection levels.  Returns a nested
    top-tree: leaves are id arrays (subgraphs), internal nodes
    ("sep", left, right, sep_ids)."""
    def rec(ids, d):
        if d == 0 or len(ids) <= 1:
            return ("leaf", ids)
        left, right, sep = _bisect(rowptr, colind, ids)
        if len(left) == 0 or len(right) == 0:
            return ("leaf", ids)
        return ("sep", rec(left, d - 1), rec(right, d - 1), sep)
    return rec(np.arange(n, dtype=np.int64), levels)


def _collect_leaves(node, out):
    if node[0] == "leaf":
        out.append(node[1])
        return
    _collect_leaves(node[1], out)
    _collect_leaves(node[2], out)


def _pack_results(results):
    """Serialize {g: (perm_ids, sb, se, lch, rch)} into one flat f64-free
    int64 array with a header, for fixed-shape allgather."""
    parts = [np.array([len(results)], np.int64)]
    for g, (perm_ids, sb, se, lch, rch) in sorted(results.items()):
        parts.append(np.array([g, len(perm_ids), len(sb)], np.int64))
        parts += [perm_ids.astype(np.int64), sb.astype(np.int64),
                  se.astype(np.int64), lch.astype(np.int64),
                  rch.astype(np.int64)]
    return np.concatenate(parts)


def _unpack_results(flat):
    flat = np.asarray(flat, np.int64)
    out = {}
    k = 0
    nres = int(flat[k]); k += 1
    for _ in range(nres):
        g, ns, nn = map(int, flat[k:k + 3]); k += 3
        perm_ids = flat[k:k + ns]; k += ns
        sb = flat[k:k + nn]; k += nn
        se = flat[k:k + nn]; k += nn
        lch = flat[k:k + nn]; k += nn
        rch = flat[k:k + nn]; k += nn
        out[g] = (perm_ids, sb, se, lch, rch)
    return out


def nested_dissection_distributed(rowptr, colind, n, leaf: int = 32,
                                  splitter: str = "ml"):
    """(perm, iperm, SeparatorTree) with the subgraph orderings computed
    in parallel across jax.distributed processes; falls back to the
    sequential ND in single-process runs."""
    import jax
    P = jax.process_count()
    if P <= 1:
        return nested_dissection(rowptr, colind, n, leaf=leaf,
                                 splitter=splitter)
    from jax.experimental import multihost_utils as mh
    rowptr = np.asarray(rowptr)
    colind = np.asarray(colind)
    T = max(1, int(np.ceil(np.log2(P))))
    top = _top_bisection(rowptr, colind, n, T)
    leaves = []
    _collect_leaves(top, leaves)

    pid = jax.process_index()
    mine = {}
    for g, ids in enumerate(leaves):
        if g % P != pid:
            continue
        if len(ids) == 0:
            mine[g] = (ids, np.zeros(0, np.int64), np.zeros(0, np.int64),
                       np.zeros(0, np.int64), np.zeros(0, np.int64))
            continue
        # order the induced subgraph: relabel to local ids, run ND
        gl = np.full(n, -1, np.int64)
        gl[ids] = np.arange(len(ids))
        lrp = [0]
        lci = []
        for v in ids:
            cs = gl[colind[rowptr[v]:rowptr[v + 1]]]
            cs = cs[cs >= 0]
            lci.append(cs)
            lrp.append(lrp[-1] + len(cs))
        perm_l, _, tree_l = nested_dissection(
            np.asarray(lrp, np.int64),
            np.concatenate(lci) if lci else np.zeros(0, np.int64),
            len(ids), leaf=leaf, splitter=splitter)
        mine[g] = (ids[perm_l], tree_l.sep_begin, tree_l.sep_end,
                   tree_l.lch, tree_l.rch)

    blob = _pack_results(mine)
    sizes = np.asarray(mh.process_allgather(
        np.array([len(blob)], np.int64))).ravel()
    pad = np.zeros(int(sizes.max()), np.int64)
    pad[:len(blob)] = blob
    blobs = np.asarray(mh.process_allgather(pad))
    results = {}
    for p in range(P):
        results.update(_unpack_results(blobs[p][:sizes[p]]))

    # compose the global postorder on every process identically
    tb = TreeBuilder()
    leaf_counter = [0]

    def compose(node):
        if node[0] == "leaf":
            g = leaf_counter[0]
            leaf_counter[0] += 1
            perm_ids, sb, se, lch, rch = results[g]
            if len(sb) == 0:
                lo, hi = tb.emit(perm_ids)
                return tb.add_node(lo, hi, -1, -1)
            off_v = tb._count
            off_n = len(tb.sep_begin)
            tb.emit(perm_ids)
            root = -1
            for i in range(len(sb)):
                root = tb.add_node(int(sb[i]) + off_v, int(se[i]) + off_v,
                                   int(lch[i]) + off_n if lch[i] >= 0
                                   else -1,
                                   int(rch[i]) + off_n if rch[i] >= 0
                                   else -1)
            return root
        _, lnode, rnode, sep = node
        lroot = compose(lnode)
        rroot = compose(rnode)
        lo, hi = tb.emit(sep)
        return tb.add_node(lo, hi, lroot, rroot)

    compose(top)
    return tb.finish(n)
