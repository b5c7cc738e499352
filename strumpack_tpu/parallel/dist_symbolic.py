"""Distributed-memory symbolic factorization (host phase).

Role of the reference's ``EliminationTreeMPIDist::symb_fact``
(``sparse/EliminationTreeMPIDist.cpp:470-587``) with
``MatrixReorderingMPI``'s per-rank subgraphs
(``sparse/ordering/MatrixReorderingMPI.hpp:101-132``): every process
holds only its block rows of the input; the permuted PATTERN is never
allgathered.  Instead:

1. ``proportional_owner`` — the reference's proportional mapping
   (``EliminationTreeMPIDist.cpp:630-694``): the process range splits
   recursively over the two subtrees weighted by modeled subtree work;
   a front whose range narrows to one process is OWNED by it, fronts
   above the cut are SHARED (computed identically everywhere).
2. ``exchange_pattern`` — each process routes its original rows to the
   processes whose owned/shared separator ranges contain them
   (socket alltoallv, ``parallel/p2p.py`` — the MPI_Alltoallv role),
   relabelling columns into the permuted numbering on the sender.
3. ``distributed_symbolic`` — bottom-up update-set merge over the owned
   subtrees; ONE small allgather ships the cut fronts' update sets (the
   isend/recv_any_src hand-off up the tree, :470-587), then every
   process finishes the shared top identically.  A second tiny
   allgather shares per-front |upd| so bucket shapes / flop stats are
   global while upd CONTENT stays distributed.
"""
from __future__ import annotations

import numpy as np

from ..sparse.separator_tree import SeparatorTree


def subtree_weights(tree: SeparatorTree) -> np.ndarray:
    """Modeled work per subtree: sum over the subtree of sep_size^3/3 +
    sep_size * n_subtree (a cheap stand-in for the reference's FLOPS
    model, EliminationTreeMPIDist.cpp:512-574, usable before symbolic)."""
    nseps = tree.nseps
    w = np.zeros(nseps)
    for f in range(nseps):          # postorder: children first
        ds = float(tree.sep_end[f] - tree.sep_begin[f])
        w[f] = ds ** 3 / 3.0 + ds * ds
        l, r = int(tree.lch[f]), int(tree.rch[f])
        if l >= 0:
            w[f] += w[l]
        if r >= 0:
            w[f] += w[r]
    return w


def proportional_owner(tree: SeparatorTree, nproc: int) -> np.ndarray:
    """owner[f] = process owning front f, or -1 for shared top fronts."""
    nseps = tree.nseps
    owner = np.full(nseps, -1, dtype=np.int64)
    if nseps == 0:
        return owner
    w = subtree_weights(tree)

    def assign_subtree(f, p):
        stack = [f]
        while stack:
            g = stack.pop()
            owner[g] = p
            l, r = int(tree.lch[g]), int(tree.rch[g])
            if l >= 0:
                stack.append(l)
            if r >= 0:
                stack.append(r)

    def assign(f, p0, p1):
        if p1 - p0 <= 1:
            assign_subtree(f, p0)
            return
        l, r = int(tree.lch[f]), int(tree.rch[f])
        if l < 0 and r < 0:
            assign_subtree(f, p0)
            return
        if l < 0 or r < 0:
            assign(l if l >= 0 else r, p0, p1)   # f stays shared
            return
        wl, wr = w[l], w[r]
        npr = p1 - p0
        pl = int(round(npr * wl / max(wl + wr, 1e-300)))
        pl = min(max(pl, 1), npr - 1)
        assign(l, p0, p0 + pl)
        assign(r, p0 + pl, p1)

    assign(nseps - 1, 0, nproc)     # root is last in postorder
    return owner


def _merge_intervals(iv):
    if not iv:
        return []
    iv = sorted(iv)
    out = [list(iv[0])]
    for a, b in iv[1:]:
        if a <= out[-1][1]:
            out[-1][1] = max(out[-1][1], b)
        else:
            out.append([a, b])
    return [(a, b) for a, b in out]


def needed_intervals(tree: SeparatorTree, owner: np.ndarray, pid: int):
    """Merged permuted-row intervals whose pattern process ``pid``
    needs: the separator ranges of its owned fronts + every shared
    front (all processes replicate the shared top)."""
    sel = (owner == pid) | (owner == -1)
    iv = [(int(tree.sep_begin[f]), int(tree.sep_end[f]))
          for f in np.nonzero(sel)[0]
          if tree.sep_end[f] > tree.sep_begin[f]]
    return _merge_intervals(iv)


class ReducedPattern:
    """Permuted pattern restricted to a set of rows: CSR over the
    present rows with a permuted-id -> local-slot map."""

    def __init__(self, n, row_ids, rowptr, colind):
        self.n = n
        self.row_ids = row_ids          # sorted permuted row ids present
        self.rowptr = rowptr            # [len(row_ids)+1]
        self.colind = colind            # permuted column ids, sorted/row
        self.nbytes = (row_ids.nbytes + rowptr.nbytes + colind.nbytes)

    def rows_cols(self, sb, se):
        """Concatenated (sorted-per-row) permuted columns of permuted
        rows [sb, se) — all must be present."""
        lo = np.searchsorted(self.row_ids, sb)
        hi = np.searchsorted(self.row_ids, se)
        if hi - lo != se - sb:
            raise KeyError(f"rows [{sb},{se}) not fully present")
        return self.colind[self.rowptr[lo]:self.rowptr[hi]]


def exchange_pattern(begin_row, local_rowptr, local_colind, perm, iperm,
                     intervals_all, pid, symmetrize=True):
    """Route this process's original rows to every process whose needed
    permuted intervals contain them; assemble the received rows into a
    ReducedPattern.

    begin_row, local_rowptr, local_colind: this process's block rows
    (global column ids).  perm/iperm: the (global, identical) ND
    permutation — new[i] = old[perm[i]].  intervals_all: list (per
    process) of merged permuted intervals from needed_intervals.
    symmetrize: also send the transpose entries this block contributes
    (the driver symmetrizes the global pattern; with block rows each
    entry (i, j) must also appear as (j, i) — the receiver merges)."""
    from . import p2p
    n = len(perm)
    end_row = begin_row + len(local_rowptr) - 1
    nloc = end_row - begin_row
    counts = np.diff(local_rowptr)
    rows_orig = np.repeat(np.arange(begin_row, end_row, dtype=np.int64),
                          counts)
    cols_perm = iperm[np.asarray(local_colind, np.int64)]
    rows_perm = iperm[rows_orig]

    dest = {}
    for q, ivs in enumerate(intervals_all):
        send_rows = []
        send_cols = []
        # forward entries: permuted row in q's intervals
        for a, b in ivs:
            m = (rows_perm >= a) & (rows_perm < b)
            if m.any():
                send_rows.append(rows_perm[m])
                send_cols.append(cols_perm[m])
            if symmetrize:
                mt = (cols_perm >= a) & (cols_perm < b)
                if mt.any():
                    send_rows.append(cols_perm[mt])
                    send_cols.append(rows_perm[mt])
        if send_rows:
            dest[q] = (np.concatenate(send_rows),
                       np.concatenate(send_cols))
    got = p2p.alltoallv(dest)

    if got:
        rr = np.concatenate([v[0] for v in got.values()])
        cc = np.concatenate([v[1] for v in got.values()])
    else:
        rr = np.empty(0, np.int64)
        cc = np.empty(0, np.int64)
    # assemble: unique (row, col) sorted row-major
    key = rr * np.int64(n) + cc
    key = np.unique(key)
    rr = key // n
    cc = key % n
    row_ids, starts = np.unique(rr, return_index=True)
    rowptr = np.concatenate([starts, [len(rr)]]).astype(np.int64)
    return ReducedPattern(n, row_ids.astype(np.int64), rowptr,
                          cc.astype(np.int64))


class DistUpd:
    """Per-front update sets with distributed content: owned + shared
    fronts carry real index arrays; every front carries its SIZE (so
    len(upd[f]) and bucket shapes are global).  Mimics the list-of-
    arrays interface build_plan consumes for the fronts it touches."""

    def __init__(self, nseps, sizes, content):
        self.nseps = nseps
        self.sizes = np.asarray(sizes, np.int64)
        self._c = content               # {front: np.ndarray}

    def __len__(self):
        return self.nseps

    def __getitem__(self, f):
        u = self._c.get(int(f))
        if u is None:
            raise KeyError(f"upd content of front {f} not on this "
                           "process (owner-restricted plan build only)")
        return u

    def __iter__(self):
        for f in range(self.nseps):
            yield self._c.get(f)

    def has(self, f):
        return int(f) in self._c


def distributed_symbolic(pattern: ReducedPattern, tree: SeparatorTree,
                         owner: np.ndarray, pid: int):
    """Bottom-up update-set merge restricted to owned + shared fronts.

    Returns DistUpd (content for owned+shared fronts, sizes for all).
    Collective: two small allgathers (cut-front upd content, |upd|)."""
    from jax.experimental import multihost_utils as mh
    import jax
    nseps = tree.nseps
    upd = {}
    # pass 1: owned subtrees (postorder guarantees children first)
    for f in range(nseps):
        if owner[f] != pid:
            continue
        _merge_front(pattern, tree, upd, f)
    # hand the cut fronts (owned, parent shared) to everyone — the
    # recv_any_src hand-off up the tree in the reference
    cut = [f for f in range(nseps)
           if owner[f] == pid and tree.parent[f] >= 0
           and owner[tree.parent[f]] == -1]
    P = jax.process_count()
    if P > 1:
        from . import p2p
        payload = {f: upd[f] for f in cut}
        everyone = {q: payload for q in range(P) if q != pid}
        got = p2p.alltoallv(everyone)
        for q, d in got.items():
            upd.update(d)
    # pass 2: the shared top, identical on every process
    for f in range(nseps):
        if owner[f] != -1:
            continue
        _merge_front(pattern, tree, upd, f)
    # sizes for ALL fronts: share owned sizes (one allgather of an
    # nseps vector with -1 holes, reduced by max)
    sizes = np.full(nseps, -1, np.int64)
    for f, u in upd.items():
        sizes[f] = len(u)
    if P > 1:
        allsz = np.asarray(mh.process_allgather(sizes))
        sizes = allsz.max(axis=0)
    assert (sizes >= 0).all(), "symbolic left fronts unsized"
    return DistUpd(nseps, sizes, upd)


def numeric_need(tree: SeparatorTree, owner: np.ndarray, pid: int):
    """Front ids whose upd CONTENT process ``pid`` needs for numeric
    plan build: its owned fronts, the shared top, and the CHILDREN of
    both (extend-add position maps index into the child's update set —
    frontal/plan.py find_in_upd over lch/rch)."""
    need = set()
    for f in range(tree.nseps):
        if owner[f] == pid or owner[f] == -1:
            need.add(int(f))
            for c in (int(tree.lch[f]), int(tree.rch[f])):
                if c >= 0:
                    need.add(c)
    return need


def redistribute_upd(dupd: DistUpd, need_all, pid, owner=None):
    """RedistSubTree-style re-exchange of update-set CONTENT to its
    numeric owners (the reference's ``RedistSubTree``,
    ``sparse/Redistribute.hpp:136``: after symbolic, subtree data moves
    from the ranks that computed it to the ranks that factor it).

    ``need_all``: per-process collections of front ids (from
    :func:`numeric_need` or a custom device mapping).  Each process
    sends the content it holds to every process that needs it (socket
    alltoallv); with ``owner`` given, only the unique symbolic owner
    ships each front (shared-top content is already everywhere).
    Returns a new :class:`DistUpd` whose content covers this process's
    need set (sizes stay global)."""
    import jax
    P = jax.process_count()
    content = {int(f): dupd._c[int(f)] for f in need_all[pid]
               if int(f) in dupd._c}
    if P > 1:
        from . import p2p

        def mine(f):
            return owner is None or owner[int(f)] == pid
        dest = {}
        for q in range(P):
            if q == pid:
                continue
            payload = {int(f): dupd._c[int(f)] for f in need_all[q]
                       if int(f) in dupd._c and mine(f)}
            if payload:
                dest[q] = payload
        got = p2p.alltoallv(dest)
        for _, d in got.items():
            for k, v in d.items():
                content.setdefault(int(k), v)
    return DistUpd(dupd.nseps, dupd.sizes, content)


def _merge_front(pattern, tree, upd, f):
    sb, se = int(tree.sep_begin[f]), int(tree.sep_end[f])
    pieces = []
    if se > sb:
        cols = pattern.rows_cols(sb, se)
        pieces.append(cols[cols >= se])
    for c in (int(tree.lch[f]), int(tree.rch[f])):
        if c >= 0:
            u = upd[c]
            pieces.append(u[u >= se])
    upd[f] = (np.unique(np.concatenate(pieces)) if pieces
              else np.empty(0, dtype=np.int64))
