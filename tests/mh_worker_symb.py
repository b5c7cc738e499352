"""Symbolic-phase worker at awkward process counts (spawned by
test_dist.test_multihost_awkward_P).

The reference deliberately tests {2,4,9,13,16,17,19} MPI ranks to hit
proportional-mapping edge cases (test/CMakeLists.txt:189-318): rank
ranges that do not split evenly, single-process subtrees next to deep
shared tops.  This worker runs the distributed symbolic pipeline
(proportional owner -> pattern exchange -> bottom-up merge ->
RedistSubTree-style re-exchange) at P processes and checks every front's
update set bit-exactly against the single-process symbolic.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from strumpack_tpu.parallel import dist_symbolic as DS  # noqa: E402
from strumpack_tpu.sparse.gen import poisson2d  # noqa: E402
from strumpack_tpu.sparse.ordering.geometric import geometric_nd  # noqa: E402
from strumpack_tpu.sparse.symbolic import symbolic_factorization  # noqa: E402

NX = 64
A = poisson2d(NX)
perm, iperm, tree = geometric_nd(NX, NX, leaf=4)
owner = DS.proportional_owner(tree, nproc)

# proportional-mapping edge cases the awkward P values exist for:
# every process owns at least one subtree, the shared top is a strict
# minority, and owned subtrees are connected (child owner == parent
# owner or parent is shared/another process's root)
assert set(np.unique(owner[owner >= 0])) == set(range(nproc)), \
    np.unique(owner)
assert (owner == -1).sum() < tree.nseps // 4
for f in range(tree.nseps):
    p = tree.parent[f]
    if p >= 0 and owner[f] >= 0 and owner[p] >= 0:
        assert owner[f] == owner[p], (f, owner[f], owner[p])

lo = pid * A.n // nproc
hi = (pid + 1) * A.n // nproc
lrp = A.rowptr[lo:hi + 1] - A.rowptr[lo]
lci = A.colind[A.rowptr[lo]:A.rowptr[hi]]
intervals_all = [DS.needed_intervals(tree, owner, q) for q in range(nproc)]
pat = DS.exchange_pattern(lo, lrp, lci, perm, iperm, intervals_all, pid)
dupd = DS.distributed_symbolic(pat, tree, owner, pid)

Apg = A.permute(perm, iperm)
upd_ref = symbolic_factorization(Apg, tree)
held = 0
for f in range(tree.nseps):
    assert dupd.sizes[f] == len(upd_ref[f]), f
    if dupd.has(f):
        held += 1
        assert np.array_equal(dupd[f], upd_ref[f]), f
assert held < tree.nseps

need_all = [DS.numeric_need(tree, owner, q) for q in range(nproc)]
rupd = DS.redistribute_upd(dupd, need_all, pid, owner=owner)
for f in need_all[pid]:
    assert rupd.has(f) and np.array_equal(rupd[f], upd_ref[f]), f
frac = held / tree.nseps
print(f"proc {pid}/{nproc}: held {held}/{tree.nseps} fronts "
      f"({100 * frac:.0f}%)", flush=True)
print(f"SYMBOK {pid}", flush=True)
