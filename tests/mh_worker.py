"""Worker process for the multi-host test (spawned by test_dist.py).

Each process owns 4 virtual CPU devices; two processes form one global
8-device mesh via jax.distributed — the single-machine emulation of the
reference's multi-node MPI runs (test/CMakeLists.txt oversubscription
role, SURVEY.md section 4).  Runs the sharded DIRECT factor+solve of the
DistributedSparseSolver across both processes and checks the residual.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from strumpack_tpu import KrylovSolver, SPOptions  # noqa: E402
from strumpack_tpu.parallel.driver import DistributedSparseSolver  # noqa: E402
from strumpack_tpu.sparse.gen import poisson2d  # noqa: E402
from strumpack_tpu.utils.params import ReturnCode  # noqa: E402

devs = np.array(jax.devices())
assert len(devs) == 2 * nproc * 2, (len(devs), nproc)
assert len(jax.local_devices()) == 4
mesh = Mesh(devs.reshape(-1, 2, 2), ("b", "r", "c"))

A = poisson2d(24)
opts = SPOptions(krylov_solver=KrylovSolver.DIRECT, factor_dtype="float64",
                 refine_dtype="float64")
s = DistributedSparseSolver(mesh, opts)
# distributed block-row input (set_distributed_csr_matrix role): each
# process passes only ITS contiguous rows; the driver allgathers
half = A.n // 2
lo, hi = (0, half) if pid == 0 else (half, A.n)
lrp = A.rowptr[lo:hi + 1] - A.rowptr[lo]
lci = A.colind[A.rowptr[lo]:A.rowptr[hi]]
lv = A.data[A.rowptr[lo]:A.rowptr[hi]]
s.set_distributed_csr_matrix(lrp, lci, lv, lo, A.n)
assert s.A.nnz == A.nnz
s.reorder(24, 24)
rng = np.random.default_rng(0)
xex = rng.standard_normal(A.n)
b = A.spmv(xex)
x, rc = s.solve(b)
assert rc == ReturnCode.SUCCESS, rc
res = A.max_scaled_residual(x, b)
print(f"proc {pid}: rc={rc} res={res:.2e}", flush=True)
assert res < 1e-10, res
# per-process plan staging (VERDICT r2 item 6 / RedistSubTree role):
# each process materializes + transfers only ITS devices' rows of the
# bucket plans — well under 60% of the all-devices total
sp = s._step.sharded_plan
local_b, global_b = sp.staged_bytes()
frac = local_b / max(global_b, 1)
print(f"proc {pid}: staged plan arrays {local_b} / {global_b} bytes "
      f"({100 * frac:.0f}%)", flush=True)
assert frac < 0.6, (local_b, global_b)

# distributed-WORK reordering (MatrixReorderingMPI role): PARMETIS name
# routes the subgraph orderings across the two processes; the composed
# permutation must be identical on both and solve to the same residual
from strumpack_tpu.options import ReorderingStrategy  # noqa: E402
opts2 = SPOptions(krylov_solver=KrylovSolver.DIRECT,
                  factor_dtype="float64", refine_dtype="float64",
                  reordering_method=ReorderingStrategy.PARMETIS)
s2 = DistributedSparseSolver(mesh, opts2)
s2.set_distributed_csr_matrix(lrp, lci, lv, lo, A.n)
s2.reorder()
x2, rc2 = s2.solve(b)
assert rc2 == ReturnCode.SUCCESS, rc2
res2 = A.max_scaled_residual(x2, b)
print(f"proc {pid}: distnd res={res2:.2e} nseps={s2.tree.nseps}",
      flush=True)
assert res2 < 1e-10, res2
# --- distributed-memory symbolic (EliminationTreeMPIDist::symb_fact /
# MatrixReorderingMPI subgraph role, VERDICT r3 item 4): the permuted
# PATTERN is never allgathered — each process exchanges only the rows
# its owned subtrees + the shared top need, runs the bottom-up merge on
# owned fronts, ships the cut fronts' update sets, finishes the top
# identically — and ends up holding upd CONTENT only for owned+shared.
from strumpack_tpu.parallel import dist_symbolic as DS  # noqa: E402
from strumpack_tpu.sparse.ordering.geometric import geometric_nd  # noqa: E402
from strumpack_tpu.sparse.symbolic import symbolic_factorization  # noqa: E402

A2 = poisson2d(96)           # big enough that the shared top is small
perm, iperm_, tree = geometric_nd(96, 96, leaf=4)
owner = DS.proportional_owner(tree, nproc)
assert (owner == -1).any() and set(np.unique(owner[owner >= 0])) == set(
    range(nproc))
half2 = A2.n // 2
lo2, hi2 = (0, half2) if pid == 0 else (half2, A2.n)
lrp2 = A2.rowptr[lo2:hi2 + 1] - A2.rowptr[lo2]
lci2 = A2.colind[A2.rowptr[lo2]:A2.rowptr[hi2]]
intervals_all = [DS.needed_intervals(tree, owner, q) for q in range(nproc)]
pat = DS.exchange_pattern(lo2, lrp2, lci2, perm, iperm_, intervals_all, pid)
dupd = DS.distributed_symbolic(pat, tree, owner, pid)

# verify against the global symbolic (the full matrix exists only in
# this TEST, for checking)
Apg = A2.permute(perm, iperm_)
upd_ref = symbolic_factorization(Apg, tree)
held = 0
for f in range(tree.nseps):
    assert dupd.sizes[f] == len(upd_ref[f]), f
    if dupd.has(f):
        held += 1
        assert np.array_equal(dupd[f], upd_ref[f]), f
assert held < tree.nseps, "process holds every front's upd content"
glob_pat_bytes = Apg.colind.nbytes + Apg.rowptr.nbytes
frac_pat = pat.nbytes / glob_pat_bytes
print(f"proc {pid}: reduced pattern {pat.nbytes} / {glob_pat_bytes} "
      f"bytes ({100 * frac_pat:.0f}%), upd content for {held}/"
      f"{tree.nseps} fronts", flush=True)
assert frac_pat < 0.6, frac_pat

# --- phase 2: RedistSubTree-style re-exchange (Redistribute.hpp:136,
# VERDICT r3 item 4 / ROADMAP r4 next 1): content moves from symbolic
# owners to the processes that numerically need it (owned + shared +
# their children for the extend-add index maps); the re-exchanged
# holding must cover the need set exactly and stay well under the
# global content bytes.
need_all = [DS.numeric_need(tree, owner, q) for q in range(nproc)]
rupd = DS.redistribute_upd(dupd, need_all, pid, owner=owner)
for f in need_all[pid]:
    assert rupd.has(f), f
    assert np.array_equal(rupd[f], upd_ref[f]), f
glob_upd_bytes = sum(u.nbytes for u in upd_ref) or 1
mine_bytes = sum(rupd[f].nbytes for f in need_all[pid])
frac_upd = mine_bytes / glob_upd_bytes
print(f"proc {pid}: re-exchanged upd content {mine_bytes} / "
      f"{glob_upd_bytes} bytes ({100 * frac_upd:.0f}%)", flush=True)
assert frac_upd < 0.75, frac_upd

print(f"MHOK {pid}", flush=True)
