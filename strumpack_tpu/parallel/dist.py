"""Multi-device execution of the level-batched multifrontal solver.

Role of the reference's distributed stack (EliminationTreeMPIDist
proportional mapping, FrontDenseMPI 2D block-cyclic fronts, ExtendAdd
alltoallv — SURVEY.md sections 2.12, 3.3) on a TPU mesh.

The factor+solve step itself lives in ``parallel/spmd.py`` (round-2
redesign): the same Pallas/BLR/HSS bucket kernels as the single-chip path
run inside a shard_map over the front-batch axis, contribution blocks stay
sharded with explicit all-gather fetches, and the root front factors on
the (r, c) grid via ``dist2d.py``.  This module keeps the mesh-wide data
staging helpers shared by the distributed drivers and Krylov solvers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..frontal.numeric import PlanDev
from .spmd import make_sharded_factor_solve  # noqa: F401  (public API)


def plan_arrays_for_mesh(pdev: PlanDev, mesh: Mesh):
    """The plan's index arrays as arrays usable under ``mesh``.  Single
    process: the PlanDev device copies.  Multi-process (multi-host — the
    reference's across-node MPI distribution, SURVEY.md 2.12): every
    process holds the same host plan, so the arrays are lifted to GLOBAL
    replicated arrays over the full mesh; XLA then lowers the program's
    collectives onto ICI within a host and DCN between hosts."""
    if jax.process_count() == 1:
        return pdev.arrays
    from jax.experimental import multihost_utils
    host = {f"{li},{bi}": bd.host_arrays
            for li, lvl in enumerate(pdev.levels)
            for bi, bd in enumerate(lvl)}
    return jax.tree_util.tree_map(
        lambda a: multihost_utils.host_local_array_to_global_array(
            a, mesh, P()), host)


def to_global(x, mesh):
    """Replicate a host array onto every device of a (possibly multi-host)
    mesh; no-op wrapper in single-process mode."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jnp.asarray(x)
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(x, mesh, P())


def from_global(x, mesh):
    """Fetch a replicated mesh-global array to host (multi-process global
    arrays cannot be np.asarray'd directly)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(
        multihost_utils.global_array_to_host_local_array(x, mesh, P()))
