"""Minimal repro of the 3-phase fused-program XLA miscompile (round 3).

Observed (jax 0.9, CPU backend, also reproduced against the TPU path):
compiling factor + forward-solve + backward-solve into ONE jitted
program, with GSPMD big-front (grid/tile) computations between the
shard_map regions, returns WRONG solve values — while each phase jitted
separately, and any two phases fused, are bit-exact against the
per-segment dispatch path on identical inputs.

The production gate in ``make_sharded_factor_solve`` therefore never
fuses plans that contain grid/tile fronts; the env override
``STRUMPACK_SPMD_FORCE_FUSED=1`` exists only so this script (and the
guard test ``tests/test_split_mode.py::test_fused_big_front_guard``)
can re-check whether the underlying XLA bug is still present.

Exit status: 0 when fused == segmented (bug absent on this jax/XLA —
the gate could be relaxed), 1 when they differ (gate must stay).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from strumpack_tpu.sparse.gen import poisson3d  # noqa: E402
from strumpack_tpu.sparse.ordering.geometric import geometric_nd  # noqa: E402
from strumpack_tpu.sparse.symbolic import symbolic_factorization  # noqa: E402
from strumpack_tpu.frontal.plan import build_plan  # noqa: E402
from strumpack_tpu.frontal import numeric  # noqa: E402


def build(nx=16, leaf=8, blr=False):
    A = poisson3d(nx)
    perm, iperm, tree = geometric_nd(nx, nx, nx, leaf=leaf)
    Ap = A.permute(perm, iperm)
    upd = symbolic_factorization(Ap, tree)
    compression = None
    if blr:
        from strumpack_tpu import CompressionType, SPOptions
        compression = SPOptions(compression=CompressionType.BLR,
                                compression_min_sep_size=32)
        compression.blr.rel_tol = 1e-8
    plan = build_plan(Ap, tree, upd, compression=compression)
    return Ap, numeric.PlanDev(plan)


def compare(name, Ap, pdev, rtol):
    """Returns the relative max elementwise difference fused vs
    segmented, asserting the segmented path itself is correct."""
    from strumpack_tpu.parallel.dist import make_sharded_factor_solve

    mesh = Mesh(np.array(jax.devices()[:8]), ("b",))
    b = Ap.spmv(np.ones(Ap.n))

    os.environ.pop("STRUMPACK_SPMD_FORCE_FUSED", None)
    seg = make_sharded_factor_solve(pdev, mesh, dtype=jnp.float64,
                                    blr_tol=1e-8)
    assert not seg.fused and seg.sharded_plan.big, \
        f"{name}: plan has no grid/tile front — repro needs one"
    x_seg = np.asarray(seg(jnp.asarray(Ap.data), jnp.asarray(b)))

    nbuckets = sum(len(l) for l in pdev.levels)
    if nbuckets > numeric.SPLIT_SOLVE_BUCKETS:
        print(f"{name}: {nbuckets} buckets > whole-program threshold — "
              "fusion impossible, skipping")
        return 0.0
    os.environ["STRUMPACK_SPMD_FORCE_FUSED"] = "1"
    try:
        fused = make_sharded_factor_solve(pdev, mesh, dtype=jnp.float64,
                                          blr_tol=1e-8)
        assert fused.fused
        x_fused = np.asarray(fused(jnp.asarray(Ap.data), jnp.asarray(b)))
    finally:
        os.environ.pop("STRUMPACK_SPMD_FORCE_FUSED", None)

    res_seg = np.linalg.norm(Ap.spmv(x_seg) - b) / np.linalg.norm(b)
    diff = np.abs(x_seg - x_fused).max() / max(np.abs(x_seg).max(), 1.0)
    print(f"{name}: segmented residual {res_seg:.3e}, "
          f"fused-vs-segmented rel max diff {diff:.3e}")
    assert res_seg < rtol, f"{name}: segmented (production) path wrong!"
    return diff


def main():
    worst = 0.0
    for name, kwargs, rtol in [
            ("dense-grid nx=16", dict(nx=16, leaf=8), 1e-10),
            ("dense-grid nx=20", dict(nx=20, leaf=8), 1e-10),
            ("blr-tile nx=12", dict(nx=12, leaf=8, blr=True), 1e-2),
    ]:
        Ap, pdev = build(**kwargs)
        worst = max(worst, compare(name, Ap, pdev, rtol))
    if worst < 1e-10:
        print("AGREE on all configs: miscompile not reproduced on this "
              "jax/XLA version")
        return 0
    print("DIFFER: 3-phase fused miscompile present; the gate in "
          "make_sharded_factor_solve must stay")
    return 1


if __name__ == "__main__":
    sys.exit(main())
