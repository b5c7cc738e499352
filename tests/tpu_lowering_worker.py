"""Subprocess worker: lower + compile the numeric program families —
every Pallas kernel at real bucket shapes — for the REAL TPU backend.

Run by tests/test_tpu_lowering.py in a fresh process with the launch
platform restored (the in-process suite pins JAX_PLATFORMS=cpu).  Exit
42 = no TPU available (test skips).  Interpret-mode kernel tests bypass
Mosaic's block-mapping and layout checks entirely — round 1 shipped a
kernel that passed every interpret test and failed to lower on hardware
(BENCH_r01.json); this worker is the regression gate for that class of
bug.

Stages (STRUMPACK_LOWER_STAGES, comma list, default all):
  whole — 32^3 whole-program factor + two-phase solve (r2 scope)
  split — 20^3 split-program mode: every signature-keyed factor/fwd/bwd
          group program compiles and RUNS on the chip (the 64^3 program
          family — VERDICT r2 item 9's blind spot)
  mesh  — 1-device-mesh shard_map factor+solve step (the distributed
          code path's kernels under shard_map on hardware)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if jax.default_backend() == "cpu":
        return 42

    cache = os.environ.get(
        "JAX_CACHE_DIR", os.path.expanduser("~/.cache/strumpack_tpu_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    from strumpack_tpu import SparseSolver, SPOptions
    from strumpack_tpu.frontal import numeric
    from strumpack_tpu.sparse.gen import poisson3d

    stages = os.environ.get("STRUMPACK_LOWER_STAGES",
                            "whole,split,mesh").split(",")
    compile_too = os.environ.get("STRUMPACK_LOWER_COMPILE", "1") == "1"

    if "whole" in stages:
        nx = int(os.environ.get("STRUMPACK_LOWER_NX", "32"))
        A = poisson3d(nx)
        opts = SPOptions(factor_dtype="float32", refine_dtype="float32",
                         nd_leaf=16)
        s = SparseSolver(opts)
        s.set_csr_matrix(A)
        s.reorder(nx, nx, nx)
        vals = jnp.asarray(s.Ap.data, dtype=jnp.float32)
        z = jnp.zeros((), jnp.float32)

        def factor(arrays, v):
            return numeric._factor_impl(s.pdev, arrays, v, z, z)[0]

        lowered = jax.jit(factor).lower(s.pdev.arrays, vals)
        print("lowered OK (BlockSpec / block-mapping checks passed)")
        if compile_too:
            lowered.compile()
            print("compiled OK (Mosaic kernel compilation passed)")
            # two-phase solve program family on hardware
            fac = numeric.factorize(s.pdev, vals)
            b = jnp.asarray(s.Ap.spmv(np.ones(s.Ap.n)), dtype=jnp.float32)
            x = numeric.solve(fac, b)
            jax.block_until_ready(x)
            print("solve OK (whole-program two-phase solve ran on chip)")

    if "split" in stages and compile_too:
        nx = int(os.environ.get("STRUMPACK_LOWER_SPLIT_NX", "20"))
        A = poisson3d(nx)
        opts = SPOptions(factor_dtype="float32", refine_dtype="float32",
                         nd_leaf=8)
        s = SparseSolver(opts)
        s.set_csr_matrix(A)
        s.reorder(nx, nx, nx)
        nb = sum(len(l) for l in s.pdev.levels)
        assert nb > numeric.SPLIT_SOLVE_BUCKETS, nb
        vals = jnp.asarray(s.Ap.data, dtype=jnp.float32)
        fac = numeric.factorize(s.pdev, vals)
        b = jnp.asarray(s.Ap.spmv(np.ones(s.Ap.n)), dtype=jnp.float32)
        x = np.asarray(numeric.solve(fac, b))
        res = float(np.linalg.norm(s.Ap.spmv(x) - np.asarray(b))
                    / np.linalg.norm(np.asarray(b)))
        assert res < 1e-3, res
        print(f"split OK (group programs ran on chip, residual {res:.2e})")

    if "mesh" in stages and compile_too:
        from jax.sharding import Mesh
        from strumpack_tpu.parallel.dist import make_sharded_factor_solve
        from strumpack_tpu.sparse.ordering.geometric import geometric_nd
        from strumpack_tpu.sparse.symbolic import symbolic_factorization
        from strumpack_tpu.frontal.plan import build_plan
        nx = 16
        A = poisson3d(nx)
        perm, iperm, tree = geometric_nd(nx, nx, nx, leaf=8)
        Ap = A.permute(perm, iperm)
        upd = symbolic_factorization(Ap, tree)
        plan = build_plan(Ap, tree, upd)
        pdev = numeric.PlanDev(plan)
        mesh = Mesh(np.array(jax.devices()[:1]), ("b",))
        fn = make_sharded_factor_solve(pdev, mesh, dtype=jnp.float32)
        b = Ap.spmv(np.ones(Ap.n)).astype(np.float32)
        x = np.asarray(fn(jnp.asarray(Ap.data, dtype=jnp.float32),
                          jnp.asarray(b)))
        res = float(np.linalg.norm(Ap.spmv(x) - b) / np.linalg.norm(b))
        assert res < 1e-3, res
        print(f"mesh OK (shard_map step ran on chip, residual {res:.2e})")

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
