"""Benchmark suite: BASELINE.md configs measured at HEAD on the real chip.

Prints one JSON line per config (same schema as bench.py).  Configs:
  1. 3D Poisson 32^3, exact multifrontal LU f32 (bench.py's metric)
  2. 3D Poisson 50^3, BLR fronts tol 1e-4 + device GMRES (BASELINE cfg 2)
  3. 3D Poisson 64^3, exact LU split-program mode
Usage: python examples/bench_suite.py [1 2 3]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _setup_cache():
    import jax
    cache = os.environ.get("JAX_CACHE_DIR",
                           os.path.expanduser("~/.cache/strumpack_tpu_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _steady_factor_time(s, opts, reps=3):
    """Steady-state per-factorization seconds (chained on-device timing
    when the plan fits one program; per-dispatch walls otherwise)."""
    import jax
    import jax.numpy as jnp
    from strumpack_tpu.frontal import numeric
    from strumpack_tpu.utils.sync import device_sync
    vals = s.Ap.data.astype(np.float32)
    nbuckets = sum(len(l) for l in s.pdev.levels)
    fits = (nbuckets <= numeric.SPLIT_SOLVE_BUCKETS
            and numeric.factor_peak_bytes(s.pdev, 4)
            <= 0.85 * numeric.hbm_budget_bytes())
    if fits and not s.plan.levels[0][0].blr:
        def loop(arrays, v, n_it):
            acc = jnp.zeros((), jnp.float32)
            z = jnp.zeros((), jnp.float32)
            for _ in range(n_it):
                tree, _ = numeric._factor_impl(s.pdev, arrays, v + acc * 0.0,
                                               z, z)
                for leaf in tree["lu"].values():
                    acc = acc + jnp.sum(leaf[:, 0, 0].astype(jnp.float32))
            return acc
        try:
            fn = jax.jit(loop, static_argnames=("n_it",))
            with jax.default_matmul_precision(opts.matmul_precision):
                device_sync(fn(s.pdev.arrays, vals, 1))
                device_sync(fn(s.pdev.arrays, vals, reps))
                t0 = time.perf_counter()
                device_sync(fn(s.pdev.arrays, vals, reps))
                tn = time.perf_counter() - t0
                t0 = time.perf_counter()
                device_sync(fn(s.pdev.arrays, vals, 1))
                t1 = time.perf_counter() - t0
            return (tn - t1) / max(reps - 1, 1)
        except Exception as e:
            print(f"# chained timing unavailable: {type(e).__name__}",
                  file=sys.stderr)
    from strumpack_tpu.frontal import numeric as N
    from strumpack_tpu.utils.sync import device_sync
    best = None
    for _ in range(max(reps, 2)):
        t0 = time.perf_counter()
        fac = N.factorize(s.pdev, vals, blr_tol=opts.blr.rel_tol,
                          hss_tol=opts.hss.rel_tol,
                          matmul_precision=opts.matmul_precision)
        device_sync(fac.tree)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def run_config(name, nx, opts_kw, blr_tol=None):
    from strumpack_tpu import SparseSolver, SPOptions
    from strumpack_tpu.sparse.gen import poisson3d
    A = poisson3d(nx)
    from strumpack_tpu import KrylovSolver  # noqa
    opts = SPOptions(factor_dtype="float32", refine_dtype="float32",
                     nd_leaf=16, **opts_kw)
    if blr_tol:
        opts.blr.rel_tol = blr_tol
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    t0 = time.perf_counter()
    s.reorder(nx, nx, nx)
    t_reorder = time.perf_counter() - t0
    s.factor()
    t_first = s.times["factor"]
    t_factor = _steady_factor_time(s, opts)
    flops = s.factor_flops()
    gflops = flops / t_factor / 1e9

    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    t_solve = s.times["solve"]
    x, rc = s.solve(b)
    t_solve = min(t_solve, s.times["solve"])
    res = A.max_scaled_residual(x, b)
    fmem = s.fac.factor_memory()
    dense_mem = s.plan.factor_nnz * 4
    print(f"# {name}: n={A.n} reorder={t_reorder:.1f}s first={t_first:.1f}s "
          f"factor={t_factor:.4f}s solve={t_solve:.3f}s its={s.its} "
          f"res={res:.2e} mem={fmem/1e6:.1f}MB "
          f"ratio={100.0*fmem/max(dense_mem,1):.1f}%", file=sys.stderr)
    print(json.dumps({
        "metric": name, "value": round(gflops, 2), "unit": "GFlop/s",
        "factor_s": round(t_factor, 4), "solve_s": round(t_solve, 4),
        "iterations": int(s.its), "residual": float(f"{res:.3e}"),
        "compression_pct": round(100.0 * fmem / max(dense_mem, 1), 1),
    }), flush=True)


def main():
    _setup_cache()
    from strumpack_tpu import KrylovSolver
    from strumpack_tpu.options import CompressionType
    which = set(sys.argv[1:]) or {"1", "2", "3"}
    if "1" in which:
        run_config("poisson3d_32_exact", 32,
                   dict(krylov_solver=KrylovSolver.REFINE, rel_tol=1e-5))
    if "2" in which:
        run_config("poisson3d_50_blr_gmres", 50,
                   dict(krylov_solver=KrylovSolver.PREC_GMRES,
                        compression=CompressionType.BLR, rel_tol=1e-4,
                        compression_min_sep_size=256), blr_tol=1e-4)
    if "3" in which:
        run_config("poisson3d_64_exact_split", 64,
                   dict(krylov_solver=KrylovSolver.REFINE, rel_tol=1e-5))


if __name__ == "__main__":
    main()
