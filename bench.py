"""Benchmark: multifrontal factorization throughput on one TPU chip.

Measures the BASELINE.md configs and prints one JSON line per metric
(`{"metric", "value", "unit", "vs_baseline"}`), the HEADLINE 32^3 exact-LU
line LAST:

  poisson3d_64_factor_gflops   64^3 exact f32 LU, split-program mode
  poisson3d_50_blr_factor_seconds   50^3 BLR tol 1e-4 + GMRES (config 2)
  poisson3d_32_factor_gflops   32^3 exact f32 LU (headline)

vs_baseline compares the achieved factorization GFlop/s against
SuiteSparse-class host performance measured in-process: scipy SuperLU
factoring the same 32^3 matrix, credited with our exact multifrontal flop
count (the reference publishes no numbers of its own, see BASELINE.md).
The 64^3/BLR extras reuse the 32^3-measured SuperLU rate (SuperLU at 64^3
takes ~18 min — measured once at 1081 s, PERF.md — so re-measuring it
every bench run would dwarf the benchmark itself).

Each config runs in its own child process (a fresh process re-establishes
the tunnel-attached backend cleanly after a dropped dispatch) under a
total time budget (BENCH_BUDGET_S, default 2400 s): the headline config
always runs; extras are skipped, not failed, when over budget.
"""
import json
import os
import sys
import time

import numpy as np


def _steady_factor_time(s, opts, vals):
    """Steady-state factor time.  Whole-program plans: N data-dependent
    factorizations chained inside ONE jitted program, timed around a
    single host readback (block_until_ready on this platform acknowledges
    dispatch, not completion; a per-dispatch loop would measure the
    ~60-100 ms tunnel round-trip — PERF.md).  Split-program plans: best
    of three per-dispatch walls with a device sync."""
    from strumpack_tpu.frontal import numeric
    import jax as _jax
    import jax.numpy as jnp
    from strumpack_tpu.utils.sync import device_sync
    nbuckets = sum(len(l) for l in s.pdev.levels)
    if nbuckets <= numeric.SPLIT_SOLVE_BUCKETS:
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
            fn = _jax.jit(loop, static_argnames=("n_it",))
            reps = int(os.environ.get("BENCH_REPS", "11"))
            best = None
            with _jax.default_matmul_precision(opts.matmul_precision):
                device_sync(fn(s.pdev.arrays, vals, 1))
                device_sync(fn(s.pdev.arrays, vals, reps))
                for _ in range(2):     # best-of-2 chained measurements
                    t0 = time.perf_counter()
                    device_sync(fn(s.pdev.arrays, vals, reps))
                    tn = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    device_sync(fn(s.pdev.arrays, vals, 1))
                    t1 = time.perf_counter() - t0
                    est = (tn - t1) / max(reps - 1, 1)
                    best = est if best is None else min(best, est)
            if best and best > 0:
                return best
        except Exception as e:
            print(f"# chained timing unavailable ({type(e).__name__}); "
                  "falling back to per-dispatch walls", file=sys.stderr)
    from strumpack_tpu.frontal import numeric as _n
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        fac = _n.factorize(s.pdev, vals,
                           matmul_precision=opts.matmul_precision)
        device_sync(fac.tree)
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    return best


def _build(nx, blr=False):
    from strumpack_tpu import SparseSolver, SPOptions, KrylovSolver
    from strumpack_tpu.sparse.gen import poisson3d
    A = poisson3d(nx)
    if blr:
        from strumpack_tpu.options import CompressionType
        opts = SPOptions(factor_dtype="float32", refine_dtype="float32",
                         rel_tol=1e-4, krylov_solver=KrylovSolver.PREC_GMRES,
                         compression=CompressionType.BLR,
                         compression_min_sep_size=128, nd_leaf=16)
        opts.blr.rel_tol = 1e-4
    else:
        opts = SPOptions(factor_dtype="float32", refine_dtype="float32",
                         rel_tol=1e-5, krylov_solver=KrylovSolver.REFINE,
                         nd_leaf=16)
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    t0 = time.perf_counter()
    s.reorder(nx, nx, nx)
    t_reorder = time.perf_counter() - t0
    return A, s, opts, t_reorder


def main():
    import jax
    cache = os.environ.get("JAX_CACHE_DIR",
                           os.path.expanduser("~/.cache/strumpack_tpu_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    config = os.environ.get("BENCH_CONFIG", "exact32")
    from strumpack_tpu.utils.sync import device_sync  # noqa: F401

    if config == "exact32":
        nx = int(os.environ.get("BENCH_NX", "32"))
        A, s, opts, t_reorder = _build(nx)
        s.factor()
        t_first = s.times["factor"]
        vals = s.Ap.data.astype(np.float32)
        t_factor = _steady_factor_time(s, opts, vals)
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

        from scipy.sparse.linalg import splu
        S = A.to_scipy().tocsc()
        t0 = time.perf_counter()
        splu(S)
        t_superlu = time.perf_counter() - t0
        gflops_superlu = flops / t_superlu / 1e9

        print(f"# n={A.n} nnz={A.nnz} factor_nnz={s.factor_nonzeros()} "
              f"flops={flops:.3g} reorder={t_reorder:.2f}s "
              f"factor_first={t_first:.2f}s factor={t_factor:.4f}s "
              f"solve={t_solve:.4f}s its={s.its} residual={res:.2e} "
              f"superlu={t_superlu:.3f}s tpu={on_tpu}", file=sys.stderr)
        print(json.dumps({
            "metric": f"poisson3d_{nx}_factor_gflops",
            "value": round(gflops, 3),
            "unit": "GFlop/s",
            "vs_baseline": round(gflops / gflops_superlu, 3),
            "superlu_gflops": round(gflops_superlu, 4),
        }))
        return

    superlu_gflops = float(os.environ.get("BENCH_SUPERLU_GFLOPS", "0") or 0)

    if config == "exact64":
        nx = 64
        A, s, opts, t_reorder = _build(nx)
        s.factor()
        t_first = s.times["factor"]
        vals = s.Ap.data.astype(np.float32)
        t_factor = _steady_factor_time(s, opts, vals)
        flops = s.factor_flops()
        gflops = flops / t_factor / 1e9
        b = A.spmv(np.ones(A.n))
        x, rc = s.solve(b)
        res = A.max_scaled_residual(x, b)
        print(f"# 64^3 n={A.n} reorder={t_reorder:.2f}s "
              f"factor_first={t_first:.2f}s factor={t_factor:.4f}s "
              f"residual={res:.2e}", file=sys.stderr)
        print(json.dumps({
            "metric": "poisson3d_64_factor_gflops",
            "value": round(gflops, 3),
            "unit": "GFlop/s",
            "vs_baseline": round(gflops / superlu_gflops, 3)
            if superlu_gflops else 0.0,
        }))
        return

    if config == "blr50":
        nx = 50
        A, s, opts, t_reorder = _build(nx, blr=True)
        s.factor()
        t_first = s.times["factor"]
        # steady factor: refactor with the programs warm
        s._factored = False
        s.factor()
        t_factor = s.times["factor"]
        b = A.spmv(np.ones(A.n))
        x, rc = s.solve(b)       # first call pays the GMRES compile
        x, rc = s.solve(b)
        t_solve = s.times["solve"]
        res = A.max_scaled_residual(x, b)
        dense_flops = s.plan.factor_flops
        print(f"# 50^3 BLR n={A.n} reorder={t_reorder:.2f}s "
              f"factor_first={t_first:.2f}s factor={t_factor:.4f}s "
              f"solve={t_solve:.4f}s its={s.its} residual={res:.2e}",
              file=sys.stderr)
        vsb = ((dense_flops / t_factor / 1e9) / superlu_gflops
               if superlu_gflops else 0.0)
        print(json.dumps({
            "metric": "poisson3d_50_blr_factor_seconds",
            "value": round(t_factor, 4),
            "unit": "s",
            # dense-equivalent GFlop/s vs the host SuperLU rate
            "vs_baseline": round(vsb, 3),
        }))
        return

    raise SystemExit(f"unknown BENCH_CONFIG {config}")


def _run_child(config, timeout, env_extra=None):
    import subprocess
    env = dict(os.environ, STRUMPACK_BENCH_CHILD="1", BENCH_CONFIG=config)
    if env_extra:
        env.update(env_extra)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout)
    except Exception as e:  # TimeoutExpired etc.
        return None, f"{type(e).__name__}: {e}"
    sys.stderr.write(out.stderr[-4000:])
    lines = [l for l in out.stdout.splitlines()
             if l.startswith("{") and '"metric"' in l]
    if out.returncode == 0 and lines:
        return json.loads(lines[-1]), None
    return None, f"rc={out.returncode} stdout={out.stdout[-500:]}"


def main_with_retry():
    """Run each config in a child process (retrying the headline on
    tunnel/device hiccups), print extras first and the headline LAST."""
    if os.environ.get("STRUMPACK_BENCH_CHILD"):
        return main()
    budget = float(os.environ.get("BENCH_BUDGET_S", "2400"))
    t_start = time.perf_counter()

    headline, last_err = None, None
    for attempt in range(3):
        headline, last_err = _run_child("exact32", timeout=1800)
        if headline is not None:
            break
        time.sleep(10)
    if headline is None:
        raise SystemExit(f"bench failed after retries: {last_err}")
    superlu = headline.pop("superlu_gflops", 0)
    extra_env = {"BENCH_SUPERLU_GFLOPS": str(superlu)}

    extras = []
    for config in ("exact64", "blr50"):
        remaining = budget - (time.perf_counter() - t_start)
        if remaining < 300:
            print(f"# skipping {config}: bench budget exhausted "
                  f"({remaining:.0f}s left)", file=sys.stderr)
            continue
        line, err = _run_child(config, timeout=min(remaining, 2400),
                               env_extra=extra_env)
        if line is not None:
            extras.append(line)
        else:
            print(f"# {config} failed: {err}", file=sys.stderr)

    for line in extras:
        print(json.dumps(line))
    print(json.dumps(headline))


if __name__ == "__main__":
    main_with_retry()
