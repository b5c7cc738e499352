"""Benchmark: multifrontal factorization throughput on one TPU chip.

BASELINE.md config 1/2 analog: 3D Poisson exact multifrontal LU (f32 factor
+ iterative refinement).  Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline compares the achieved factorization GFlop/s against SuiteSparse-
class host performance measured in-process (scipy SuperLU factoring the same
matrix, credited with our exact multifrontal flop count — the reference
publishes no numbers of its own, see BASELINE.md).
"""
import json
import os
import sys
import time

import numpy as np


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
    nx = int(os.environ.get("BENCH_NX", "32"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from strumpack_tpu import SparseSolver, SPOptions, KrylovSolver
    from strumpack_tpu.sparse.gen import poisson3d

    A = poisson3d(nx)
    opts = SPOptions(factor_dtype="float32", refine_dtype="float32",
                     rel_tol=1e-5, krylov_solver=KrylovSolver.REFINE,
                     nd_leaf=16)
    s = SparseSolver(opts)
    s.set_csr_matrix(A)
    t0 = time.perf_counter()
    s.reorder(nx, nx, nx)
    t_reorder = time.perf_counter() - t0
    s.factor()  # compile + first factor
    t_first = s.times["factor"]

    # steady-state factor: N data-dependent factorizations chained inside
    # ONE program, timed around a single host readback — the chip's real
    # per-factorization compute time (block_until_ready on this platform
    # acknowledges dispatch, not completion; and a per-dispatch loop would
    # measure the ~60-100 ms tunnel round-trip, see PERF.md).
    from strumpack_tpu.frontal import numeric
    import jax as _jax
    import jax.numpy as jnp
    from strumpack_tpu.utils.sync import device_sync
    vals = s.Ap.data.astype(np.float32)
    nbuckets = sum(len(l) for l in s.pdev.levels)
    t_factor = None
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
            reps = int(os.environ.get("BENCH_REPS", "5"))
            with _jax.default_matmul_precision(opts.matmul_precision):
                device_sync(fn(s.pdev.arrays, vals, 1))
                device_sync(fn(s.pdev.arrays, vals, reps))
                t0 = time.perf_counter()
                device_sync(fn(s.pdev.arrays, vals, reps))
                tn = time.perf_counter() - t0
                t0 = time.perf_counter()
                device_sync(fn(s.pdev.arrays, vals, 1))
                t1 = time.perf_counter() - t0
            t_factor = (tn - t1) / max(reps - 1, 1)
        except Exception as e:
            print(f"# chained timing unavailable ({type(e).__name__}); "
                  "falling back to per-dispatch walls", file=sys.stderr)
    if t_factor is None or t_factor <= 0:
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            fac = numeric.factorize(s.pdev, vals,
                                    matmul_precision=opts.matmul_precision)
            device_sync(fac.tree)
        t_factor = (time.perf_counter() - t0) / reps
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

    # host SuperLU baseline on the same matrix, credited with our flops
    from scipy.sparse.linalg import splu
    S = A.to_scipy().tocsc()
    t0 = time.perf_counter()
    lu = splu(S)
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
    }))


def main_with_retry():
    """Run the measurement in a child process and retry on tunnel/device
    hiccups (the remote-attached chip occasionally drops a dispatch; a
    fresh process re-establishes the backend cleanly).  The child prints
    the JSON line; the parent forwards the last one seen."""
    import subprocess
    if os.environ.get("STRUMPACK_BENCH_CHILD"):
        return main()
    env = dict(os.environ, STRUMPACK_BENCH_CHILD="1")
    last_err = None
    for attempt in range(3):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=3000)
        except subprocess.TimeoutExpired as e:
            last_err = f"timeout: {e}"
            continue
        sys.stderr.write(out.stderr[-4000:])
        lines = [l for l in out.stdout.splitlines()
                 if l.startswith("{") and '"metric"' in l]
        if out.returncode == 0 and lines:
            print(lines[-1])
            return
        last_err = f"rc={out.returncode} stdout={out.stdout[-500:]}"
        time.sleep(10)
    raise SystemExit(f"bench failed after retries: {last_err}")


if __name__ == "__main__":
    main_with_retry()
