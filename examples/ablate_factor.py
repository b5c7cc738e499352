"""On-device ablation of the factorization phases (perf tool).

Times three whole-phase programs over the real plan's buckets on the chip:
  A: sparse assembly scatter-add only
  B: assembly + extend-add (block takes + one-hot MXU matmuls)
  C: the full factorization (assembly + extend-add + LU/trsm/Schur)
Differences give the per-component on-device cost, using the honest
fori-loop timing from PERF.md (each iteration data-dependent, one final
readback).  Usage: BENCH_NX=32 python examples/ablate_factor.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/strumpack_tpu_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from strumpack_tpu.sparse.gen import poisson3d
    from strumpack_tpu.sparse.ordering.geometric import geometric_nd
    from strumpack_tpu.sparse.symbolic import symbolic_factorization
    from strumpack_tpu.frontal.plan import build_plan
    from strumpack_tpu.frontal import numeric
    from strumpack_tpu.utils.sync import device_sync

    nx = int(os.environ.get("BENCH_NX", "32"))
    iters = int(os.environ.get("ABLATE_ITERS", "10"))
    A = poisson3d(nx)
    perm, iperm, tree = geometric_nd(nx, nx, nx, leaf=16)
    Ap = A.permute(perm, iperm)
    upd = symbolic_factorization(Ap, tree)
    plan = build_plan(Ap, tree, upd)
    pdev = numeric.PlanDev(plan)
    vals = jnp.asarray(Ap.data, jnp.float32)

    from strumpack_tpu.ops import trisolve as TS  # noqa: F401

    def phases(arrays, vals_in, mode):
        """mode 0: assembly only; 1: +extend-add; 2: full factor."""
        dtype = vals_in.dtype
        vals_ext = jnp.concatenate(
            [vals_in, jnp.array([0.0, 1.0], dtype=dtype)])
        acc = jnp.zeros((), dtype)
        cb_list = []
        for li, level in enumerate(pdev.levels):
            parts = []
            for bi, bd in enumerate(level):
                bp = bd.bp
                a = arrays[f"{li},{bi}"]
                F = jnp.zeros((bp.nf, bp.p, bp.p), dtype=dtype)
                F = F.at[a["asm_bidx"], a["asm_r"], a["asm_c"]].add(
                    vals_ext[a["asm_vidx"]])
                if mode >= 1:
                    if bd.has_L:
                        F = numeric._extend_add_blocks(
                            F, cb_list, a["posL"], bd.pairsL, a)
                    if bd.has_R:
                        F = numeric._extend_add_blocks(
                            F, cb_list, a["posR"], bd.pairsR, a)
                if mode == 2:
                    lu, perm_, L21, U12, CB = numeric._factor_bucket(
                        F, 0.0, bp.s_pad, pivoting=True)
                    acc = acc + jnp.sum(lu[:, 0, 0])
                else:
                    CB = F[:, bp.s_pad:, bp.s_pad:]
                    acc = acc + jnp.sum(F[:, 0, 0])
                parts.append(CB)
            cb_list = parts
        return acc

    for mode, name in ((0, "assembly"), (1, "assembly+extadd"),
                       (2, "full factor")):
        # statically unrolled repetition chained by data dependence —
        # lax loops are host-stepped through the remote tunnel (PERF.md),
        # so a fori_loop would measure tunnel latency, not compute
        def loop(arrays, vals_in, n_it):
            carry = jnp.zeros((), jnp.float32)
            for _ in range(n_it):
                carry = phases(arrays, vals_in + carry * 0.0, mode)
            return carry

        fn = jax.jit(loop, static_argnames=("n_it",))
        with jax.default_matmul_precision("float32"):
            r = fn(pdev.arrays, vals, 1)   # compile + warm single
            device_sync(r)
            r = fn(pdev.arrays, vals, iters)   # compile the unrolled chain
            device_sync(r)
            t0 = time.perf_counter()
            r = fn(pdev.arrays, vals, iters)
            device_sync(r)
            t_n = time.perf_counter() - t0
            t0 = time.perf_counter()
            r = fn(pdev.arrays, vals, 1)
            device_sync(r)
            t_1 = time.perf_counter() - t0
        # subtract the single-dispatch wall (tunnel latency) baseline
        dt = (t_n - t_1) / max(iters - 1, 1)
        print(f"{name}: {dt*1e3:.2f} ms/iter on-device "
              f"(1-dispatch wall {t_1*1e3:.0f} ms, {iters}x chain "
              f"{t_n*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
