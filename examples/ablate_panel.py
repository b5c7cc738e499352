"""On-device ablation of the blocked panel LU (perf tool).

Times blocked_factor_bucket variants on the dominant bucket shapes of the
32^3 Poisson plan, isolating: full path, no-pivot (drops the row-permute
gather + in-kernel search), and panel-kernel-only (no inter-panel MXU
work).  Honest timing: unrolled data-dependent chain, one readback.
Usage: python examples/ablate_panel.py
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
    from strumpack_tpu.ops.pallas_panel_lu import (blocked_factor_bucket,
                                                   pallas_panel_lu)
    from strumpack_tpu.utils.sync import device_sync

    iters = int(os.environ.get("ABLATE_ITERS", "8"))
    shapes = [(2, 512, 1536), (8, 256, 1024), (4, 256, 1280),
              (8, 128, 896), (32, 64, 576)]

    rng = np.random.default_rng(0)

    def run(label, fn, F):
        def loop(F, n_it):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(n_it):
                acc = acc + fn(F + acc * 0.0)
            return acc
        jl = jax.jit(loop, static_argnames=("n_it",))
        with jax.default_matmul_precision("float32"):
            device_sync(jl(F, 1))
            device_sync(jl(F, iters))
            t0 = time.perf_counter(); device_sync(jl(F, iters))
            tn = time.perf_counter() - t0
            t0 = time.perf_counter(); device_sync(jl(F, 1))
            t1 = time.perf_counter() - t0
        dt = (tn - t1) / max(iters - 1, 1)
        print(f"  {label}: {dt*1e3:7.2f} ms/iter", flush=True)
        return dt

    for nf, s, p in shapes:
        F = jnp.asarray(
            rng.standard_normal((nf, p, p)).astype(np.float32)
            + p * np.eye(p, dtype=np.float32))
        flops = nf * (s * s * (3 * p - s) / 3 + 2 * (p - s) ** 2 * s) / 1e9
        print(f"bucket nf={nf} s={s} p={p} (~{flops:.2f} GFlop):",
              flush=True)

        def full(F, s=s):
            lu, perm, L21, U12, CB = blocked_factor_bucket(F, 0.0, s)
            return jnp.sum(lu[:, 0, 0]) + jnp.sum(CB[:, 0, 0])
        t_full = run("full pivoted", full, F)

        def nopiv(F, s=s):
            lu, perm, L21, U12, CB = blocked_factor_bucket(
                F, 0.0, s, pivoting=False)
            return jnp.sum(lu[:, 0, 0]) + jnp.sum(CB[:, 0, 0])
        t_np = run("no-pivot    ", nopiv, F)

        def panels_only(F, s=s, p=p):
            acc = jnp.zeros((), jnp.float32)
            jb = 0
            while jb < s:
                w = min(128, s - jb)
                pan = jax.lax.dynamic_slice_in_dim(F, jb, w, axis=2)
                pan, pr = pallas_panel_lu(pan, 0.0, row0=jb, w=w, slim=s)
                acc = acc + jnp.sum(pan[:, 0, 0])
                jb += w
            return acc
        t_pan = run("panel krnls ", panels_only, F)
        print(f"  -> gather+search cost ~{(t_full-t_np)*1e3:.2f} ms, "
              f"inter-panel MXU ~{max(t_np-t_pan,0)*1e3:.2f} ms, "
              f"eff {flops/t_full:.0f} GF/s", flush=True)


if __name__ == "__main__":
    main()
