"""On-device comparison of extend-add formulations (perf tool).

Variants, per (nf, p, u) bucket shape:
  onehot — current production path: block take of child CBs + one-hot
           selection matmuls F += T C T^t on the MXU (2 p*u*(p+u) flops)
  gather — two row gathers (take_along_axis over sublanes) + transposes:
           F += C[pos_i, pos_j] with O(p^2) data movement, no flops
Usage: python examples/ablate_extadd.py
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
    from strumpack_tpu.utils.sync import device_sync

    iters = int(os.environ.get("ABLATE_ITERS", "30"))
    # (nf, p, u_child): parent [nf, p, p] += child CB [nf, u, u] scatter
    shapes = [(2, 1536, 1024), (4, 1280, 1024), (8, 1024, 768),
              (8, 896, 768), (32, 576, 512), (512, 80, 64)]
    rng = np.random.default_rng(0)

    def run(label, fn, *args):
        def loop(n_it, *args):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(n_it):
                acc = acc + fn(*args, acc)
            return acc
        jl = jax.jit(loop, static_argnames=("n_it",))
        with jax.default_matmul_precision("float32"):
            device_sync(jl(1, *args))
            device_sync(jl(iters, *args))
            t0 = time.perf_counter(); device_sync(jl(iters, *args))
            tn = time.perf_counter() - t0
            t0 = time.perf_counter(); device_sync(jl(1, *args))
            t1 = time.perf_counter() - t0
        dt = (tn - t1) / max(iters - 1, 1)
        print(f"  {label}: {dt*1e3:7.2f} ms/iter", flush=True)
        return dt

    for nf, p, u in shapes:
        C = jnp.asarray(rng.standard_normal((nf, u, u)).astype(np.float32))
        F0 = jnp.asarray(rng.standard_normal((nf, p, p)).astype(np.float32))
        # realistic pos: sorted random subset of parent slots mapping into
        # child upd indices; ~60% of parent slots valid
        pos_np = np.full((nf, p), -1, np.int32)
        for f in range(nf):
            k = min(u, int(0.6 * p))
            slots = np.sort(rng.choice(p, size=k, replace=False))
            pos_np[f, slots] = np.arange(k) % u
        pos = jnp.asarray(pos_np)
        fl = 4 * nf * p * u * (p + u) / 1e9

        def onehot(C, F0, pos, acc):
            ii = jnp.arange(u, dtype=pos.dtype)
            T = (pos[:, :, None] == ii[None, None, :]).astype(jnp.float32)
            CT = jnp.matmul(C + acc * 0.0, T.transpose(0, 2, 1),
                            preferred_element_type=jnp.float32)
            F = F0 + jnp.matmul(T, CT, preferred_element_type=jnp.float32)
            return jnp.sum(F)   # consume ALL of F (defeat DCE)

        def gather(C, F0, pos, acc):
            valid = pos >= 0
            pc = jnp.clip(pos, 0, u - 1)[:, :, None]
            C1 = jnp.take_along_axis(C + acc * 0.0,
                                     jnp.minimum(pc, u - 1), axis=1)
            C1 = jnp.where(valid[:, :, None], C1, 0.0)     # [nf, p, u]
            C3 = jnp.take_along_axis(C1.transpose(0, 2, 1), pc, axis=1)
            C3 = jnp.where(valid[:, :, None], C3, 0.0)     # [nf, p, p]
            F = F0 + C3.transpose(0, 2, 1)
            return jnp.sum(F)   # consume ALL of F (defeat DCE)

        print(f"shape nf={nf} p={p} u={u} (one-hot {fl:.2f} GFlop):",
              flush=True)
        t1 = run("onehot", onehot, C, F0, pos)
        t2 = run("gather", gather, C, F0, pos)
        # fused Pallas window-matmul kernel (production TPU default)
        from strumpack_tpu.ops import pallas_extadd as EA
        t3 = None
        if EA._supports(p, u, np.float32):
            pre = EA.precompute_windows(pos_np,
                                        np.arange(nf, dtype=np.int32), u)
            if pre is not None:
                pos_m = jnp.asarray(pre[0])
                clo = jnp.asarray(pre[1])
                idxa = jnp.asarray(np.arange(nf, dtype=np.int32))

                def pallas(C, F0, pos, acc):
                    F = EA.extend_add_pallas(F0, C + acc * 0.0, idxa,
                                             pos_m, clo)
                    return jnp.sum(F)

                t3 = run("pallas", pallas, C, F0, pos)
        best = min(x for x in (t2, t3) if x is not None)
        print(f"  -> onehot/gather {t1/t2:.2f}x"
              + (f", gather/pallas {t2/t3:.2f}x" if t3 else ""),
              flush=True)


if __name__ == "__main__":
    main()
