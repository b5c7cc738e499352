"""Mesh-scaling harness on virtual CPU devices (or a real slice).

Runs the SPMD factor+solve on 1/2/4/8-device 'b' meshes for a fixed
problem (strong-scaling shape) and prints the work-model balance and
wall times.  On virtual CPU devices the TIMES are not TPU evidence —
the point is the harness, the collective pattern, and the modeled
replicated-work fraction; run on a real slice for ICI numbers.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/scaling_virtual.py [nx]
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from strumpack_tpu.parallel.dist import make_sharded_factor_solve
    from strumpack_tpu.parallel.spmd import choose_modes
    from strumpack_tpu.sparse.gen import poisson3d
    from strumpack_tpu.sparse.ordering.geometric import geometric_nd
    from strumpack_tpu.sparse.symbolic import symbolic_factorization
    from strumpack_tpu.frontal.plan import build_plan
    from strumpack_tpu.frontal.numeric import PlanDev

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    A = poisson3d(nx)
    perm, iperm, tree = geometric_nd(nx, nx, nx, leaf=8)
    Ap = A.permute(perm, iperm)
    upd = symbolic_factorization(Ap, tree)
    pdev = PlanDev(build_plan(Ap, tree, upd))
    b = Ap.spmv(np.ones(Ap.n)).astype(np.float32)

    ndev_all = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    base = None
    for nd in ndev_all:
        mesh = Mesh(np.array(jax.devices()[:nd]), ("b",))
        _, rep = choose_modes(pdev, mesh)
        fn = make_sharded_factor_solve(pdev, mesh, dtype=jnp.float32)
        x = np.asarray(fn(jnp.asarray(Ap.data, np.float32),
                          jnp.asarray(b)))       # compile + run
        t0 = time.perf_counter()
        for _ in range(3):
            x = fn(jnp.asarray(Ap.data, np.float32), jnp.asarray(b))
        np.asarray(x)
        dt = (time.perf_counter() - t0) / 3
        res = np.linalg.norm(Ap.spmv(np.asarray(x)) - b) / np.linalg.norm(b)
        if base is None:
            base = dt
        print(f"ndev={nd}: {dt*1e3:8.1f} ms/step  speedup {base/dt:4.2f}x  "
              f"replicated work {100*rep['replicated_frac']:.1f}%  "
              f"res {res:.1e}", flush=True)


if __name__ == "__main__":
    main()
