"""Distributed 3D Poisson example
(reference examples/sparse/testPoisson3dMPIDist.cpp).

Runs the DistributedSparseSolver over a (b, r, c) device mesh.  On a
single host it uses all local devices (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu to
emulate a slice); under jax.distributed (multi-host) launch one process
per host with STPU_COORD=host:port STPU_NPROCS=k STPU_PROC=i set — the
same SPMD program then spans all hosts (DCN between, ICI within).

Usage: python examples/test_poisson3d_dist.py [n] [--sp_* flags]
"""
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv):
    import jax
    # jax may be preloaded with another platform pinned; honor the env var
    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    if os.environ.get("STPU_COORD"):
        jax.distributed.initialize(
            coordinator_address=os.environ["STPU_COORD"],
            num_processes=int(os.environ["STPU_NPROCS"]),
            process_id=int(os.environ["STPU_PROC"]))
    from jax.sharding import Mesh
    import strumpack_tpu as st
    from strumpack_tpu.parallel.driver import DistributedSparseSolver
    from strumpack_tpu.sparse.gen import poisson3d

    n = int(argv[1]) if len(argv) > 1 and not argv[1].startswith("-") else 20
    opts = st.SPOptions(verbose=True,
                        krylov_solver=st.KrylovSolver.DIRECT)
    opts.set_from_command_line(argv)

    devs = np.array(jax.devices())
    nd = len(devs)
    # (b, r, c): front-batch axis x 2D grid for the root front
    r = 1
    while (r * 2) ** 2 <= nd and nd % ((r * 2) ** 2) == 0:
        r *= 2
    mesh = Mesh(devs.reshape(nd // (r * r), r, r), ("b", "r", "c"))
    print(f"# mesh {dict(zip(mesh.axis_names, mesh.devices.shape))} over "
          f"{jax.process_count()} process(es)")

    A = poisson3d(n)
    s = DistributedSparseSolver(mesh, opts)
    s.set_csr_matrix(A)
    s.reorder(n, n, n)
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    res = A.max_scaled_residual(x, b)
    print(f"# COMPONENTWISE SCALED RESIDUAL = {res:.6e}")
    return 0 if rc == st.ReturnCode.SUCCESS else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
