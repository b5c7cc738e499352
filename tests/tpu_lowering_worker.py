"""Subprocess worker: lower (and optionally compile) the full factorization
program — every Pallas kernel at its real bucket shapes — for the REAL TPU
backend.

Run by tests/test_tpu_lowering.py in a fresh process with the launch
platform restored (the in-process suite pins JAX_PLATFORMS=cpu).  Exit 42 =
no TPU available (test skips).  Interpret-mode kernel tests bypass Mosaic's
block-mapping and layout checks entirely — round 1 shipped a kernel that
passed every interpret test and failed to lower on hardware
(BENCH_r01.json); this worker is the regression gate for that class of bug.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if jax.default_backend() == "cpu":
        return 42

    import jax.numpy as jnp
    import numpy as np
    from strumpack_tpu import SparseSolver, SPOptions
    from strumpack_tpu.frontal import numeric
    from strumpack_tpu.sparse.gen import poisson3d

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
    if os.environ.get("STRUMPACK_LOWER_COMPILE", "1") == "1":
        # Full Mosaic compile through the backend; persistent cache makes
        # repeat runs cheap.
        cache = os.environ.get(
            "JAX_CACHE_DIR", os.path.expanduser("~/.cache/strumpack_tpu_jax"))
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
        lowered.compile()
        print("compiled OK (Mosaic kernel compilation passed)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
