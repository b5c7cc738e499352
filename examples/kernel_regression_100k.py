"""Matrix-free kernel ridge regression at n=100k on one TPU chip.

The dense kernel matrix would be 40 GB (f32) — this path never builds it:
HSS compression consumes a row-tiled matvec closure (peak extra memory
one [block, n] kernel panel) + per-entry evaluations (the reference's
HSS/HSSMatrix.compress_kernel.hpp role).  Usage:

    python examples/kernel_regression_100k.py [n] [block]
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    from strumpack_tpu.kernel.kernel import GaussKernel

    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, 2))
    y = np.sin(X[:, 0]) + 0.5 * np.cos(2.0 * X[:, 1]) \
        + 0.05 * rng.standard_normal(n)

    k = GaussKernel(h=1.0, lam=2.0)
    t0 = time.perf_counter()
    k._fit(X, y, "hss", leaf_size=256, max_rank=128, rel_tol=1e-5,
           cluster_leaf=128, matrix_free=True)
    t_fit = time.perf_counter() - t0
    t0 = time.perf_counter()
    p = k.predict(X[:2000])
    t_pred = time.perf_counter() - t0
    err = np.linalg.norm(p - y[:2000]) / np.linalg.norm(y[:2000])
    mem = k._M.memory() / 1e6
    print(f"n={n} fit={t_fit:.1f}s predict(2000)={t_pred:.2f}s "
          f"rel_err={err:.3f} hss_mem={mem:.0f}MB "
          f"(dense K would be {n*n*4/1e9:.1f} GB)")


if __name__ == "__main__":
    main()
