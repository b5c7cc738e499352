"""HODBF direct factorization example (testStructured analog for the
HODBF type — reference examples/dense/testStructured.cpp with
--structured_type HODBF, HODLRWrapper.cpp bpack_factor/bpack_solve).

Compresses an oscillatory operator whose plain-HODLR off-diagonal ranks
blow up, factors it DIRECTLY with the randomized butterfly-algebra
sweep (structured/hodbf.py), and solves with no outer Krylov iterations.

Run: python examples/test_hodbf_direct.py [m]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np

try:  # CPU: f64 + cheap host SVDs; the sparse HODBF fronts run on TPU
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp                                    # noqa: E402

from strumpack_tpu.structured.structured import (          # noqa: E402
    StructuredOptions, Type, construct_from_dense)


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rng = np.random.default_rng(1)
    j = np.arange(m)
    # oscillatory off-diagonal field + dominant diagonal (1D Helmholtz
    # character): full-rank-per-block but complementary-low-rank
    A = (np.cos(2 * np.pi * np.outer(j, j) / m) / 8.0
         + np.eye(m) * (4.0 + 0.1 * rng.standard_normal(m)))

    opts = StructuredOptions(type=Type.HODBF, rel_tol=1e-8,
                             max_rank=48, leaf_size=32)
    S = construct_from_dense(A, opts)
    x = rng.standard_normal(m)
    relc = (np.linalg.norm(np.asarray(S.mult(x)) - A @ x)
            / np.linalg.norm(A @ x))
    # NOTE: butterfly storage beats dense only once m/rank is large
    # (O(r m log m) vs m^2) — this toy size demonstrates capability,
    # not compression
    print(f"# HODBF m={m} rank={S.rank()} mem={S.memory()} entries "
          f"compress rel err {relc:.2e}")

    S.factor()          # TRUE direct factorization (bpack_factor role)
    b = A @ x
    xs = np.asarray(S.solve(jnp.asarray(b)))
    rel = np.linalg.norm(xs - x) / np.linalg.norm(x)
    its = S.h.iterations
    print(f"# direct solve rel err {rel:.2e}  IR sweeps {its} "
          f"(no outer Krylov)")
    assert rel < 1e-5 and its <= 2, (rel, its)
    print("# OK")


if __name__ == "__main__":
    main()
