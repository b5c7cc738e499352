"""2D Poisson example driver (reference examples/sparse/testPoisson2d.cpp).

Usage: python examples/test_poisson2d.py [n] [--sp_* options...]
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import strumpack_tpu as st
from strumpack_tpu.sparse.gen import poisson2d


def main(argv):
    n = int(argv[1]) if len(argv) > 1 and not argv[1].startswith("-") else 100
    opts = st.SPOptions(verbose=True)
    opts.set_from_command_line(argv)
    A = poisson2d(n)
    s = st.SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder(n, n)
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    res = A.max_scaled_residual(x, b)
    err = np.linalg.norm(x - xex) / np.linalg.norm(xex)
    print(f"# COMPONENTWISE SCALED RESIDUAL = {res:.6e}")
    print(f"# relative error = {err:.6e}")
    return 0 if rc == st.ReturnCode.SUCCESS else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
