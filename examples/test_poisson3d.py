"""3D Poisson example (reference examples/sparse/testPoisson3d.cpp).

Usage: python examples/test_poisson3d.py [n] [--sp_compression blr ...]
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import strumpack_tpu as st
from strumpack_tpu.sparse.gen import poisson3d


def main(argv):
    n = int(argv[1]) if len(argv) > 1 and not argv[1].startswith("-") else 30
    opts = st.SPOptions(verbose=True)
    opts.set_from_command_line(argv)
    A = poisson3d(n)
    s = st.SparseSolver(opts)
    s.set_csr_matrix(A)
    s.reorder(n, n, n)
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    print(f"# COMPONENTWISE SCALED RESIDUAL = {A.max_scaled_residual(x, b):.6e}")
    return 0 if rc == st.ReturnCode.SUCCESS else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
