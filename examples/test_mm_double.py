"""Solve a MatrixMarket system (reference examples/sparse/testMMdouble.cpp).

Usage: python examples/test_mm_double.py matrix.mtx [--sp_* options...]
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import strumpack_tpu as st


def main(argv):
    if len(argv) < 2:
        print("usage: test_mm_double.py matrix.mtx [--sp_* ...]")
        return 1
    opts = st.SPOptions(verbose=True)
    opts.set_from_command_line(argv[2:])
    A = st.CSRMatrix.from_matrix_market(argv[1])
    s = st.SparseSolver(opts)
    s.set_csr_matrix(A)
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n)
    b = A.spmv(xex)
    x, rc = s.solve(b)
    print(f"# COMPONENTWISE SCALED RESIDUAL = {A.max_scaled_residual(x, b):.6e}")
    return 0 if rc == st.ReturnCode.SUCCESS else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
