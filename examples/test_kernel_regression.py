"""Kernel ridge regression example
(reference examples/dense/testKernelRegression.cpp + STRUMPACKKernel)."""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from strumpack_tpu.kernel.kernel import KernelRegressionClassifier


def main():
    rng = np.random.default_rng(0)
    n = 1000
    X = rng.standard_normal((n, 4))
    y = (X[:, 0] * X[:, 1] + 0.3 * X[:, 2] > 0).astype(int)
    ntr = 800
    clf = KernelRegressionClassifier(h=1.0, lam=2.0, fmt="hss")
    clf.fit(X[:ntr], y[:ntr])
    print(f"# test accuracy = {clf.score(X[ntr:], y[ntr:]):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
