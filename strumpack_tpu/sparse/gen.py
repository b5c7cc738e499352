"""Analytic test-matrix generators.

Role of the stencil builders inlined in the reference's examples
(``examples/sparse/testPoisson2d.cpp``, ``testPoisson3d.cpp:54-78``,
``testHelmholtz.cpp``): 5/7-point Poisson stencils on regular grids and a
complex Helmholtz operator, used both by tests and benchmarks so that no
external matrix downloads are required.
"""
from __future__ import annotations

import numpy as np

from .csr import CSRMatrix


def poisson2d(nx: int, ny: int | None = None, dtype=np.float64) -> CSRMatrix:
    """5-point 2D Laplacian on an nx x ny grid (natural ordering)."""
    if ny is None:
        ny = nx
    n = nx * ny
    idx = np.arange(n).reshape(nx, ny)
    rows, cols, vals = [], [], []

    def add(r, c, v):
        rows.append(r.ravel())
        cols.append(c.ravel())
        vals.append(np.full(r.size, v, dtype=dtype))

    add(idx, idx, 4.0)
    add(idx[1:, :], idx[:-1, :], -1.0)
    add(idx[:-1, :], idx[1:, :], -1.0)
    add(idx[:, 1:], idx[:, :-1], -1.0)
    add(idx[:, :-1], idx[:, 1:], -1.0)
    return CSRMatrix.from_coo(n, np.concatenate(rows), np.concatenate(cols),
                              np.concatenate(vals))


def poisson3d(nx: int, ny: int | None = None, nz: int | None = None,
              dtype=np.float64) -> CSRMatrix:
    """7-point 3D Laplacian on an nx x ny x nz grid."""
    if ny is None:
        ny = nx
    if nz is None:
        nz = nx
    n = nx * ny * nz
    idx = np.arange(n).reshape(nx, ny, nz)
    rows, cols, vals = [], [], []

    def add(r, c, v):
        rows.append(r.ravel())
        cols.append(c.ravel())
        vals.append(np.full(r.size, v, dtype=dtype))

    add(idx, idx, 6.0)
    for ax in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(1, None)
        hi[ax] = slice(None, -1)
        add(idx[tuple(lo)], idx[tuple(hi)], -1.0)
        add(idx[tuple(hi)], idx[tuple(lo)], -1.0)
    return CSRMatrix.from_coo(n, np.concatenate(rows), np.concatenate(cols),
                              np.concatenate(vals))


def helmholtz3d(nx: int, k0: float = 10.0, dtype=np.complex128) -> CSRMatrix:
    """Complex 3D Helmholtz -lap - (k0^2 + i*eps) on nx^3 grid.

    Reference analog: examples/sparse/testHelmholtz.cpp (complex double,
    indefinite).  Damped to keep it invertible at small sizes.
    """
    A = poisson3d(nx, dtype=np.float64)
    h = 1.0 / (nx + 1)
    shift = (k0 * h) ** 2 + 1j * 0.05 * (k0 * h) ** 2
    S = A.to_scipy().astype(dtype)
    S = S - shift * __import__("scipy.sparse", fromlist=["eye"]).eye(
        A.n, dtype=dtype, format="csr")
    return CSRMatrix.from_scipy(S)


def random_spd(n: int, density: float = 0.02, seed: int = 0,
               dtype=np.float64) -> CSRMatrix:
    """Random sparse SPD matrix: B + B^T + diag shift (for SPD test set)."""
    rng = np.random.default_rng(seed)
    from scipy.sparse import random as sprandom, eye
    B = sprandom(n, n, density=density, random_state=rng, format="csr",
                 dtype=dtype)
    S = (B + B.T) * 0.5
    S = S + eye(n, dtype=dtype, format="csr") * (np.abs(S).sum(axis=1).max() + 1.0)
    return CSRMatrix.from_scipy(S.tocsr())
