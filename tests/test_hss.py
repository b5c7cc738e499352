"""HSS matrix tests.

Model: the reference's test_HSS_seq.cpp — compress generator-defined
matrices (Toeplitz/Laplace/kernel), check matvec and ULV-solve accuracy
against the dense operator across leaf sizes and tolerances.
"""
import numpy as np
import pytest

from strumpack_tpu.structured.hss import HSSMatrix


def cauchy_kernel(m, seed=0, diag=50.0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 1, m))
    K = 1.0 / (0.05 + np.abs(x[:, None] - x[None, :]))
    return K + np.eye(m) * diag


def toeplitz(m):
    """The reference's 'T' generator: a_ij = 1/(1+|i-j|) + diag."""
    i = np.arange(m)
    return 1.0 / (1.0 + np.abs(i[:, None] - i[None, :])) + 4.0 * np.eye(m)


@pytest.mark.parametrize("m", [256, 300, 512])
def test_hss_matvec_and_solve(m):
    A = cauchy_kernel(m)
    H = HSSMatrix(A, leaf_size=32, max_rank=24, rel_tol=1e-9)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(m)
    y = np.asarray(H.matvec(x))
    assert np.linalg.norm(y - A @ x) / np.linalg.norm(A @ x) < 1e-7
    b = A @ x
    xs = np.asarray(H.solve(b))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-6


def test_hss_toeplitz():
    m = 384
    A = toeplitz(m)
    H = HSSMatrix(A, leaf_size=64, max_rank=40, rel_tol=1e-10)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((m, 3))
    y = np.asarray(H.matvec(x))
    assert np.linalg.norm(y - A @ x) / np.linalg.norm(A @ x) < 1e-8
    xs = np.asarray(H.solve(A @ x))
    assert np.linalg.norm(xs - x) / np.linalg.norm(x) < 1e-7


def test_hss_compression_rank_tracks_tolerance():
    A = cauchy_kernel(512)
    loose = HSSMatrix(A, leaf_size=64, max_rank=48, rel_tol=1e-2)
    tight = HSSMatrix(A, leaf_size=64, max_rank=48, rel_tol=1e-10)
    assert loose.max_rank() <= tight.max_rank()
    assert loose.memory() < 512 * 512  # actually compresses


def test_hss_exact_on_low_rank_plus_diag():
    rng = np.random.default_rng(3)
    m = 256
    G = rng.standard_normal((m, 5))
    A = G @ G.T + np.eye(m) * 100.0
    H = HSSMatrix(A, leaf_size=32, max_rank=16, rel_tol=1e-12)
    assert H.max_rank() <= 8
    x = rng.standard_normal(m)
    assert np.linalg.norm(np.asarray(H.solve(A @ x)) - x) < 1e-8
