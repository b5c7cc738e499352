"""RRQR-with-tolerance kernel (geqp3tol role, ops/rrqr.py)."""
import numpy as np
import jax.numpy as jnp

from strumpack_tpu.ops.rrqr import rrqr


def _lowrank(m, n, k, rng, dtype=np.float64):
    A = rng.standard_normal((m, k)).astype(dtype)
    B = rng.standard_normal((k, n)).astype(dtype)
    if np.issubdtype(dtype, np.complexfloating):
        A = A + 1j * rng.standard_normal((m, k))
        B = B + 1j * rng.standard_normal((k, n))
    return A @ B


def test_rrqr_exact_rank_detection():
    rng = np.random.default_rng(0)
    T = _lowrank(48, 48, 7, rng)
    U, V, ranks = rrqr(jnp.asarray(T), 1e-10, 24)
    assert int(ranks) == 7
    err = np.linalg.norm(np.asarray(U @ V) - T) / np.linalg.norm(T)
    assert err < 1e-12


def test_rrqr_tolerance_truncation():
    rng = np.random.default_rng(1)
    m = 64
    Q1, _ = np.linalg.qr(rng.standard_normal((m, m)))
    Q2, _ = np.linalg.qr(rng.standard_normal((m, m)))
    s = 10.0 ** -np.arange(m, dtype=np.float64)
    T = (Q1 * s) @ Q2
    for tol in (1e-2, 1e-4, 1e-6):
        U, V, ranks = rrqr(jnp.asarray(T), tol, 48)
        err = np.linalg.norm(np.asarray(U @ V) - T, 2) / np.abs(s[0])
        assert err < 10 * tol, (tol, err)
        # rank should be near the tolerance cut, not wildly padded
        assert int(ranks) <= int(-np.log10(tol)) + 3


def test_rrqr_batched_mixed_ranks():
    rng = np.random.default_rng(2)
    tiles = np.stack([_lowrank(32, 32, k, rng) for k in (1, 3, 9, 16)])
    U, V, ranks = rrqr(jnp.asarray(tiles), 1e-9, 20)
    assert list(np.asarray(ranks)) == [1, 3, 9, 16]
    rec = np.einsum("bij,bjk->bik", np.asarray(U), np.asarray(V))
    assert np.linalg.norm(rec - tiles) / np.linalg.norm(tiles) < 1e-10


def test_rrqr_complex():
    rng = np.random.default_rng(3)
    T = _lowrank(40, 24, 5, rng, dtype=np.complex128)
    U, V, ranks = rrqr(jnp.asarray(T), 1e-10, 12)
    assert int(ranks) == 5
    err = np.linalg.norm(np.asarray(U @ V) - T) / np.linalg.norm(T)
    assert err < 1e-12


def test_rrqr_zero_tile():
    T = jnp.zeros((2, 16, 16))
    U, V, ranks = rrqr(T, 1e-8, 8)
    assert np.asarray(ranks).tolist() == [0, 0]
    assert not np.any(np.isnan(np.asarray(U)))
