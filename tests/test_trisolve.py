"""Loop-free blocked triangular solves (ops/trisolve.py).

These replace XLA's while-loop triangular_solve on the TPU f32 hot path;
on CPU the same code paths are exercised directly (the solver only routes
through them on TPU, so the module is unit-tested here).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from strumpack_tpu.ops import trisolve as TS


@pytest.mark.parametrize("w", [8, 32, 96, 200, 512])
def test_trsm_lower_upper(w):
    rng = np.random.default_rng(w)
    nf, m = 3, 5
    L = np.tril(rng.standard_normal((nf, w, w)))
    for i in range(nf):
        L[i] += np.diag(5 + np.abs(np.diag(L[i])))
    B = rng.standard_normal((nf, w, m))
    X = np.asarray(TS.trsm_lower(jnp.asarray(L), jnp.asarray(B)))
    assert max(np.abs(L[i] @ X[i] - B[i]).max() for i in range(nf)) < 1e-11
    U = np.transpose(L, (0, 2, 1)).copy()
    X = np.asarray(TS.trsm_upper(jnp.asarray(U), jnp.asarray(B)))
    assert max(np.abs(U[i] @ X[i] - B[i]).max() for i in range(nf)) < 1e-11


def test_trsm_unit_lower():
    rng = np.random.default_rng(1)
    nf, w, m = 2, 160, 4
    L = np.tril(rng.standard_normal((nf, w, w)), -1) * 0.4 + np.eye(w)
    B = rng.standard_normal((nf, w, m))
    X = np.asarray(TS.trsm_lower(jnp.asarray(L), jnp.asarray(B), unit=True))
    assert max(np.abs(L[i] @ X[i] - B[i]).max() for i in range(nf)) < 1e-9


def test_unit_tri_inv_exact_nilpotent():
    # the Neumann product is algebraically exact: integer strictly-lower
    # entries stay integer through the inversion identity
    w = 64
    rng = np.random.default_rng(2)
    N = np.tril(rng.integers(-2, 3, (1, w, w)).astype(np.float64), -1)
    L = np.eye(w) + N
    M = np.asarray(TS.unit_tri_inv(jnp.asarray(L)))
    assert np.abs(M[0] @ L[0] - np.eye(w)).max() < 1e-8


def test_blocked_factor_bucket_interpret():
    from strumpack_tpu.ops.pallas_panel_lu import blocked_factor_bucket
    rng = np.random.default_rng(3)
    nf, p, s = 2, 320, 256
    F = rng.standard_normal((nf, p, p)).astype(np.float32)
    lu, perm, L21, U12, CB = [np.asarray(x) for x in blocked_factor_bucket(
        jnp.asarray(F), 0.0, s, pivoting=True, interpret=True)]
    i = 1
    A = F[i].astype(np.float64)
    pm = perm[i]
    L = np.tril(lu[i], -1) + np.eye(s)
    U = np.triu(lu[i])
    assert np.abs(L @ U - A[pm[:s], :s]).max() < 5e-4
    cbref = A[s:, s:] - A[s:, :s] @ np.linalg.solve(A[:s, :s], A[:s, s:])
    assert np.abs(CB[i] - cbref).max() < 0.5   # f32, cond-limited
    assert np.abs(L21[i] @ U - A[s:, :s]).max() < 5e-4
