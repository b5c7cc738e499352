"""Pallas extend-add kernel vs the reference XLA gather formulation.

Random monotonic total maps (child rows onto parent slots, order
preserving — the multifrontal extend-add invariant) exercised in interpret
mode; the chunk-window metadata and the all-zero-selector paths (absent
fronts, empty chunks) are covered.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from strumpack_tpu.ops.pallas_extadd import (
    CH, extend_add_pallas, precompute_windows)


def _random_pos(rng, nf, p, u):
    """pos [nf, p]: each front embeds child rows 0..u-1 at u sorted parent
    slots (order preserving, total on the child), -1 elsewhere."""
    pos = np.full((nf, p), -1, np.int64)
    for f in range(nf):
        slots = np.sort(rng.choice(p, size=u, replace=False))
        pos[f, slots] = np.arange(u)
    return pos


def _xla_ref(F, C, idx, pos):
    nf, p, _ = F.shape
    u = C.shape[1]
    ok = (idx >= 0)[:, None] & (pos >= 0)
    posc = np.where(ok, pos, u).astype(np.int32)
    sel = np.clip(idx, 0, max(C.shape[0] - 1, 0))
    Cp = np.pad(C[sel], ((0, 0), (0, 1), (0, 1)))
    out = F.copy()
    for f in range(nf):
        out[f] += Cp[f][posc[f]][:, posc[f]]
    return out


@pytest.mark.parametrize("nf,p,u", [(3, 128, 64), (2, 256, 192),
                                    (5, 192, 128)])
def test_extend_add_pallas_matches_gather(nf, p, u):
    rng = np.random.default_rng(nf * 1000 + p)
    pos = _random_pos(rng, nf, p, u)
    idx = rng.permutation(nf).astype(np.int32)
    idx[0] = -1  # one absent front: must pass F through untouched
    C = rng.standard_normal((nf, u, u)).astype(np.float32)
    F = rng.standard_normal((nf, p, p)).astype(np.float32)

    pre = precompute_windows(pos, idx, u)
    assert pre is not None
    pos_m, clo = pre
    got = np.asarray(extend_add_pallas(
        jnp.asarray(F), jnp.asarray(C), jnp.asarray(idx),
        jnp.asarray(pos_m), jnp.asarray(clo), interpret=True))
    want = _xla_ref(F, C, idx, pos)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_precompute_rejects_non_consecutive():
    # a map that skips child row 1 inside a chunk violates the invariant
    pos = np.full((1, CH), -1, np.int64)
    pos[0, 0] = 0
    pos[0, 2] = 2
    assert precompute_windows(pos, np.array([0], np.int32), CH) is None
