"""MXU digit-plane ring contraction vs the VPU/host oracle.

Pins field.mxu.ring_contract (int8 digit-plane matmuls) bit-exact against
the direct formulation Σ_n ntt_mul(A[j,n], B[k,n]) for random and
adversarial edge values (reference semantics: evaluation claims of
mle_helpers.rs:65-146)."""

import numpy as np

from latticeum_tpu import backend as B
from latticeum_tpu.field import goldilocks as gl, mxu
from latticeum_tpu.ring import rq

P = gl.P
RNG = np.random.default_rng(7)


import pytest

# XLA-compile-heavy tier: minutes on a small host (run with -m 'not slow'
# for the fast host-math tier; the full suite still runs these by default)
pytestmark = pytest.mark.slow


def _rand_rings(*shape):
    vals = (RNG.integers(0, 1 << 62, size=shape + (24,), dtype=np.uint64)
            .astype(object) * 4 + RNG.integers(0, 4, size=shape + (24,))
            .astype(object)) % P
    return vals


def test_digit_planes_roundtrip_edges():
    edge = np.array([0, 1, P - 1, P // 2, P // 2 + 1,
                     0xFF00FF00FF00FF00 % P, (1 << 63) % P,
                     ((1 << 64) - 1) % P, 0x8000000000000000 % P,
                     0x7FFFFFFFFFFFFFFF], dtype=object)
    rand = np.array([int(x) for x in
                     RNG.integers(0, P, size=5000, dtype=np.uint64)],
                    dtype=object) % P
    vals = np.concatenate([edge, rand])
    with B.numpy_mode():
        limbs = gl.from_int(vals)
        d = np.asarray(mxu.digit_planes(limbs)).astype(np.int64)
    back = sum(d[:, i].astype(object) * (1 << (8 * i)) for i in range(9))
    assert np.all(back == vals.astype(object))
    assert d[:, :8].max() <= 127 and d[:, :8].min() >= -128
    assert set(np.unique(d[:, 8])) <= {0, 1}


def _oracle(A_int, B_int):
    """Σ_n ntt_mul over python ints."""
    from latticeum_tpu.field import host as H
    t, n = A_int.shape[:2]
    kb = B_int.shape[0]
    out = np.empty((t, kb, 24), dtype=object)
    for j in range(t):
        for k in range(kb):
            acc = H.ntt_zero()
            for i in range(n):
                acc = H.ntt_add(acc, H.ntt_mul(list(A_int[j, i]),
                                               list(B_int[k, i])))
            out[j, k] = acc
    return out


def test_ring_contract_matches_oracle():
    t, n, kb = 3, 17, 2
    A_int = _rand_rings(t, n)
    B_int = _rand_rings(kb, n)
    # adversarial: max-magnitude values exercise the carry plane
    A_int[0, 0, :] = P - 1
    B_int[0, 0, :] = P - 1
    A_int[1, 1, :] = (1 << 63) + 12345
    want = _oracle(A_int, B_int)
    with B.jax_mode():
        A = tuple(B.xp.asarray(np.asarray(x)) for x in gl.from_int(A_int))
        Bv = tuple(B.xp.asarray(np.asarray(x)) for x in gl.from_int(B_int))
        got = mxu.ring_contract(A, Bv)
        got_int = gl.to_int((np.asarray(got[0]), np.asarray(got[1])))
    assert np.array_equal(got_int, want)


def test_ring_contract_chunked():
    """n crossing the int32-exactness chunk boundary."""
    old = mxu.CHUNK_N
    mxu.CHUNK_N = 8
    try:
        t, n, kb = 2, 21, 1
        A_int = _rand_rings(t, n)
        B_int = _rand_rings(kb, n)
        want = _oracle(A_int, B_int)
        with B.jax_mode():
            A = tuple(B.xp.asarray(np.asarray(x))
                      for x in gl.from_int(A_int))
            Bv = tuple(B.xp.asarray(np.asarray(x))
                       for x in gl.from_int(B_int))
            got = mxu.ring_contract(A, Bv)
            got_int = gl.to_int((np.asarray(got[0]), np.asarray(got[1])))
        assert np.array_equal(got_int, want)
    finally:
        mxu.CHUNK_N = old


def test_ring_contract_jit():
    """Works under jit (the production call site wraps it in one)."""
    import jax
    t, n, kb = 2, 9, 3
    A_int = _rand_rings(t, n)
    B_int = _rand_rings(kb, n)
    want = _oracle(A_int, B_int)
    with B.jax_mode():
        A = tuple(B.xp.asarray(np.asarray(x)) for x in gl.from_int(A_int))
        Bv = tuple(B.xp.asarray(np.asarray(x)) for x in gl.from_int(B_int))
        got = jax.jit(mxu.ring_contract, static_argnums=(2, 3))(
            A, Bv, t, kb)
        got_int = gl.to_int((np.asarray(got[0]), np.asarray(got[1])))
    assert np.array_equal(got_int, want)
