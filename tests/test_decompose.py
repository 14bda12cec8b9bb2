"""Balanced decomposition tests vs a Python-int oracle of the reference algo."""

import random

import numpy as np

from latticeum_tpu.field import goldilocks as gl
from latticeum_tpu.ring import decompose as dc

P = gl.P
rng = random.Random(99)


def oracle_decompose(v, b, L):
    """Reference algorithm (balanced_decomposition/mod.rs:62-103), ints."""
    s = v if v <= (P - 1) // 2 else v - P
    out = []
    curr = s
    while True:
        rem = curr - (abs(curr) // b) * b * (1 if curr >= 0 else -1)  # trunc %
        rem = int(curr - int(curr / b if False else (abs(curr) // b) * (1 if curr >= 0 else -1)) * b)
        # simpler: Rust % truncates toward zero
        q_trunc = abs(curr) // b * (1 if curr >= 0 else -1)
        rem = curr - q_trunc * b
        if abs(rem) <= b // 2:
            out.append(rem % P)
            curr = q_trunc
        else:
            out.append((rem - b if rem > 0 else rem + b) % P)
            carry = 1 if rem > 0 else -1
            curr = q_trunc + carry
        if curr == 0:
            break
    assert len(out) <= L, "decomposition overflow"
    out += [0] * (L - len(out))
    return out


def check(got, expect):
    np.testing.assert_array_equal(
        np.asarray(gl.to_int(got), dtype=object),
        np.asarray(expect, dtype=object))


def test_decompose_b2_small_values():
    # reference golden: 15 -> [1,1,1,1]; -15 -> [-1,-1,-1,-1] (mod.rs:470-491)
    vals = [15, P - 15]
    got = dc.decompose_balanced(gl.from_int(vals), 2, 4)
    check(got, [[1, 1, 1, 1], [P - 1, P - 1, P - 1, P - 1]])


def test_decompose_fuzz_b_2_15():
    B, L = 1 << 15, 5
    vals = [rng.randrange(P) for _ in range(200)] + [0, 1, P - 1, (P - 1) // 2,
                                                    (P - 1) // 2 + 1, B // 2,
                                                    P - B // 2, B, P - B]
    got = dc.decompose_balanced(gl.from_int(vals), B, L)
    check(got, [oracle_decompose(v, B, L) for v in vals])


def test_decompose_fuzz_b2():
    K = 70  # max digits for base-2 balanced of |s| < 2^63
    vals = [rng.randrange(P) for _ in range(100)] + [0, 1, 2, 3, P - 1, P - 2]
    got = dc.decompose_balanced(gl.from_int(vals), 2, K)
    check(got, [oracle_decompose(v, 2, K) for v in vals])


def test_recompose_roundtrip():
    B, L = 1 << 15, 5
    vals = [rng.randrange(P) for _ in range(64)]
    digs = dc.decompose_balanced(gl.from_int(vals), B, L)
    rec = dc.recompose(digs, B)
    check(rec, vals)


def test_gadget_roundtrip_ring():
    B, L = 1 << 15, 5
    w = [[[rng.randrange(P) for _ in range(24)] for _ in range(6)]]
    f = dc.gadget_decompose(gl.from_int(w), B, L)
    assert f[0].shape == (1, 30, 24)
    back = dc.gadget_recompose(f, B, L)
    check(back, w)


def test_gadget_digit_layout():
    # element 15 at every coeff with b=2, L=4: digits all ones (mod.rs:470-491)
    w = [[[15] * 24, [P - 15] * 24]]
    f = dc.gadget_decompose(gl.from_int(w), 2, 4)
    expect = [[[1] * 24] * 4 + [[P - 1] * 24] * 4]
    check(f, expect)


def test_decompose_into_k_vecs():
    b, K = 2, 15
    n = 8
    w = [[rng.randrange(1 << 14) for _ in range(24)] for _ in range(n)]
    out = dc.decompose_vec_into_k_vecs(gl.from_int(w), b, K)
    assert out[0].shape == (K, n, 24)
    # recompose along axis 0
    rec = dc.recompose(out, b, axis=0)
    check(rec, w)
