"""Fuzz tests for Goldilocks limb arithmetic against a Python-int oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latticeum_tpu.field import goldilocks as gl

P = gl.P
rng = random.Random(0xC0FFEE)


def rand_elems(n, special_frac=0.25):
    """Random canonical elements, with some boundary cases mixed in."""
    specials = [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P - 0xFFFFFFFF,
                (1 << 63), (1 << 32) - 1, (1 << 48)]
    out = []
    for _ in range(n):
        if rng.random() < special_frac:
            out.append(rng.choice(specials) % P)
        else:
            out.append(rng.randrange(P))
    return out


def to_pairs(vals):
    return gl.from_int(vals)


def check(got, expect):
    got_ints = gl.to_int(got)
    np.testing.assert_array_equal(
        np.asarray(got_ints, dtype=object), np.asarray(expect, dtype=object)
    )


N = 512


def test_roundtrip():
    vals = rand_elems(N)
    check(to_pairs(vals), vals)


def test_add():
    a, b = rand_elems(N), rand_elems(N)
    check(gl.add(to_pairs(a), to_pairs(b)), [(x + y) % P for x, y in zip(a, b)])


def test_sub():
    a, b = rand_elems(N), rand_elems(N)
    check(gl.sub(to_pairs(a), to_pairs(b)), [(x - y) % P for x, y in zip(a, b)])


def test_neg():
    a = rand_elems(N)
    check(gl.neg(to_pairs(a)), [(-x) % P for x in a])


def test_mul():
    a, b = rand_elems(N), rand_elems(N)
    check(gl.mul(to_pairs(a), to_pairs(b)), [(x * y) % P for x, y in zip(a, b)])


def test_mul_jit():
    from latticeum_tpu import backend as B
    a, b = rand_elems(N), rand_elems(N)
    with B.jax_mode():
        f = jax.jit(gl.mul)
        got = f(to_pairs(a), to_pairs(b))
    check(got, [(x * y) % P for x, y in zip(a, b)])


def test_reduce128_fuzz():
    words = [[rng.randrange(1 << 32) for _ in range(4)] for _ in range(N)]
    r = [jnp.asarray(np.array([w[i] for w in words], dtype=np.uint32)) for i in range(4)]
    got = gl.reduce128(*r)
    expect = [
        (w[0] + (w[1] << 32) + (w[2] << 64) + (w[3] << 96)) % P for w in words
    ]
    check(got, expect)


def test_pow_inv():
    a = [x for x in rand_elems(64) if x != 0]
    ia = gl.inv(to_pairs(a))
    check(gl.mul(to_pairs(a), ia), [1] * len(a))
    check(gl.pow_const(to_pairs(a), 7), [pow(x, 7, P) for x in a])


def test_inv_zero():
    check(gl.inv(to_pairs([0])), [0])


@pytest.mark.parametrize("n", [1, 7, 64, 1 << 16, (1 << 16) + 3, 200_001])
def test_sum_axis(n):
    vals = [rng.randrange(P) for _ in range(min(n, 4096))]
    # extend cheaply for large n by cycling (oracle must match exactly)
    vals = (vals * ((n // len(vals)) + 1))[:n]
    got = gl.sum_axis(to_pairs(vals), axis=0)
    check((got[0][None], got[1][None]), [sum(vals) % P])


def test_sum_axis_2d():
    a = [[rng.randrange(P) for _ in range(17)] for _ in range(5)]
    got = gl.sum_axis(to_pairs(a), axis=1)
    check(got, [sum(row) % P for row in a])


def test_dot():
    a, b = rand_elems(100), rand_elems(100)
    got = gl.dot(to_pairs(a), to_pairs(b), axis=0)
    check((got[0][None], got[1][None]), [sum(x * y for x, y in zip(a, b)) % P])
