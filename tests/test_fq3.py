"""Fq3 extension field tests against a Python-int oracle."""

import random

import numpy as np

from latticeum_tpu.field import fq3, goldilocks as gl

P = gl.P
W = fq3.NONRESIDUE
rng = random.Random(7)


def oracle_mul(a, b):
    """(a0,a1,a2)*(b0,b1,b2) mod (Y^3 - W) with Python ints."""
    c = [0] * 5
    for i in range(3):
        for j in range(3):
            c[i + j] = (c[i + j] + a[i] * b[j]) % P
    return ((c[0] + W * c[3]) % P, (c[1] + W * c[4]) % P, c[2])


def rand3(n):
    return [[rng.randrange(P) for _ in range(n)] for _ in range(3)]


def check3(got, expect_cols):
    for g, e in zip(fq3.to_int(got), expect_cols):
        np.testing.assert_array_equal(np.asarray(g, dtype=object),
                                      np.asarray(e, dtype=object))


def test_mul():
    n = 128
    a, b = rand3(n), rand3(n)
    got = fq3.mul(fq3.from_int(*a), fq3.from_int(*b))
    expect = [oracle_mul([a[0][i], a[1][i], a[2][i]],
                         [b[0][i], b[1][i], b[2][i]]) for i in range(n)]
    check3(got, [[e[k] for e in expect] for k in range(3)])


def test_add_sub_neg():
    n = 64
    a, b = rand3(n), rand3(n)
    fa, fb = fq3.from_int(*a), fq3.from_int(*b)
    check3(fq3.add(fa, fb), [[(x + y) % P for x, y in zip(a[k], b[k])] for k in range(3)])
    check3(fq3.sub(fa, fb), [[(x - y) % P for x, y in zip(a[k], b[k])] for k in range(3)])
    check3(fq3.neg(fa), [[(-x) % P for x in a[k]] for k in range(3)])


def test_inv():
    n = 32
    a = rand3(n)
    fa = fq3.from_int(*a)
    ia = fq3.inv(fa)
    prod = fq3.mul(fa, ia)
    check3(prod, [[1] * n, [0] * n, [0] * n])


def test_pow():
    n = 8
    a = rand3(n)
    fa = fq3.from_int(*a)
    p5 = fq3.pow_const(fa, 5)
    # oracle: repeated mul
    acc = [(1, 0, 0)] * n
    for _ in range(5):
        acc = [oracle_mul(acc[i], (a[0][i], a[1][i], a[2][i])) for i in range(n)]
    check3(p5, [[e[k] for e in acc] for k in range(3)])


def test_nonresidue_cube_root_structure():
    # Y^3 == W in Fq3
    y = fq3.from_int([0], [1], [0])
    y3 = fq3.pow_const(y, 3)
    check3(y3, [[W % P], [0], [0]])
