"""Ring R_q tests: device path vs host oracle vs reference golden vectors."""

import random

import numpy as np

from latticeum_tpu.field import goldilocks as gl
from latticeum_tpu.ring import ref_impl as R, rq

P = R.P
rng = random.Random(42)

# Golden CRT vector from the reference (goldilocks/ntt.rs:564-625), in the
# DEhomogenized layout; homogenize to get the public CRT output layout.
GOLDEN_POLY = [1, 2, 3] + [0] * 21
GOLDEN_POLY[15] = 15
GOLDEN_POLY[23] = 1
_g = [3841, 2, 72057594021150723, 18446744069414580482, 2,
      18374686475393433604, 1080863910568919041, 2, 1099511627779,
      17365880158845665282, 2, 18446742969902956548, 16492674416641, 2,
      72057594037927939, 18446727576740167682, 2, 18374686475376656388,
      1080863910317260801, 2, 259, 17365880159097323522, 2,
      18446744069414584068]
GOLDEN_NTT = list(_g)
R._homogenize(GOLDEN_NTT)


def rand_ring(batch):
    return [[rng.randrange(P) for _ in range(24)] for _ in range(batch)]


def check(got, expect):
    np.testing.assert_array_equal(
        np.asarray(gl.to_int(got), dtype=object),
        np.asarray(expect, dtype=object))


def test_crt_golden():
    got = rq.crt(gl.from_int([GOLDEN_POLY]))
    check(got, [GOLDEN_NTT])


def test_icrt_golden():
    got = rq.icrt(gl.from_int([GOLDEN_NTT]))
    check(got, [GOLDEN_POLY])


def test_crt_matches_oracle_batch():
    xs = rand_ring(16)
    got = rq.crt(gl.from_int(xs))
    check(got, [R.crt(list(x)) for x in xs])


def test_icrt_roundtrip():
    xs = rand_ring(16)
    got = rq.icrt(rq.crt(gl.from_int(xs)))
    check(got, xs)


def test_ntt_mul():
    a, b = rand_ring(8), rand_ring(8)
    ga = rq.crt(gl.from_int(a))
    gb = rq.crt(gl.from_int(b))
    got = rq.icrt(rq.ntt_mul(ga, gb))
    check(got, [R.poly_mul(x, y) for x, y in zip(a, b)])


def test_poly_mul():
    a, b = rand_ring(4), rand_ring(4)
    got = rq.poly_mul(gl.from_int(a), gl.from_int(b))
    check(got, [R.poly_mul(x, y) for x, y in zip(a, b)])


def test_rot():
    a = rand_ring(4)
    got = rq.rot(gl.from_int(a))
    check(got, [R.rot(list(x)) for x in a])


def test_reduce_coeffs():
    longs = [[rng.randrange(P) for _ in range(47)] for _ in range(4)]
    got = rq.reduce_coeffs(gl.from_int(longs))
    check(got, [R.reduce_coeffs(list(x)) for x in longs])


def test_ring_one():
    one = rq.ones((2,))
    a = rand_ring(2)
    got = rq.poly_mul(gl.from_int(a), one)
    check(got, a)


def test_ntt_scalar_mul():
    a = rand_ring(3)
    ga = rq.crt(gl.from_int(a))
    # scalar in Fq3, one per batch element
    s = [[rng.randrange(P) for _ in range(3)] for _ in range(3)]
    from latticeum_tpu.field import fq3
    s3 = fq3.from_int([x[0] for x in s], [x[1] for x in s], [x[2] for x in s])
    got = rq.ntt_scalar_mul(ga, s3)
    # oracle: multiply each slot by the Fq3 scalar
    expect = []
    for bi in range(3):
        antt = R.crt(list(a[bi]))
        sc = [s[bi][0], s[bi][1], s[bi][2]] * 8
        expect.append(R.ntt_mul(antt, sc))
    check(got, expect)
