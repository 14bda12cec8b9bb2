"""Numpy prototype: exact Goldilocks elementwise multiply in f32 digit planes.

Validates the scheme considered for the sum-check comb kernels (VERDICT r05
perf item): value = sum_k d_k * 256^k, 8 digits of 8 bits carried as f32.
Multiply = digit convolution (exact: columns < 8*255^2 < 2^24, f32 integer
exactness bound) + serial carry + the 2^64 = 2^32 - 1 special-prime fold.
Output is canonical mod p.  All ops are elementwise vector ops (VPU-shaped).
"""

import numpy as np

P = (1 << 64) - (1 << 32) + 1
D = 8  # 8-bit digits


def to_digits(x):
    """uint64-valued python ints array -> (..., 8) f32 digit planes."""
    x = np.asarray(x, dtype=np.uint64)
    out = np.empty(x.shape + (D,), np.float32)
    for k in range(D):
        out[..., k] = ((x >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(
            np.float32)
    return out


def from_digits(d):
    """(..., n) f32 digit planes (possibly wide/non-canonical) -> ints."""
    vals = np.zeros(d.shape[:-1], dtype=object)
    for k in range(d.shape[-1]):
        col = np.asarray(np.rint(d[..., k]), dtype=np.int64)
        vals = vals + col.astype(object) * (1 << (8 * k))
    return vals % P


def carry_norm(c, out_digits):
    """Serial carry pass: wide columns -> 8-bit digits (last digit wide)."""
    res = np.zeros(c.shape[:-1] + (out_digits,), np.float32)
    carry = np.zeros(c.shape[:-1], np.float32)
    ncols = c.shape[-1]
    for j in range(out_digits - 1):
        t = (c[..., j] if j < ncols else 0) + carry
        carry = np.floor(t * np.float32(1.0 / 256.0))
        res[..., j] = t - carry * 256.0
    res[..., out_digits - 1] = carry + (
        c[..., out_digits - 1] if out_digits - 1 < ncols else 0)
    return res


def mul(a, b):
    """(..., 8) x (..., 8) f32 digit planes -> (..., 8) canonical-ish
    (value < 2^64 + small, digits 8-bit except d7 slightly wide; exact
    mod p equivalence)."""
    # 1. convolution: 15 columns, each < 8 * 255^2 < 2^20 (f32-exact)
    conv = np.zeros(a.shape[:-1] + (15,), np.float32)
    for i in range(D):
        for j in range(D):
            conv[..., i + j] += a[..., i] * b[..., j]
    # 2. carry-normalize to 16 digits (d15 wide, < 2^13)
    nrm = carry_norm(conv, 16)
    # 3. special-prime fold: n = lo64 + 2^64 A + 2^96 B
    #    (A = digits 8..11, B = digits 12..15, B < 2^37)
    #    n mod p = lo64 + (2^32 - 1) A - B  (+ K*p to stay positive)
    e = np.zeros(a.shape[:-1] + (11,), np.float32)
    e[..., :8] += nrm[..., :8]
    e[..., 4:8] += nrm[..., 8:12]     # + 2^32 A
    e[..., 0:4] -= nrm[..., 8:12]     # - A
    e[..., 0:4] -= nrm[..., 12:16]    # - B (d15 wide: put at col 3 is wrong)
    # d15 is wide (< 2^13), so B's top contributes beyond col 3: col 3 gets
    # d15 * 1 at digit position 3 — wait, B = d12 + 256 d13 + 2^16 d14 +
    # 2^24 d15 with d15 < 2^13 -> subtracting at cols 0..3 is correct by
    # construction (col 3 coefficient 2^24), and col values stay > -2^14.
    # Add K*p with K = 2^16: Kp = 2^80 - 2^48 + 2^16 keeps e positive.
    e[..., 10] += np.float32(1 << 0) * 0  # placeholder (col 10 = 2^80)
    e[..., 10] += 1.0                      # + 2^80
    e[..., 6] -= 1.0                       # - 2^48
    e[..., 2] += 1.0                       # + 2^16
    # 4. carry-normalize (signed columns: floor handles negatives exactly
    #    for |t| < 2^23) to 11 digits, value < 2^81
    nrm2 = carry_norm(e, 11)
    # 5. second fold: r = lo64 + 2^64 * hi (hi < 2^17)
    #    r mod p = lo64 + (2^32 - 1) hi  + p (stay positive)
    f = np.zeros(a.shape[:-1] + (9,), np.float32)
    f[..., :8] += nrm2[..., :8]
    f[..., 4:7] += nrm2[..., 8:11]    # + 2^32 hi
    f[..., 0:3] -= nrm2[..., 8:11]    # - hi
    # + p = 2^64 - 2^32 + 1
    f[..., 8] += 1.0
    f[..., 4] -= 1.0
    f[..., 0] += 1.0
    nrm3 = carry_norm(f, 9)           # value < 2^64 + p + ... < 2^66
    # 6. final fold of the small top (d8 < 4): + (2^32 - 1) * d8 - 0
    g = nrm3[..., :8].copy()
    g[..., 4] += nrm3[..., 8]
    g[..., 0] -= nrm3[..., 8]
    out = carry_norm(g, 9)
    # top digit can only be 0/1 now; one more tiny fold
    h = out[..., :8].copy()
    h[..., 4] += out[..., 8]
    h[..., 0] -= out[..., 8]
    return carry_norm(h, 8)


def add(a, b):
    """Digit-plane add (no reduction; digits may go to 9 bits — callers
    chain a few adds before the next mul's conv absorbs the slack)."""
    return a + b


def main():
    rng = np.random.default_rng(0)
    n = 4096
    xa = rng.integers(0, P, n, dtype=np.uint64)
    xb = rng.integers(0, P, n, dtype=np.uint64)
    da, db = to_digits(xa), to_digits(xb)
    got = from_digits(mul(da, db))
    want = (xa.astype(object) * xb.astype(object)) % P
    bad = np.nonzero(got != want)[0]
    print("mul exact:", len(bad) == 0, f"({len(bad)}/{n} mismatches)")
    if len(bad):
        i = bad[0]
        print("first:", int(xa[i]), int(xb[i]), got[i], want[i])

    # edge cases
    edges = np.array([0, 1, P - 1, P - 2, (1 << 64) - 1 - ((1 << 32) - 1),
                      (1 << 63), (1 << 32) - 1, (1 << 32), P // 2],
                     dtype=np.uint64)
    ea = np.repeat(edges, len(edges))
    eb = np.tile(edges, len(edges))
    got = from_digits(mul(to_digits(ea), to_digits(eb)))
    want = (ea.astype(object) * eb.astype(object)) % P
    print("edges exact:", bool((got == want).all()))

    # chained muls (digit growth safety): ((a*b)*b)*b ...
    acc = mul(da, db)
    ref = (xa.astype(object) * xb.astype(object)) % P
    for _ in range(4):
        acc = mul(acc, db)
        ref = (ref * xb.astype(object)) % P
    print("chain exact:", bool((from_digits(acc) == ref).all()))

    # add-then-mul (the comb does sums of products)
    s = add(da, db)
    got = from_digits(mul(s, db))
    want = (((xa.astype(object) + xb.astype(object))) * xb.astype(object)) % P
    print("add+mul exact:", bool((got == want).all()))


if __name__ == "__main__":
    main()
