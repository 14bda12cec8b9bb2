"""Validate + A/B the Pallas fold-round comb kernels on the real chip.

1. Small-shape oracle check: kernel sums / folded halves vs exact
   Python-int Fq3 math (bit-exactness evidence for the Pallas path).
2. Production-shape timing: rows=90, n=2^17 round sequence, Pallas vs the
   existing XLA round kernels' measured times (bench_verbose_r05_*.log).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from latticeum_tpu import backend as B
from latticeum_tpu.field import host as H

P = H.P


def limbs(a):
    return ((a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (a >> np.uint64(32)).astype(np.uint32))


def ints(pair):
    import jax
    lo, hi = jax.device_get(pair)
    return (np.asarray(lo, dtype=np.uint64)
            | (np.asarray(hi, dtype=np.uint64) << np.uint64(32)))


def c_of(x24):
    """(rows, 24, m) host ints -> c-layout (rows, 3, 8, m) uint64."""
    r, _, m = x24.shape
    return np.moveaxis(x24.reshape(r, 8, 3, m), 2, 1)


def sums24(s_c):
    """(npts, 3, 8) ints -> (npts, 24) slot-major."""
    return np.moveaxis(s_c, 1, 2).reshape(s_c.shape[0], 24)


def oracle_sums(X, Tb, mu, pt0, b_small):
    rows, _, m2 = X.shape
    q = m2 // 2
    npts = 2 * b_small
    sums = np.zeros((npts, 24), dtype=object)
    for x in range(q):
        for t in range(pt0, npts):
            acc = [(0, 0, 0)] * 8
            for r in range(rows):
                mu3 = tuple(int(v) for v in mu[r])
                for s in range(8):
                    v0 = tuple(int(X[r, 3 * s + c, x]) for c in range(3))
                    v1 = tuple(int(X[r, 3 * s + c, q + x])
                               for c in range(3))
                    st = H.fq3_sub(v1, v0)
                    f = v0
                    for _ in range(t):
                        f = H.fq3_add(f, st)
                    ev = H.fq3_mul(mu3, f)
                    fsq = H.fq3_mul(f, f)
                    for b in range(1, b_small):
                        fac = ((fsq[0] - b * b) % P, fsq[1], fsq[2])
                        ev = H.fq3_mul(ev, fac)
                    acc[s] = H.fq3_add(acc[s], ev)
            for s in range(8):
                tb3 = tuple(int(Tb[3 * s + c, x]) for c in range(3))
                w = H.fq3_mul(acc[s], tb3)
                for c in range(3):
                    sums[t, 3 * s + c] = (int(sums[t, 3 * s + c])
                                          + w[c]) % P
    return sums


def validate():
    from latticeum_tpu.zkvm import pallas_comb as PC
    rng = np.random.default_rng(7)
    ROWS, Q = 6, 512
    X = rng.integers(0, P, (ROWS, 24, 2 * Q), dtype=np.uint64)
    Tb = rng.integers(0, P, (24, Q), dtype=np.uint64)
    mu = rng.integers(0, P, (ROWS, 3), dtype=np.uint64)
    Xc = c_of(X)
    A = limbs(Xc[..., :Q])
    Bh = limbs(Xc[..., Q:])
    Tbc = limbs(c_of(Tb[None])[0])

    out = PC.fold_round0_pallas(A, Bh, Tbc, limbs(mu), b_small=2,
                                row_tile=3, col_tile=128)
    got = sums24(ints(out))
    want = oracle_sums(X, Tb, mu, pt0=2, b_small=2)
    ok0 = bool((got[:2] == 0).all()
               and (got[2:].astype(object) == want[2:]).all())
    print(json.dumps({"check": "round0_sums", "pass": ok0}), flush=True)

    r3 = rng.integers(0, P, (1, 3), dtype=np.uint64)
    Tb2 = Tb[:, : Q // 2]
    Tb2c = limbs(c_of(Tb2[None])[0])
    sums, An, Bn = PC.fold_roundr_pallas(A, Bh, Tb2c, limbs(mu),
                                         limbs(r3), b_small=2,
                                         row_tile=3, col_tile=128)
    # oracle fold
    f = np.zeros((ROWS, 24, Q), dtype=object)
    rr = tuple(int(v) for v in r3[0])
    for r in range(ROWS):
        for s in range(8):
            for x in range(Q):
                a = tuple(int(X[r, 3 * s + c, x]) for c in range(3))
                b = tuple(int(X[r, 3 * s + c, Q + x]) for c in range(3))
                fv = H.fq3_add(a, H.fq3_mul(rr, H.fq3_sub(b, a)))
                for c in range(3):
                    f[r, 3 * s + c, x] = fv[c]
    An_i, Bn_i = ints(An), ints(Bn)
    okf = bool((An_i.astype(object) == c_of(f)[..., : Q // 2]).all()
               and (Bn_i.astype(object) == c_of(f)[..., Q // 2:]).all())
    want = oracle_sums(f.astype(np.uint64), Tb2, mu, pt0=0, b_small=2)
    oks = bool((sums24(ints(sums)).astype(object) == want).all())
    print(json.dumps({"check": "roundr_fold", "pass": okf}), flush=True)
    print(json.dumps({"check": "roundr_sums", "pass": oks}), flush=True)
    return ok0 and okf and oks


def bench_production():
    import jax
    from latticeum_tpu.zkvm import pallas_comb as PC
    rng = np.random.default_rng(1)
    rows, n = 90, 1 << 17
    q = n // 2
    Xc = rng.integers(0, P, (rows, 3, 8, n), dtype=np.uint64)
    A = tuple(jax.device_put(a) for a in limbs(Xc[..., :q]))
    Bh = tuple(jax.device_put(a) for a in limbs(Xc[..., q:]))
    mu = tuple(jax.device_put(a) for a in limbs(
        rng.integers(0, P, (rows, 3), dtype=np.uint64)))
    r3 = tuple(jax.device_put(a) for a in limbs(
        rng.integers(0, P, (1, 3), dtype=np.uint64)))

    # round sequence: r0 at q, then r>=1 halving
    timings = []
    Tb = tuple(jax.device_put(a) for a in limbs(
        rng.integers(0, P, (3, 8, q), dtype=np.uint64)))
    f0 = jax.jit(lambda a, b, t, m: PC.fold_round0_pallas(
        a, b, t, m, b_small=2))
    out = f0(A, Bh, Tb, mu)
    ints(out)  # compile+run
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = f0(A, Bh, Tb, mu)
    ints(out)
    timings.append(("r0", n, (time.time() - t0) / reps))

    cur_A, cur_B = A, Bh
    r = 1
    while cur_A[0].shape[-1] >= 2 * 512:
        m2 = int(cur_A[0].shape[-1])
        qq = m2 // 2
        Tbr = tuple(jax.device_put(a) for a in limbs(
            rng.integers(0, P, (3, 8, qq), dtype=np.uint64)))
        fr = jax.jit(lambda a, b, t, m, rr: PC.fold_roundr_pallas(
            a, b, t, m, rr, b_small=2))
        sums, An, Bn = fr(cur_A, cur_B, Tbr, mu, r3)
        ints(sums)
        t0 = time.time()
        for _ in range(reps):
            sums, An, Bn = fr(cur_A, cur_B, Tbr, mu, r3)
        ints(sums)
        dt = (time.time() - t0) / reps
        timings.append((f"r{r}", m2, dt))
        cur_A, cur_B = An, Bn
        r += 1

    total = sum(t for _, _, t in timings)
    for name, sz, t in timings:
        print(json.dumps({"round": name, "n": sz,
                          "ms": round(t * 1e3, 1)}), flush=True)
    print(json.dumps({"total_pallas_rounds_s": round(total, 3),
                      "xla_rounds_baseline_s": 1.77}), flush=True)


if __name__ == "__main__":
    B.use_jax()
    ok = validate()
    if ok and "--bench" in sys.argv:
        bench_production()
