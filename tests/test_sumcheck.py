"""Sum-check prover/verifier tests with host oracles."""

import random

import numpy as np

from latticeum_tpu.crypto.transcript import Transcript
from latticeum_tpu.field import goldilocks as gl, host as H
from latticeum_tpu.poly import mle as mle_mod, sumcheck as sc
from latticeum_tpu.ring import ref_impl as R

P = H.P
rng = random.Random(1234)


def rand_ntt():
    return [rng.randrange(P) for _ in range(24)]


def make_mles(k, nv):
    """Random ring-valued MLEs, host + device forms."""
    host = [[rand_ntt() for _ in range(1 << nv)] for _ in range(k)]
    arr = np.array(host, dtype=object)  # (k, n, 24)
    dev = gl.from_int(arr)
    return host, dev


def product_comb_dev(vals):
    """comb = prod of all mles (device)."""
    from latticeum_tpu.ring import rq
    lo, hi = vals
    acc = (lo[0], hi[0])
    for i in range(1, lo.shape[0]):
        acc = rq.ntt_mul(acc, (lo[i], hi[i]))
    return acc


def product_comb_host(vals):
    acc = list(vals[0])
    for v in vals[1:]:
        acc = H.ntt_mul(acc, v)
    return acc


def oracle_sum(host_mles):
    k = len(host_mles)
    n = len(host_mles[0])
    tot = H.ntt_zero()
    for b in range(n):
        tot = H.ntt_add(tot, product_comb_host([host_mles[j][b] for j in range(k)]))
    return tot


def test_prove_verify_roundtrip():
    k, nv = 3, 4
    host, dev = make_mles(k, nv)
    claimed = oracle_sum(host)

    t_p = Transcript()
    proof, chals, final = sc.prove(t_p, dev, nv, k, product_comb_dev)

    t_v = Transcript()
    point, expected = sc.verify(t_v, nv, k, claimed, proof)
    assert point == chals  # transcripts agree

    # expected evaluation == product of MLE evaluations at the point
    evals = []
    for j in range(k):
        cur = host[j]
        for r in point:
            nxt = []
            for b in range(len(cur) // 2):
                diff = H.ntt_sub(cur[2 * b + 1], cur[2 * b])
                nxt.append(H.ntt_add(cur[2 * b], H.ntt_scalar_mul(diff, r)))
            cur = nxt
        evals.append(cur[0])
    assert product_comb_host(evals) == expected

    # prover's final fixed mles match the host evaluation
    got_final = gl.to_int(final)
    for j in range(k):
        assert [int(x) for x in got_final[j][0]] == evals[j]


def test_verify_rejects_bad_sum():
    k, nv = 2, 3
    host, dev = make_mles(k, nv)
    claimed = oracle_sum(host)
    t_p = Transcript()
    proof, _, _ = sc.prove(t_p, dev, nv, k, product_comb_dev)
    bad = list(claimed)
    bad[0] = (bad[0] + 1) % P
    try:
        sc.verify(Transcript(), nv, k, bad, proof)
        assert False, "should have failed"
    except ValueError:
        pass


def test_interpolate_matches_poly():
    # interpolate evals of t -> (3t^2 + 2t + 5) scalar ring at random Fq3
    poly = lambda t: (3 * t * t + 2 * t + 5) % P
    evals = [H.ntt_from_u64(poly(t)) for t in range(4)]
    at = (rng.randrange(P), rng.randrange(P), rng.randrange(P))
    got = sc.interpolate_uni_poly(evals, at)
    t2 = H.fq3_mul(at, at)
    expect_fq3 = H.fq3_add(
        H.fq3_add(H.fq3_mul((3, 0, 0), t2), H.fq3_mul((2, 0, 0), at)), (5, 0, 0))
    assert got == H.ntt_from_fq3(expect_fq3)


def test_interpolate_at_node():
    evals = [rand_ntt() for _ in range(5)]
    assert sc.interpolate_uni_poly(evals, (3, 0, 0)) == evals[3]


def test_eq_table_and_eval():
    nv = 3
    rs = [(rng.randrange(P), rng.randrange(P), rng.randrange(P))
          for _ in range(nv)]
    table = mle_mod.build_eq_table(rs)
    ti = gl.to_int(table)
    # check entry for x = (1,0,1): index 0b101 = 5
    e = (1, 0, 0)
    for i, (r, x) in enumerate(zip(rs, [1, 0, 1])):
        f = r if x else H.fq3_sub((1, 0, 0), r)
        e = H.fq3_mul(e, f)
    assert [int(v) for v in ti[5]] == H.ntt_from_fq3(e)
