"""Ring-generic NIFS (nifs/generic.py) on a non-Goldilocks ring.

The reference's latticefold is generic over SuitableRing with per-ring test
instantiation (latticefold/src/nifs/tests.rs:119-203).  This runs the full
generic NIFS — lin + dec x2 + fold, prove AND verify — on the StarkPrime
ring (D=16, 16 slots of plain Fq, 252-bit modulus) with the toy CCS, then
folds a SECOND step on top of the folded accumulator (the chain step that
exercises the RotSum/f_hat/decomposition interplay of Lemma 2.1)."""

import pytest

from latticeum_tpu.nifs import generic as G
from latticeum_tpu.ring import models


def _params(ring):
    # B^L >= q, b_small^K = B
    if ring.p.bit_length() > 64:          # stark q ~ 2^251.5
        B, L, b_small, K = 1 << 63, 4, 2, 63
    elif ring.p.bit_length() > 32:        # goldilocks q ~ 2^64
        # L=8 keeps (n-l-1)*L a power of two (the generic MLEs are unpadded)
        B, L, b_small, K = 1 << 16, 8, 2, 16
    else:                                 # babybear q ~ 2^31
        B, L, b_small, K = 1 << 16, 2, 2, 16
    assert b_small ** K == B and B ** L > ring.p
    return {"B": B, "L": L, "b_small": b_small, "K": K,
            "tau": ring.D // ring.N}


def _setup(ring):
    params = _params(ring)
    ccs = G.toy_ccs(ring, params["L"])
    z = G.toy_z(ring, 3)
    ccs.check_relation(ring, z)
    wit = G.witness_from_w(ring, z[ccs.l + 1:], params["B"], params["L"],
                           params["tau"])
    scheme = G.GAjtai(ring, kappa=2, n=len(wit.f))
    cm_i = G.GCCCS(cm=scheme.commit(wit.f), x_ccs=z[:ccs.l])
    # zero accumulator via linearization of a zero witness (main.rs:305)
    zero_w = [ring.zero()] * (ccs.n - ccs.l - 1)
    zwit = G.witness_from_w(ring, zero_w, params["B"], params["L"],
                            params["tau"])
    zcm = G.GCCCS(cm=scheme.commit(zwit.f), x_ccs=[ring.zero()] * ccs.l)
    t0 = G.ShaTranscript(ring)
    acc, _ = G.lin_prove(ring, ccs, zcm, zwit, t0)
    return params, ccs, z, wit, scheme, cm_i, acc, zwit


@pytest.mark.slow
def test_stark_prime_full_nifs_chain():
    ring = G.GRing(models.STARK)
    params, ccs, z, wit, scheme, cm_i, acc, w_acc = _setup(ring)

    tp = G.ShaTranscript(ring)
    folded, w0, proof = G.nifs_prove(ring, ccs, scheme, acc, w_acc, cm_i,
                                     wit, params, tp)
    tv = G.ShaTranscript(ring)
    folded_v = G.nifs_verify(ring, ccs, acc, cm_i, proof, params, tv)
    assert folded_v == folded
    assert tv.state == tp.state

    # chain step 2: fold a fresh instance into the FOLDED accumulator
    z2 = G.toy_z(ring, 5)
    ccs.check_relation(ring, z2)
    wit2 = G.witness_from_w(ring, z2[ccs.l + 1:], params["B"], params["L"],
                            params["tau"])
    cm_i2 = G.GCCCS(cm=scheme.commit(wit2.f), x_ccs=z2[:ccs.l])
    tp2 = G.ShaTranscript(ring)
    folded2, _, proof2 = G.nifs_prove(ring, ccs, scheme, folded, w0, cm_i2,
                                      wit2, params, tp2)
    tv2 = G.ShaTranscript(ring)
    folded2_v = G.nifs_verify(ring, ccs, folded, cm_i2, proof2, params, tv2)
    assert folded2_v == folded2


def test_generic_ring_ops_stark():
    """Cheap invariants: eq-table formula, fhat/commit shapes, relation."""
    ring = G.GRing(models.STARK)
    p = ring.p
    ccs = G.toy_ccs(ring, 4)
    z = G.toy_z(ring, 2)
    ccs.check_relation(ring, z)
    # brute-force eq table check at nv=3
    import random
    rnd = random.Random(1)
    betas = [rnd.randrange(p) for _ in range(3)]
    table = G.build_eq_table(ring, [ring.scalar(b) for b in betas])
    for idx in range(8):
        e = 1
        for j in range(3):
            xj = (idx >> j) & 1
            e = e * ((betas[j] if xj else (1 - betas[j])) % p) % p
        assert table[idx] == ring.from_u64(e)
    # balanced decomposition roundtrip at b=2 (the carry-rule edge):
    # signed values within the 63-digit range, incl. negatives
    coeffs = [(rnd.randrange(-(1 << 61), 1 << 61)) % p
              for _ in range(ring.D)]
    digs = G.decompose_balanced_coeffs(ring, coeffs, 2, 63)
    rec = [0] * ring.D
    for k in range(63):
        w = pow(2, k, p)
        rec = [(r + d * w) % p for r, d in zip(rec, digs[k])]
    assert rec == list(coeffs)


@pytest.mark.slow
def test_babybear_full_nifs_chain():
    """The d = 9 (Fq9-slot) instantiation: exercises the COMPUTED
    homogenization isomorphisms (models.crt_h) and the slot-field challenge
    arithmetic end to end — the reference's BabyBear test matrix analog
    (latticefold/src/nifs/tests.rs:119-203, models/babybear/ntt.rs:326-437).
    """
    ring = G.GRing(models.BABYBEAR)
    assert ring.d == 9
    params, ccs, z, wit, scheme, cm_i, acc, w_acc = _setup(ring)

    tp = G.ShaTranscript(ring)
    folded, w0, proof = G.nifs_prove(ring, ccs, scheme, acc, w_acc, cm_i,
                                     wit, params, tp)
    tv = G.ShaTranscript(ring)
    folded_v = G.nifs_verify(ring, ccs, acc, cm_i, proof, params, tv)
    assert folded_v == folded
    assert tv.state == tp.state

    # chain step 2 on top of the folded accumulator
    z2 = G.toy_z(ring, 5)
    ccs.check_relation(ring, z2)
    wit2 = G.witness_from_w(ring, z2[ccs.l + 1:], params["B"], params["L"],
                            params["tau"])
    cm_i2 = G.GCCCS(cm=scheme.commit(wit2.f), x_ccs=z2[:ccs.l])
    tp2 = G.ShaTranscript(ring)
    folded2, _, proof2 = G.nifs_prove(ring, ccs, scheme, folded, w0, cm_i2,
                                      wit2, params, tp2)
    tv2 = G.ShaTranscript(ring)
    folded2_v = G.nifs_verify(ring, ccs, folded, cm_i2, proof2, params, tv2)
    assert folded2_v == folded2


def test_babybear_homogenized_ring_ops():
    """crt_h must be a ring isomorphism and the diagonal challenge embed a
    field homomorphism (mul of embedded scalars = embed of field product)."""
    import random
    ring = G.GRing(models.BABYBEAR)
    F = ring.F
    rnd = random.Random(7)
    a = [rnd.randrange(ring.p) for _ in range(ring.D)]
    b = [rnd.randrange(ring.p) for _ in range(ring.D)]
    ra, rb = ring.from_coeffs(a), ring.from_coeffs(b)
    assert ring.to_coeffs(ra) == a
    assert ring.to_coeffs(ring.mul(ra, rb)) == ring.m.poly_mul(a, b)
    c1 = tuple(rnd.randrange(ring.p) for _ in range(9))
    c2 = tuple(rnd.randrange(ring.p) for _ in range(9))
    assert ring.mul(ring.scalar(c1), ring.scalar(c2)) == \
        ring.scalar(F.mul(c1, c2))
    # scalar embedding commutes with the ring action on a random element
    assert ring.mul(ring.scalar(c1), ra) == \
        tuple(F.mul(c1, s) for s in ra)
