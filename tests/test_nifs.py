"""End-to-end NIFS tests on the small test CCS: decomposition round-trip,
folding, full prove/verify, and a multi-step folding chain."""

import pytest

from latticeum_tpu.commit.ajtai import AjtaiScheme
from latticeum_tpu.crypto.transcript import Transcript
from latticeum_tpu.field import goldilocks as gl, host as H
from latticeum_tpu.nifs import decomposition as dec, linearization as lin, nifs
from latticeum_tpu.nifs.nifs import DecompositionParams
from latticeum_tpu.nifs.structs import CCCS, LCCCS, Witness
from latticeum_tpu.nifs.test_fixtures import (TEST_B, TEST_B_SMALL, TEST_K,
                                              TEST_L, get_test_ccs,
                                              get_test_z, z_to_device)

PARAMS = DecompositionParams(B=TEST_B, L=TEST_L, B_SMALL=TEST_B_SMALL,
                             K=TEST_K)


def make_instance(inp=3):
    ccs = get_test_ccs()
    z_host = get_test_z(inp)
    w_dev = z_to_device(z_host[2:])
    wit = Witness.from_w_ccs(w_dev, TEST_B, TEST_L)
    scheme = AjtaiScheme.from_seed(kappa=4, n=wit.f[0].shape[0])
    cm = scheme.commit_host(wit.f)
    return ccs, CCCS(cm=cm, x_ccs=z_host[:1]), wit, scheme


def make_acc(ccs, scheme):
    """Zero-witness accumulator via linearization (main.rs:305-344 analog)."""
    nw = ccs.n - ccs.l - 1
    w_dev = gl.zeros((nw, 24))
    wit = Witness.from_w_ccs(w_dev, TEST_B, TEST_L)
    cm = scheme.commit_host(wit.f)
    x_ccs = [H.ntt_zero()]
    cm_i = CCCS(cm=cm, x_ccs=x_ccs)
    t = Transcript()
    acc, _, _ = lin.prove(cm_i, wit, t, ccs)
    return acc, wit


@pytest.fixture(scope="module")
def inst():
    return make_instance()


def test_decomposition_roundtrip(inst):
    ccs, cm_i, wit, scheme = inst
    lcccs, _, _ = lin.prove(cm_i, wit, Transcript(), ccs)
    t_p = Transcript()
    mz, lcccs_s, wit_s, proof = dec.prove(lcccs, wit, t_p, ccs, scheme,
                                          PARAMS)
    assert len(lcccs_s) == PARAMS.K
    t_v = Transcript()
    lcccs_v = dec.verify(lcccs, proof, t_v, ccs, PARAMS)
    assert lcccs_v == lcccs_s
    assert t_p.ch.state == t_v.ch.state


def test_decomposition_rejects_tamper(inst):
    ccs, cm_i, wit, scheme = inst
    lcccs, _, _ = lin.prove(cm_i, wit, Transcript(), ccs)
    _, _, _, proof = dec.prove(lcccs, wit, Transcript(), ccs, scheme, PARAMS)
    proof["y_s"][1][0][0] = (proof["y_s"][1][0][0] + 1) % H.P
    with pytest.raises(ValueError):
        dec.verify(lcccs, proof, Transcript(), ccs, PARAMS)


def test_full_nifs_prove_verify(inst):
    ccs, cm_i, wit, scheme = inst
    acc, w_acc = make_acc(ccs, scheme)
    t_p = Transcript()
    folded_p, w0, proof = nifs.prove(acc, w_acc, cm_i, wit, t_p, ccs,
                                     scheme, PARAMS)
    t_v = Transcript()
    folded_v = nifs.verify(acc, cm_i, proof, t_v, ccs, PARAMS)
    assert folded_p == folded_v
    assert t_p.ch.state == t_v.ch.state
    # folded witness commits to the folded commitment
    cm0 = scheme.commit_host(w0.f)
    assert cm0 == folded_p.cm


def test_two_step_folding_chain(inst):
    """Fold two different instances sequentially; each fold verifies and the
    running accumulator witness stays consistent with its commitment."""
    ccs, _, _, scheme = inst
    acc, w_acc = make_acc(ccs, scheme)
    for inp in (3, 4):
        z_host = get_test_z(inp)
        wit = Witness.from_w_ccs(z_to_device(z_host[2:]), TEST_B, TEST_L)
        cm_i = CCCS(cm=scheme.commit_host(wit.f), x_ccs=z_host[:1])
        t_p = Transcript()
        folded, w0, proof = nifs.prove(acc, w_acc, cm_i, wit, t_p, ccs,
                                       scheme, PARAMS)
        folded_v = nifs.verify(acc, cm_i, proof, Transcript(), ccs, PARAMS)
        assert folded == folded_v
        acc, w_acc = folded, w0
    assert scheme.commit_host(w_acc.f) == acc.cm


def test_proof_serialization_roundtrip(inst):
    from latticeum_tpu.nifs import serialize as ser
    ccs, cm_i, wit, scheme = inst
    acc, w_acc = make_acc(ccs, scheme)
    _, _, proof = nifs.prove(acc, w_acc, cm_i, wit, Transcript(), ccs,
                             scheme, PARAMS)
    blob = ser.serialize_proof(proof)
    back = ser.deserialize_proof(blob)
    assert back["linearization"]["u"] == [list(u) for u in
                                         proof["linearization"]["u"]]
    assert back["folding"]["theta_s"] == [[list(t) for t in ts]
                                          for ts in proof["folding"]["theta_s"]]
    assert back["decomposition_l"]["y_s"] == [[list(y) for y in ys]
                                              for ys in proof["decomposition_l"]["y_s"]]
    # re-verify from the deserialized proof
    folded = nifs.verify(acc, cm_i, back, Transcript(), ccs, PARAMS)
    assert folded is not None


def test_security_check_reference_params():
    from latticeum_tpu.utils.security import (
        check_ring_modulus_128_bits_security, msis_l2_bound)
    # production params: B=2^15, kappa=32, n=98815 (ccs.rs:26-50)
    assert check_ring_modulus_128_bits_security(1 << 15, 32, 98815)
    assert msis_l2_bound(32) > 0
