"""Linearization subprotocol round-trip on the classic test CCS."""

import numpy as np

from latticeum_tpu.commit.ajtai import AjtaiScheme
from latticeum_tpu.crypto.transcript import Transcript
from latticeum_tpu.field import goldilocks as gl, host as H
from latticeum_tpu.nifs import linearization as lin
from latticeum_tpu.nifs.structs import CCCS, Witness
from latticeum_tpu.nifs.test_fixtures import (TEST_B, TEST_L, get_test_ccs,
                                              get_test_z, z_to_device)


def setup_instance(inp=3):
    ccs = get_test_ccs()
    z_host = get_test_z(inp)
    x_ccs = z_host[:1]
    w_host = z_host[2:]
    w_dev = z_to_device(w_host)
    wit = Witness.from_w_ccs(w_dev, TEST_B, TEST_L)
    scheme = AjtaiScheme.from_seed(kappa=4, n=wit.f[0].shape[0])
    cm = scheme.commit_host(wit.f)
    cm_i = CCCS(cm=cm, x_ccs=x_ccs)
    return ccs, cm_i, wit, scheme


def test_ccs_relation_satisfied():
    ccs, cm_i, wit, _ = setup_instance()
    z = cm_i.z_vector(wit.w_ccs)
    assert ccs.check_relation(z)


def test_ccs_relation_rejects():
    ccs, cm_i, wit, _ = setup_instance()
    blo = np.array(wit.w_ccs[0])
    blo[0, 0] += 1
    bad = (blo, wit.w_ccs[1])
    z = cm_i.z_vector(bad)
    assert not ccs.check_relation(z)


def test_witness_roundtrip():
    _, _, wit, _ = setup_instance()
    # f recomposes to w_ccs
    from latticeum_tpu.ring import decompose as dc
    back = dc.gadget_recompose(wit.f, TEST_B, TEST_L)
    np.testing.assert_array_equal(np.asarray(gl.to_int(back)),
                                  np.asarray(gl.to_int(wit.w_ccs)))


def test_linearization_prove_verify():
    ccs, cm_i, wit, _ = setup_instance()
    t_p = Transcript()
    lcccs_p, proof, _mz = lin.prove(cm_i, wit, t_p, ccs)
    t_v = Transcript()
    lcccs_v = lin.verify(cm_i, proof, t_v, ccs)
    assert lcccs_p == lcccs_v
    assert lcccs_p.h == H.ntt_from_u64(1)
    # transcript states agree after both runs
    assert t_p.ch.state == t_v.ch.state


def test_linearization_rejects_tampered_u():
    ccs, cm_i, wit, _ = setup_instance()
    lcccs_p, proof, _ = lin.prove(cm_i, wit, Transcript(), ccs)
    proof["u"] = [list(u) for u in proof["u"]]
    proof["u"][0][0] = (proof["u"][0][0] + 1) % H.P
    try:
        lin.verify(cm_i, proof, Transcript(), ccs)
        assert False
    except ValueError:
        pass
