"""Device-engine NIFS must be transcript-identical to the host NIFS."""

import numpy as np
import pytest

from latticeum_tpu import backend as B
from latticeum_tpu.commit.ajtai import AjtaiScheme
from latticeum_tpu.crypto.transcript import Transcript
from latticeum_tpu.field import goldilocks as gl, host as H
from latticeum_tpu.nifs import linearization as lin, nifs
from latticeum_tpu.nifs.nifs import DecompositionParams
from latticeum_tpu.nifs.structs import CCCS, Witness
from latticeum_tpu.nifs.test_fixtures import (TEST_B, TEST_B_SMALL, TEST_K,
                                              TEST_L, get_test_ccs,
                                              get_test_z, z_to_device)

PARAMS = DecompositionParams(B=TEST_B, L=TEST_L, B_SMALL=TEST_B_SMALL,
                             K=TEST_K)


# XLA-compile-heavy tier: minutes on a small host (run with -m 'not slow'
# for the fast host-math tier; the full suite still runs these by default)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    ccs = get_test_ccs()
    z_host = get_test_z(3)
    w_dev = z_to_device(z_host[2:])
    wit = Witness.from_w_ccs(w_dev, TEST_B, TEST_L)
    # row-constant Ajtai matrix (the reference's structure)
    scheme = AjtaiScheme.from_seed(kappa=4, n=wit.f[0].shape[0],
                                   row_constant=True)
    cm = scheme.commit_host(wit.f)
    cm_i = CCCS(cm=cm, x_ccs=z_host[:1])
    acc_w = gl.zeros((ccs.n - ccs.l - 1, 24))
    acc_wit = Witness.from_w_ccs(acc_w, TEST_B, TEST_L)
    acc_cm = scheme.commit_host(acc_wit.f)
    acc, _, _ = lin.prove(CCCS(cm=acc_cm, x_ccs=[H.ntt_zero()]), acc_wit,
                          Transcript(), ccs)
    return ccs, cm_i, wit, scheme, acc, acc_wit


def _device_engine(ccs, tail=2):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from latticeum_tpu.zkvm.accel import DeviceEngine
    return DeviceEngine(ccs, PARAMS, tail_threshold=tail)


@pytest.mark.parametrize("t_layout", [False, True],
                         ids=["standard", "transposed"])
def test_device_nifs_matches_host(setup, t_layout):
    ccs, cm_i, wit, scheme, acc, acc_wit = setup
    # host reference run
    t_host = Transcript()
    folded_h, w0_h, proof_h = nifs.prove(acc, acc_wit, cm_i, wit, t_host,
                                         ccs, scheme, PARAMS)

    # device run (t_layout=True additionally covers the truncated-cap
    # bit-reversed path: this fixture has cap=4 < m=16).  The legacy
    # standard-layout path compiles one kernel per round SHAPE — keep its
    # device rounds off (tail=64 -> numpy tail) to bound CPU compile time;
    # the production transposed path gets full device-round coverage.
    from latticeum_tpu.zkvm.accel_nifs import DeviceNifs
    engine = _device_engine(ccs, tail=2 if t_layout else 64)
    if t_layout:
        engine.sum_chunk_bytes = 64   # force the chunked sums path
    rows_host = [[int(v) for v in r]
                 for r in gl.to_int((np.asarray(scheme.matrix[0][:, 0, :]),
                                     np.asarray(scheme.matrix[1][:, 0, :])))]
    dn = DeviceNifs(engine, ccs, PARAMS, rows_host, t_layout=t_layout)
    w_i_dev = dn.build_witness(engine.put(wit.w_ccs))
    w_acc_dev = dn.build_witness(engine.put(acc_wit.w_ccs))
    t_dev = Transcript()
    folded_d, w0_d, proof_d = dn.prove(acc, w_acc_dev, cm_i, w_i_dev, t_dev)

    assert t_host.ch.state == t_dev.ch.state
    assert folded_h == folded_d
    assert proof_h["linearization"]["sumcheck"] == \
        proof_d["linearization"]["sumcheck"]
    assert proof_h["linearization"]["u"] == proof_d["linearization"]["u"]
    assert proof_h["folding"]["sumcheck"] == proof_d["folding"]["sumcheck"]
    assert proof_h["folding"]["theta_s"] == proof_d["folding"]["theta_s"]
    assert proof_h["folding"]["eta_s"] == proof_d["folding"]["eta_s"]
    np.testing.assert_array_equal(np.asarray(gl.to_int(w0_h.f)),
                                  np.asarray(gl.to_int(engine.get(w0_d.f))))
