"""Two CHAINED device folds must match the host NIFS chain.

Regression guard for the round-3 class of bug where per-proof constants
(betas, eqf tables) were baked into a shape-keyed jit closure: the 1st fold
worked, and the 2nd fold with identical shapes silently reused the 1st
fold's constants (advisor r03, high).  Single-fold parity tests can never
catch that — this chains fold(i) -> fold(i+1) through the same DeviceNifs
(same cached kernels) and checks transcript + proof equality per step.

Mirrors the reference main loop shape (zkvm/src/main.rs:121-208: each fold
consumes the previous accumulator) at the small-fixture scale.
"""

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


@pytest.mark.slow
def test_two_chained_folds_match_host():
    ccs = get_test_ccs()
    scheme = None
    cms, wits = [], []
    for x in (3, 5):
        z_host = get_test_z(x)
        w_dev = z_to_device(z_host[2:])
        wit = Witness.from_w_ccs(w_dev, TEST_B, TEST_L)
        if scheme is None:
            scheme = AjtaiScheme.from_seed(kappa=4, n=wit.f[0].shape[0],
                                           row_constant=True)
        cms.append(CCCS(cm=scheme.commit_host(wit.f), x_ccs=z_host[:1]))
        wits.append(wit)
    acc_w = gl.zeros((ccs.n - ccs.l - 1, 24))
    acc_wit = Witness.from_w_ccs(acc_w, TEST_B, TEST_L)
    acc_cm = scheme.commit_host(acc_wit.f)
    acc, _, _ = lin.prove(CCCS(cm=acc_cm, x_ccs=[H.ntt_zero()]), acc_wit,
                          Transcript(), ccs)

    # host chain
    acc_h, w_h = acc, acc_wit
    host_proofs, host_states = [], []
    for cm_i, wit in zip(cms, wits):
        t = Transcript()
        acc_h, w_h, proof = nifs.prove(acc_h, w_h, cm_i, wit, t, ccs,
                                       scheme, PARAMS)
        host_proofs.append(proof)
        host_states.append((list(t.ch.state), acc_h))

    # device chain through ONE DeviceNifs (cached kernels reused in fold 2)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from latticeum_tpu.zkvm.accel import DeviceEngine
    from latticeum_tpu.zkvm.accel_nifs import DeviceNifs
    engine = DeviceEngine(ccs, PARAMS, tail_threshold=2)
    engine.sum_chunk_bytes = 64
    rows_host = [[int(v) for v in r]
                 for r in gl.to_int((np.asarray(scheme.matrix[0][:, 0, :]),
                                     np.asarray(scheme.matrix[1][:, 0, :])))]
    dn = DeviceNifs(engine, ccs, PARAMS, rows_host, t_layout=True)
    acc_d = acc
    w_d = dn.build_witness(engine.put(acc_wit.w_ccs))
    for step, (cm_i, wit) in enumerate(zip(cms, wits)):
        w_i = dn.build_witness(engine.put(wit.w_ccs))
        t = Transcript()
        acc_d, w_d, proof_d = dn.prove(acc_d, w_d, cm_i, w_i, t)
        assert list(t.ch.state) == host_states[step][0], \
            f"transcript diverged at chained fold {step}"
        assert acc_d == host_states[step][1], \
            f"accumulator diverged at chained fold {step}"
        ph = host_proofs[step]
        assert ph["linearization"]["sumcheck"] == \
            proof_d["linearization"]["sumcheck"]
        assert ph["folding"]["sumcheck"] == proof_d["folding"]["sumcheck"]
