"""CPU equality test for the comp_split (TPU) comb branch.

The per-round sum-check kernels (zkvm/accel_rounds.py) have two comb
bodies: the packed ntt_mul_t form (used on XLA:CPU — the component form
compiles pathologically there at production scale) and the component-split
Fq3 form (used on TPU, where it saves the 24->(8,3) retile per ring mul).
CPU test runs force the packed branch, so the TPU branch's bit-exactness
previously rested only on on-device run logs (advisor r04 #4).

This test forces comp_split=True (plain jax.numpy — runnable on CPU at the
tiny fixture shape) and checks the FULL device NIFS fold against the host
NIFS: transcript state, folded accumulator, and both sum-check proofs.
"""

import numpy as np
import pytest

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
def test_comp_split_branch_matches_host():
    ccs = get_test_ccs()
    z_host = get_test_z(3)
    w_dev = z_to_device(z_host[2:])
    wit = Witness.from_w_ccs(w_dev, TEST_B, TEST_L)
    scheme = AjtaiScheme.from_seed(kappa=4, n=wit.f[0].shape[0],
                                   row_constant=True)
    cm_i = CCCS(cm=scheme.commit_host(wit.f), x_ccs=z_host[:1])
    acc_w = gl.zeros((ccs.n - ccs.l - 1, 24))
    acc_wit = Witness.from_w_ccs(acc_w, TEST_B, TEST_L)
    acc_cm = scheme.commit_host(acc_wit.f)
    acc, _, _ = lin.prove(CCCS(cm=acc_cm, x_ccs=[H.ntt_zero()]), acc_wit,
                          Transcript(), ccs)

    t_host = Transcript()
    folded_h, _, proof_h = nifs.prove(acc, acc_wit, cm_i, wit, t_host,
                                      ccs, scheme, PARAMS)

    from latticeum_tpu.zkvm.accel import DeviceEngine
    from latticeum_tpu.zkvm.accel_nifs import DeviceNifs
    engine = DeviceEngine(ccs, PARAMS, tail_threshold=2)
    engine.sum_chunk_bytes = 64          # force the chunked sums path
    engine.force_comp_split = True       # exercise the TPU comb branch
    rows_host = [[int(v) for v in r]
                 for r in gl.to_int((np.asarray(scheme.matrix[0][:, 0, :]),
                                     np.asarray(scheme.matrix[1][:, 0, :])))]
    dn = DeviceNifs(engine, ccs, PARAMS, rows_host, t_layout=True)
    w_i_dev = dn.build_witness(engine.put(wit.w_ccs))
    w_acc_dev = dn.build_witness(engine.put(acc_wit.w_ccs))
    t_dev = Transcript()
    folded_d, _, proof_d = dn.prove(acc, w_acc_dev, cm_i, w_i_dev, t_dev)

    assert t_host.ch.state == t_dev.ch.state
    assert folded_h == folded_d
    assert proof_h["linearization"]["sumcheck"] == \
        proof_d["linearization"]["sumcheck"]
    assert proof_h["folding"]["sumcheck"] == proof_d["folding"]["sumcheck"]
    assert proof_h["folding"]["theta_s"] == proof_d["folding"]["theta_s"]
