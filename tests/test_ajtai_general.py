"""General (dense, binding) Ajtai commitment on device vs host oracles.

The reference's matrix is row-constant by a PoC quirk
(commitment_scheme.rs:29-33); the framework must also support a real dense
κ×N matvec (commitment_scheme.rs:37-52).  Pins:
  * from_seed_general device commit == direct python-int matvec,
  * the full DeviceNifs fold under a general scheme is transcript-identical
    to the host NIFS with the same scheme.
"""

import numpy as np

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


import pytest

# XLA-compile-heavy tier: minutes on a small host (run with -m 'not slow'
# for the fast host-math tier; the full suite still runs these by default)
pytestmark = pytest.mark.slow


def test_general_commit_matches_int_oracle():
    kappa, n = 3, 7
    scheme = AjtaiScheme.from_seed_general(kappa, n, seed=5)
    rng = np.random.default_rng(1)
    f_int = rng.integers(0, gl.P, size=(n, 24), dtype=np.uint64).astype(
        object)
    with B.numpy_mode():
        f = gl.from_int(f_int)
        got = scheme.commit_host(f)
        mat_int = gl.to_int((np.asarray(scheme.matrix[0]),
                             np.asarray(scheme.matrix[1])))
    from latticeum_tpu.ring import ref_impl as RI
    for k in range(kappa):
        acc = H.ntt_zero()
        for i in range(n):
            acc = H.ntt_add(acc, RI.ntt_mul(list(mat_int[k, i]),
                                            [int(v) for v in f_int[i]]))
        assert got[k] == acc


def test_device_nifs_general_scheme_matches_host():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from latticeum_tpu.zkvm.accel import DeviceEngine
    from latticeum_tpu.zkvm.accel_nifs import DeviceNifs

    ccs = get_test_ccs()
    z_host = get_test_z(3)
    w_dev = z_to_device(z_host[2:])
    wit = Witness.from_w_ccs(w_dev, TEST_B, TEST_L)
    scheme = AjtaiScheme.from_seed_general(4, int(wit.f[0].shape[0]), seed=2)
    cm = scheme.commit_host(wit.f)
    cm_i = CCCS(cm=cm, x_ccs=z_host[:1])
    acc_w = gl.zeros((ccs.n - ccs.l - 1, 24))
    acc_wit = Witness.from_w_ccs(acc_w, TEST_B, TEST_L)
    acc_cm = scheme.commit_host(acc_wit.f)
    acc, _, _ = lin.prove(CCCS(cm=acc_cm, x_ccs=[H.ntt_zero()]), acc_wit,
                          Transcript(), ccs)

    t_host = Transcript()
    folded_h, w0_h, proof_h = nifs.prove(acc, acc_wit, cm_i, wit, t_host,
                                         ccs, scheme, PARAMS)

    engine = DeviceEngine(ccs, PARAMS, tail_threshold=2)
    dn = DeviceNifs(engine, ccs, PARAMS, None, t_layout=True, scheme=scheme)
    assert dn.general_ajtai
    wd = z_to_device(z_host[2:])
    wit_d = dn.build_witness(engine.put((np.asarray(wd[0]),
                                         np.asarray(wd[1]))))
    aw = np.zeros((ccs.n - ccs.l - 1, 24), np.uint32)
    accw_d = dn.build_witness(engine.put((aw, aw)))
    acc_d, _, _ = dn.lin_prove(CCCS(cm=acc_cm, x_ccs=[H.ntt_zero()]), accw_d,
                               Transcript())
    assert acc_d.v == acc.v and acc_d.u == acc.u

    t_dev = Transcript()
    folded_d, w0_d, proof_d = dn.prove(acc_d, accw_d, cm_i, wit_d, t_dev)
    assert proof_d["decomposition_l"]["y_s"] == proof_h["decomposition_l"]["y_s"]
    assert proof_d["folding"]["sumcheck"] == proof_h["folding"]["sumcheck"]
    assert folded_d.cm == folded_h.cm
    assert folded_d.v == folded_h.v
    assert folded_d.u == folded_h.u

    # native verify accepts the device proof
    t_v = Transcript()
    ver = nifs.verify(acc, cm_i, proof_d, t_v, ccs, PARAMS)
    assert ver.cm == folded_d.cm and ver.v == folded_d.v
