"""Equivalence check: transposed bit-reversed device sum-check == host."""

import faulthandler
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import conftest  # noqa: F401  (forces CPU platform)

import numpy as np

from latticeum_tpu import backend as B
from latticeum_tpu.commit.ajtai import AjtaiScheme
from latticeum_tpu.crypto.transcript import Transcript
from latticeum_tpu.field import goldilocks as gl
from latticeum_tpu.nifs import linearization as lin
from latticeum_tpu.nifs.linearization import make_comb_fn2
from latticeum_tpu.nifs.nifs import DecompositionParams
from latticeum_tpu.nifs.structs import CCCS, Witness
from latticeum_tpu.nifs.test_fixtures import (TEST_B, TEST_B_SMALL, TEST_K,
                                              TEST_L, get_test_ccs,
                                              get_test_z, z_to_device)
from latticeum_tpu.zkvm import accel_t
from latticeum_tpu.zkvm.accel import DeviceEngine


def main():
    ccs = get_test_ccs()
    z_host = get_test_z(3)
    wit = Witness.from_w_ccs(z_to_device(z_host[2:]), TEST_B, TEST_L)
    scheme = AjtaiScheme.from_seed(kappa=4, n=wit.f[0].shape[0])
    cm_i = CCCS(cm=scheme.commit_host(wit.f), x_ccs=z_host[:1])

    t_h = Transcript()
    lc_h, proof_h, _ = lin.prove(cm_i, wit, t_h, ccs)

    params = DecompositionParams(B=TEST_B, L=TEST_L, B_SMALL=TEST_B_SMALL,
                                 K=TEST_K)
    eng = DeviceEngine(ccs, params, tail_threshold=2)
    t_d = Transcript()
    beta_s = lin.squeeze_beta(t_d, ccs.s)
    z = cm_i.z_vector(wit.w_ccs)
    cap = ccs.m  # full arrays (truncated+bit-reversed covered in accel path)
    mz = ccs.matvecs(z, out_rows=cap)
    nvbits = int(np.log2(cap))
    brev = accel_t.bitrev_indices(nvbits)
    g_lo = np.asarray(mz[0])[:, brev]
    g_hi = np.asarray(mz[1])[:, brev]
    with B.numpy_mode():
        eq_rev = accel_t.build_eq_table_rev(beta_s)
    g_lo = np.concatenate([g_lo, np.asarray(eq_rev[0])[None]])
    g_hi = np.concatenate([g_hi, np.asarray(eq_rev[1])[None]])
    g_t = (np.ascontiguousarray(np.moveaxis(g_lo, 1, 2)),
           np.ascontiguousarray(np.moveaxis(g_hi, 1, 2)))
    g_dev = eng.put(g_t)

    comb_t = accel_t.make_comb_lin_t(tuple(tuple(s) for s in ccs.S))
    accel_t.register_std_comb("lin",
                              make_comb_fn2(tuple(tuple(s) for s in ccs.S)))
    with B.numpy_mode():
        consts = gl.from_int(np.array([list(c) for c in ccs.c], dtype=object))
    consts_dev = eng.put(consts)
    proof_t, chals_t = accel_t.run_sumcheck_t(
        eng, t_d, g_dev, ccs.s, ccs.d + 1, "lin", comb_t, consts_dev,
        eq_info_rev=(beta_s, ccs.t))
    assert proof_t == proof_h["sumcheck"], "sumcheck messages differ"
    print("T-LAYOUT LIN SUMCHECK MATCHES HOST: PASS", flush=True)


if __name__ == "__main__":
    main()
