"""Quick parity check of the per-round sum-check runners vs the host NIFS
on the small test fixture, with phase timestamps (debug harness)."""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

t0 = time.time()


def log(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


from latticeum_tpu import backend as B  # noqa: E402
from latticeum_tpu.commit.ajtai import AjtaiScheme  # noqa: E402
from latticeum_tpu.crypto.transcript import Transcript  # noqa: E402
from latticeum_tpu.field import goldilocks as gl, host as H  # noqa: E402
from latticeum_tpu.nifs import linearization as lin, nifs  # noqa: E402
from latticeum_tpu.nifs.nifs import DecompositionParams  # noqa: E402
from latticeum_tpu.nifs.structs import CCCS, Witness  # noqa: E402
from latticeum_tpu.nifs.test_fixtures import (TEST_B, TEST_B_SMALL, TEST_K,
                                              TEST_L, get_test_ccs,
                                              get_test_z,
                                              z_to_device)  # noqa: E402

PARAMS = DecompositionParams(B=TEST_B, L=TEST_L, B_SMALL=TEST_B_SMALL,
                             K=TEST_K)

log("imports done")
ccs = get_test_ccs()
z_host = get_test_z(3)
w_dev = z_to_device(z_host[2:])
wit = Witness.from_w_ccs(w_dev, TEST_B, TEST_L)
scheme = AjtaiScheme.from_seed(kappa=4, n=wit.f[0].shape[0],
                               row_constant=True)
cm = scheme.commit_host(wit.f)
cm_i = CCCS(cm=cm, x_ccs=z_host[:1])
acc_w = gl.zeros((ccs.n - ccs.l - 1, 24))
acc_wit = Witness.from_w_ccs(acc_w, TEST_B, TEST_L)
acc_cm = scheme.commit_host(acc_wit.f)
acc, _, _ = lin.prove(CCCS(cm=acc_cm, x_ccs=[H.ntt_zero()]), acc_wit,
                      Transcript(), ccs)
log("fixture built")

t_host = Transcript()
folded_h, w0_h, proof_h = nifs.prove(acc, acc_wit, cm_i, wit, t_host,
                                     ccs, scheme, PARAMS)
log("host NIFS done")

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
from latticeum_tpu.zkvm.accel import DeviceEngine  # noqa: E402
from latticeum_tpu.zkvm.accel_nifs import DeviceNifs  # noqa: E402

engine = DeviceEngine(ccs, PARAMS, tail_threshold=2)
engine.sum_chunk_bytes = 64
rows_host = [[int(v) for v in r]
             for r in gl.to_int((np.asarray(scheme.matrix[0][:, 0, :]),
                                 np.asarray(scheme.matrix[1][:, 0, :])))]
dn = DeviceNifs(engine, ccs, PARAMS, rows_host, t_layout=True)
log("device engine built")
w_i_dev = dn.build_witness(engine.put(wit.w_ccs))
w_acc_dev = dn.build_witness(engine.put(acc_wit.w_ccs))
log("witnesses built")
t_dev = Transcript()
folded_d, w0_d, proof_d = dn.prove(acc, w_acc_dev, cm_i, w_i_dev, t_dev,
                                   log=log)
log("device NIFS done")

assert t_host.ch.state == t_dev.ch.state, "transcript mismatch"
assert folded_h == folded_d, "folded mismatch"
assert proof_h["linearization"]["sumcheck"] == \
    proof_d["linearization"]["sumcheck"], "lin sumcheck mismatch"
assert proof_h["folding"]["sumcheck"] == proof_d["folding"]["sumcheck"], \
    "fold sumcheck mismatch"
assert proof_h["folding"]["theta_s"] == proof_d["folding"]["theta_s"]
log("PARITY PASS")
