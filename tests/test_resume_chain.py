"""Checkpoint/resume chain equality at small params (env-gated).

Folds 3 steps continuously, then 2 steps with a checkpoint, resumes in a
FRESH prover and folds step 3 — the resumed chain must be bit-identical
(h_i, acc_comm, step_comm, accumulator fields, collector vars).  The exact
divergence class VERDICT r02 weak #6 named: dropping folding_proof_vars
from the serialized state silently changes the first post-resume witness.

Gated with the e2e flag (the m=2^16 host path costs ~minutes per step);
run once per round with the log committed (scripts/validate_resume.py is
the production-scale TPU variant).
"""

import os
import shutil
import tempfile

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("LATTICEUM_E2E"),
    reason="multi-minute e2e; run with LATTICEUM_E2E=1 (log committed)")


def test_resume_chain_equality_small():
    from latticeum_tpu.vm.assembler import fib_const_guest
    from latticeum_tpu.vm.vm import new_vm_1mb
    from latticeum_tpu.zkvm.params import resolve
    from latticeum_tpu.zkvm.prover import ZkVmProver

    params = resolve(B=1 << 16, L=4, B_SMALL=4, K=8, KAPPA=8)
    ckdir = tempfile.mkdtemp(prefix="lt_ckpt_small_")
    try:
        prover = ZkVmProver(params=params, device=False)
        vm_a = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
        st_a = prover.prove_vm(vm_a, max_steps=3)

        vm_b = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
        prover.prove_vm(vm_b, max_steps=2, checkpoint_dir=ckdir,
                        checkpoint_every=2)

        prover2 = ZkVmProver(params=params, device=False)
        vm_c = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
        st_c = prover2.prove_vm(vm_c, max_steps=3, checkpoint_dir=ckdir,
                                resume=True)

        assert st_c.steps == st_a.steps == 3
        assert st_c.acc_comm == st_a.acc_comm
        assert st_c.z_i_comm == st_a.z_i_comm
        assert st_c.ivc_step_comm == st_a.ivc_step_comm
        assert st_c.acc.h == st_a.acc.h
        assert (st_c.acc.r == st_a.acc.r and st_c.acc.v == st_a.acc.v
                and st_c.acc.cm == st_a.acc.cm and st_c.acc.u == st_a.acc.u)
        assert st_c.folding_proof_vars == st_a.folding_proof_vars
    finally:
        shutil.rmtree(ckdir, ignore_errors=True)
