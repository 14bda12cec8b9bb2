"""Checkpoint/resume chain-equality validation (the check VERDICT weak #6
asked for): fold 4 steps continuously, then fold steps 1-2 with
checkpointing, resume from the step-2 checkpoint in a FRESH prover, fold
steps 3-4, and assert the resumed chain is bit-identical to the continuous
one (h_i, acc commitment digest, step commitment, accumulator fields).

The serialized state includes folding_proof_vars — dropping them used to
silently diverge the first post-resume step's witness (different z ->
different h_i).  Device prover by default; --host for numpy.
"""

import faulthandler
import shutil
import signal
import sys
import tempfile
import time

faulthandler.register(signal.SIGUSR1)
sys.path.insert(0, "/root/repo")


def main():
    from latticeum_tpu.vm.assembler import fib_const_guest
    from latticeum_tpu.vm.vm import new_vm_1mb
    from latticeum_tpu.zkvm.prover import ZkVmProver

    t0 = time.time()

    def log(m):
        print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

    device = "--host" not in sys.argv
    ckdir = tempfile.mkdtemp(prefix="lt_ckpt_")
    try:
        prover = ZkVmProver(device=device, t_layout=device)
        log(f"prover ready (device={device})")

        # continuous 4-step run
        vm_a = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
        st_a = prover.prove_vm(vm_a, max_steps=4)
        log(f"continuous run: {st_a.steps} steps folded")

        # checkpointed 2-step run (same prover/scheme; fresh VM)
        vm_b = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
        prover.prove_vm(vm_b, max_steps=2, checkpoint_dir=ckdir,
                        checkpoint_every=2)
        log("checkpoint written at step 2")

        # FRESH prover resumes from the checkpoint and folds steps 3-4
        prover2 = ZkVmProver(device=device, t_layout=device)
        vm_c = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
        st_c = prover2.prove_vm(vm_c, max_steps=4, checkpoint_dir=ckdir,
                                resume=True)
        log(f"resumed run: reached step {st_c.steps}")

        assert st_c.steps == st_a.steps == 4
        assert st_c.acc_comm == st_a.acc_comm, "acc_comm diverged"
        assert st_c.z_i_comm == st_a.z_i_comm, "state comm diverged"
        assert st_c.ivc_step_comm == st_a.ivc_step_comm, "step comm diverged"
        assert st_c.acc.h == st_a.acc.h, "accumulator h diverged"
        assert st_c.acc.r == st_a.acc.r and st_c.acc.v == st_a.acc.v \
            and st_c.acc.cm == st_a.acc.cm and st_c.acc.u == st_a.acc.u, \
            "accumulator fields diverged"
        assert st_c.folding_proof_vars == st_a.folding_proof_vars, \
            "collector vars diverged"
        log("RESUME CHAIN EQUALITY: PASS")
        return 0
    finally:
        shutil.rmtree(ckdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
