"""Validation: run ONE full IVC step (fold + collect) and check that the
STEP-1 witness — which now contains real folding-proof verifier variables —
satisfies the production CCS.  Also natively verifies the fold.

This is the definitive end-to-end check of the folding-verifier gate family
and the collector.  Runs ~20-40 min in numpy; intended for background runs.
"""

import faulthandler
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)
sys.path.insert(0, "/root/repo")


def main():
    from latticeum_tpu.vm.assembler import fib_const_guest
    from latticeum_tpu.vm.vm import new_vm_1mb
    from latticeum_tpu.zkvm.prover import ZkVmProver

    t0 = time.time()

    def log(msg):
        print(f"[{time.time()-t0:.1f}s] {msg}", flush=True)

    prover = ZkVmProver(debug=True)
    log("prover ready")
    vm = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))

    state = prover.prove_vm(vm, max_steps=2,
                            on_step=lambda s, st: log(f"step {s} folded"))
    log(f"folded {state.steps} steps; debug checks (relation per step + "
        f"native NIFS verify per fold) all passed")
    log("STEP1 VALIDATION: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
