"""Validation: run TWO full IVC steps (fold + collect) and check that the
STEP-1 witness — which now contains real folding-proof verifier variables —
satisfies the production CCS.  Also natively verifies each fold on host.

This is the definitive end-to-end check of the folding-verifier gate family
and the collector.  Runs the fold hot path on the TPU (device engine);
the relation check and native NIFS verify run per step via --debug.
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

    device = "--host" not in sys.argv
    prover = ZkVmProver(debug=True, device=device, t_layout=device, log=log)
    log(f"prover ready (device={device})")
    vm = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))

    state = prover.prove_vm(vm, max_steps=2,
                            on_step=lambda s, st: log(f"step {s} folded"))
    log(f"folded {state.steps} steps; debug checks (relation per step + "
        f"native NIFS verify per fold) all passed")
    log("STEP1 VALIDATION: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
