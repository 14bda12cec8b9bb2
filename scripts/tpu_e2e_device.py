"""End-to-end device-prover validation on the real TPU: folds N steps of the
fib guest through the device-resident NIFS (debug: device CCS relation check
+ native host verify per fold), logging per-phase timings."""

import faulthandler
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)
sys.path.insert(0, "/root/repo")

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
DEBUG = "--no-debug" not in sys.argv

t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


def main():
    from latticeum_tpu.vm.assembler import fib_const_guest
    from latticeum_tpu.vm.vm import new_vm_1mb
    from latticeum_tpu.zkvm.prover import ZkVmProver

    prover = ZkVmProver(device=True, t_layout=True, debug=DEBUG, log=log)
    log("prover ready (ccs + device engine built)")
    vm = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))

    state = prover.prove_vm(
        vm, max_steps=STEPS,
        on_step=lambda s, st: log(
            f"step {s} folded ({prover.timings['step_times'][-1]:.1f}s)"))
    log(f"folded {state.steps} steps; acc_comm={state.acc_comm}")
    log("TPU E2E DEVICE RUN: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
