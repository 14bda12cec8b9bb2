"""Full Fibonacci-100 IVC run — the reference's canonical demo
(main.rs:53-235): execute the fib guest, fold EVERY instruction through the
LatticeFold NIFS with --debug (CCS relation check per step + native NIFS
verify per fold), assert the result 0xc594bfc3 (main.rs:221), and report
per-step times and the final accumulator commitment digest.

Default: device (TPU) hot path.  `--host` forces the numpy prover.
"""

import faulthandler
import json
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
        print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

    device = "--host" not in sys.argv
    debug = "--nodebug" not in sys.argv
    prover = ZkVmProver(debug=debug, device=device, t_layout=device,
                        log=log if "--verbose" in sys.argv else None)
    log(f"prover ready (device={device}, debug={debug})")
    vm = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))

    step_t = [time.time()]

    def on_step(step, state):
        step_t.append(time.time())
        log(f"step {step} folded ({step_t[-1]-step_t[-2]:.2f}s)")

    state = prover.prove_vm(vm, on_step=on_step)
    result = vm.result()
    log(f"guest result = {result:#x}")
    assert result == 0xC594BFC3, f"fib-100 result mismatch: {result:#x}"
    log(f"folded {state.steps} steps; debug checks "
        f"{'(relation + native verify per fold) all passed' if debug else 'off'}")
    log(f"final acc_comm = {state.acc_comm}")
    steady = [b - a for a, b in zip(step_t[1:], step_t[2:])]
    if steady:
        log(f"steady-state step time: {sum(steady)/len(steady):.3f}s")
    print(json.dumps({"steps": state.steps, "result": hex(result),
                      "acc_comm": state.acc_comm,
                      "step_times": [round(b - a, 3) for a, b
                                     in zip(step_t, step_t[1:])]}))
    log("FIB100 VALIDATION: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
