"""Validation: the step-0 zkVM witness satisfies the full production CCS.

Exercises: layout, builder gates (Poseidon2 + RISC-V + zero-gated folding
region), arithmetize, commitments, and the initial accumulator. Writes
PASS/FAIL to stdout.
"""

import faulthandler, signal, sys, time
faulthandler.register(signal.SIGUSR1)

sys.path.insert(0, "/root/repo")

import numpy as np

from latticeum_tpu.field import goldilocks as gl, host as H
from latticeum_tpu.vm.assembler import fib_const_guest
from latticeum_tpu.vm.vm import new_vm_1mb
from latticeum_tpu.zkvm.prover import ZkVmProver
from latticeum_tpu.zkvm.witness import IVCStepInput, arithmetize
from latticeum_tpu.zkvm.commitments import ZERO_COMM


def main():
    t0 = time.time()
    prover = ZkVmProver()
    print(f"[{time.time()-t0:.1f}s] prover built (ccs t={prover.ccs.t} "
          f"q={prover.ccs.q} m={prover.ccs.m})", flush=True)

    vm = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
    committer = prover.committer
    code_comm = committer.vm_code_comm(vm.elf.raw_code.bytes)
    mem_comm = committer.vm_mem_comm(vm)
    print(f"[{time.time()-t0:.1f}s] commitments ready", flush=True)

    z0 = prover._state_comm(code_comm, vm.pc, mem_comm, vm.regs, ZERO_COMM)
    from latticeum_tpu.nifs import linearization as _lin
    _orig = _lin.prove
    def _patched(cm_i, wit, transcript, ccs, log=None):
        return _orig(cm_i, wit, transcript, ccs,
                     log=lambda m: print(m, flush=True))
    _lin.prove = _patched
    acc, w_acc = prover.initialize_accumulator()
    _lin.prove = _orig
    print(f"[{time.time()-t0:.1f}s] initial accumulator done", flush=True)
    acc_comm = committer.acc_comm(acc)
    step0 = committer.ivc_step_comm(0, z0, z0, acc_comm)

    # first trace
    traces = []
    vm2 = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
    vm2.run(lambda t, _vm: traces.append(t), max_cycles=50)
    trace0 = traces[0]
    print(f"[{time.time()-t0:.1f}s] first trace: {trace0.instruction.name}",
          flush=True)

    inp = IVCStepInput(ivc_step_comm=step0, ivc_step=0, state_0_comm=z0,
                       state_comm=z0, acc_comm=acc_comm, acc=acc,
                       folding_proof_vars=None, w_acc=w_acc, trace=trace0)
    z = arithmetize(inp, prover.layout)
    print(f"[{time.time()-t0:.1f}s] arithmetized, checking relation...",
          flush=True)
    try:
        prover._check_relation(z, trace0)
        print(f"[{time.time()-t0:.1f}s] STEP0 CHECK_RELATION: PASS",
              flush=True)
    except AssertionError as e:
        print(f"STEP0 CHECK_RELATION: FAIL — {e}", flush=True)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
