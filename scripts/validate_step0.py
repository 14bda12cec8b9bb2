"""Validation: the step-0 zkVM witness satisfies the full production CCS.

Exercises: layout, builder gates (Poseidon2 + RISC-V + zero-gated folding
region), arithmetize, commitments, and the initial accumulator. Writes
PASS/FAIL to stdout.

Backends (the hot path — lin sum-check + relation residual — is jitted
through the device engine):
    default : device engine on jax-CPU (fast host validation, ~1 min)
    --tpu   : device engine on the real chip
    --host  : legacy pure-numpy path (~11 min; the bit-exact oracle)
"""

import faulthandler, signal, sys, time
faulthandler.register(signal.SIGUSR1)

sys.path.insert(0, "/root/repo")


def main():
    host = "--host" in sys.argv
    tpu = "--tpu" in sys.argv
    if not tpu:
        import os
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              "/tmp/latticeum_jax_cache_cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np  # noqa: F401

    from latticeum_tpu.vm.assembler import fib_const_guest
    from latticeum_tpu.vm.vm import new_vm_1mb
    from latticeum_tpu.zkvm.prover import ZkVmProver
    from latticeum_tpu.zkvm.witness import IVCStepInput, arithmetize
    from latticeum_tpu.zkvm.commitments import ZERO_COMM

    t0 = time.time()

    def log(m):
        print(f"[{time.time()-t0:.1f}s] {m}", flush=True)

    prover = ZkVmProver(device=not host, t_layout=not host, log=log)
    log(f"prover built (ccs t={prover.ccs.t} q={prover.ccs.q} "
        f"m={prover.ccs.m}, backend={'numpy' if host else 'device'})")

    vm = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
    committer = prover.committer
    code_comm = committer.vm_code_comm(vm.elf.raw_code.bytes)
    mem_comm = committer.vm_mem_comm(vm)
    log("commitments ready")

    z0 = prover._state_comm(code_comm, vm.pc, mem_comm, vm.regs, ZERO_COMM)
    acc, w_acc = prover.initialize_accumulator()
    log("initial accumulator done")
    acc_comm = committer.acc_comm(acc)
    step0 = committer.ivc_step_comm(0, z0, z0, acc_comm)

    # first trace
    traces = []
    vm2 = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
    vm2.run(lambda t, _vm: traces.append(t), max_cycles=50)
    trace0 = traces[0]
    log(f"first trace: {trace0.instruction.name}")

    inp = IVCStepInput(ivc_step_comm=step0, ivc_step=0, state_0_comm=z0,
                       state_comm=z0, acc_comm=acc_comm, acc=acc,
                       folding_proof_vars=None, w_acc=w_acc, trace=trace0)
    z = arithmetize(inp, prover.layout)
    log("arithmetized, checking relation...")
    try:
        prover._check_relation(z, trace0)
        log("STEP0 CHECK_RELATION: PASS")
    except AssertionError as e:
        print(f"STEP0 CHECK_RELATION: FAIL — {e}", flush=True)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
