"""Isolate WHERE the resumed IVC chain diverges from the continuous one.

Runs the device prover: (a) continuous 3 steps capturing every state field
per step; (b) 2 steps with a checkpoint; (c) fresh prover resuming to step
3.  Prints the first differing field at each step boundary.
"""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def snap(state):
    return {
        "step": state.ivc_step,
        "ivc_step_comm0": list(state.ivc_step_comm[0]),
        "z_0_comm": list(state.z_0_comm),
        "z_i_comm": list(state.z_i_comm),
        "acc_comm": list(state.acc_comm),
        "acc_h": list(state.acc.h),
        "acc_r0": list(state.acc.r[0]),
        "acc_v0": list(state.acc.v[0]),
        "acc_cm0": list(state.acc.cm[0]),
        "acc_u0": list(state.acc.u[0]),
        "fvars_digest": _digest(state.folding_proof_vars),
    }


def _digest(obj):
    import hashlib
    import json
    return hashlib.sha1(
        json.dumps(obj, default=int, sort_keys=True).encode()).hexdigest()


def main():
    from latticeum_tpu.vm.assembler import fib_const_guest
    from latticeum_tpu.vm.vm import new_vm_1mb
    from latticeum_tpu.zkvm.prover import ZkVmProver

    t0 = time.time()

    def log(m):
        print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

    prover = ZkVmProver(device=True, t_layout=True)
    log("prover ready")

    snaps_a = {}
    vm_a = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
    prover.prove_vm(vm_a, max_steps=3,
                    on_step=lambda s, st: snaps_a.__setitem__(s, snap(st)))
    log("continuous 3 steps done")

    ckdir = tempfile.mkdtemp(prefix="lt_dbg_")
    snaps_b = {}
    vm_b = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
    prover.prove_vm(vm_b, max_steps=2, checkpoint_dir=ckdir,
                    checkpoint_every=2,
                    on_step=lambda s, st: snaps_b.__setitem__(s, snap(st)))
    log("checkpointed 2 steps done")
    for s in (1, 2):
        diffs = [k for k in snaps_a[s] if snaps_a[s][k] != snaps_b[s][k]]
        log(f"step {s} A-vs-B diffs: {diffs or 'NONE'}")

    prover2 = ZkVmProver(device=True, t_layout=True)
    snaps_c = {}
    vm_c = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
    prover2.prove_vm(vm_c, max_steps=3, checkpoint_dir=ckdir, resume=True,
                     on_step=lambda s, st: snaps_c.__setitem__(s, snap(st)))
    log(f"resumed run reached steps {sorted(snaps_c)}")
    for s in sorted(snaps_c):
        if s in snaps_a:
            diffs = [k for k in snaps_a[s] if snaps_a[s][k] != snaps_c[s][k]]
            log(f"step {s} A-vs-RESUMED diffs: {diffs or 'NONE'}")
            for k in diffs:
                log(f"   {k}: A={snaps_a[s][k]}  C={snaps_c[s][k]}")


if __name__ == "__main__":
    main()
