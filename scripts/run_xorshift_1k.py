"""Prove the assembler-built xorshift guest for 1000+ steps on the chip —
the BASELINE configs 4-5 workload class (1k-step chains / batched folding)
and VERDICT r04 item 4.

The guest (vm/assembler.py XORSHIFT_GUEST) is a real multi-function
program: a xorshift32 PRNG subroutine fills a RAM buffer (every SW updates
the incremental Merkle mem-tree + mem-ops chain), then a checksum
subroutine folds it with MUL/XOR/SRLI mixing; the result is pinned against
an independent Python model.  At n_words=64 the trace is 1174 steps.

Mid-run the prover checkpoints every --ckpt-every folds; with --resume-at N
the run STOPS at step N, reloads the newest checkpoint in a FRESH prover,
and continues to completion — proving the checkpoint format under the
>=1000-step load (the reference's 9.5 h EVM attempt died without one,
dp3/content/evaluation.tex:112-121).

Usage: python scripts/run_xorshift_1k.py [--words N] [--max-steps N]
         [--ckpt-every N] [--resume-at N] [--host]
"""

import faulthandler
import json
import signal
import sys
import tempfile
import time

faulthandler.register(signal.SIGUSR1)
sys.path.insert(0, "/root/repo")


def arg(name, default, cast=int):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    from latticeum_tpu.vm.assembler import (xorshift_guest,
                                            xorshift_guest_expected)
    from latticeum_tpu.vm.vm import new_vm_1mb
    from latticeum_tpu.zkvm.prover import ZkVmProver

    words = arg("--words", 64)
    max_steps = arg("--max-steps", 0) or None
    ckpt_every = arg("--ckpt-every", 100)
    resume_at = arg("--resume-at", 0) or None
    device = "--host" not in sys.argv

    t0 = time.time()

    def log(m):
        print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

    import os
    tail = int(os.environ.get("LATTICEUM_TAIL", "512"))
    prover = ZkVmProver(device=device, t_layout=device,
                        tail_threshold=tail)
    log(f"prover ready (device={device}, words={words}, tail={tail})")
    elf = xorshift_guest(words)

    step_t = [time.time()]

    def on_step(step, state):
        step_t.append(time.time())
        if step % 100 == 0 or step < 4:
            log(f"step {step} folded ({step_t[-1]-step_t[-2]:.2f}s)  "
                f"acc_comm[0]={state.acc_comm[0]:#x}")

    ckdir = tempfile.mkdtemp(prefix="lt_xs1k_ckpt_")
    resumed_steps = 0
    if resume_at:
        # leg 1: fold to resume_at with checkpoints, then abandon the
        # prover and restore from disk in a fresh VM + prover
        vm1 = new_vm_1mb().load_elf_data(elf)
        prover.prove_vm(vm1, max_steps=resume_at, on_step=on_step,
                        checkpoint_dir=ckdir, checkpoint_every=ckpt_every)
        log(f"leg 1 done at step {resume_at}; resuming from checkpoint "
            f"in a FRESH prover")
        prover = ZkVmProver(device=device, t_layout=device,
                            tail_threshold=tail)
        resumed_steps = resume_at

    vm = new_vm_1mb().load_elf_data(elf)
    state = prover.prove_vm(vm, max_steps=max_steps, on_step=on_step,
                            checkpoint_dir=ckdir,
                            checkpoint_every=ckpt_every,
                            resume=bool(resume_at))
    wall = time.time() - t0
    steady = sorted(b - a for a, b in zip(step_t[1:], step_t[2:]))
    median = steady[len(steady) // 2] if steady else 0.0

    result = vm.result()
    want = xorshift_guest_expected(words)
    ok = (max_steps is None) and result == want
    log(f"folded {state.steps} steps; median {median:.3f} s/step; "
        f"wall {wall:.0f}s")
    log(f"guest result {result:#x} (expected {want:#x}) "
        f"{'OK' if ok or max_steps else 'MISMATCH'}")
    log(f"final acc_comm = {state.acc_comm}")

    peak_bytes = None
    try:
        import jax
        peak_bytes = jax.devices()[0].memory_stats().get(
            "peak_bytes_in_use")
    except Exception:
        pass
    print(json.dumps({
        "metric": "xorshift_1k_prove",
        "steps": state.steps,
        "resumed_at": resumed_steps or None,
        "median_s_per_step": round(median, 4),
        "wall_s": round(wall, 1),
        "guest_result_ok": bool(ok) if max_steps is None else None,
        "final_acc_comm": [f"{v:#x}" for v in state.acc_comm],
        "peak_hbm_bytes": peak_bytes,
        "checkpoint_every": ckpt_every,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
