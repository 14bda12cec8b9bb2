"""Prove the memory-churn guest end-to-end with checkpointing — the
EVM-scale substitute workload (the reference's stretch guest is the REVM
block re-execution, guests/evm/src/main.rs; its 9.5 h attempt died WITHOUT
checkpointing, dp3/content/evaluation.tex:112-121).

Strided read-modify-write sweeps over paged RAM: every step updates the
incremental Merkle mem-tree and extends the mem-ops hash chain; LW/BLTU
take the gateless-opcode path (warn-only in the reference, ccs.rs:958).
Periodic checkpoints exercise the resume format under real load.

Usage: python scripts/run_mem_churn.py [--pages N] [--passes N]
         [--stride N] [--max-steps N] [--ckpt-every N] [--debug] [--host]

Reports steady-state s/step, total wall, peak device memory, and writes a
JSON summary line.
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
    from latticeum_tpu.vm.assembler import mem_churn_guest
    from latticeum_tpu.vm.vm import new_vm_1mb
    from latticeum_tpu.zkvm.prover import ZkVmProver

    pages = arg("--pages", 16)
    passes = arg("--passes", 1)
    stride = arg("--stride", 512)
    max_steps = arg("--max-steps", 0) or None
    ckpt_every = arg("--ckpt-every", 100)
    debug = "--debug" in sys.argv
    device = "--host" not in sys.argv

    t0 = time.time()

    def log(m):
        print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

    prover = ZkVmProver(debug=debug, device=device, t_layout=device)
    log(f"prover ready (device={device}, debug={debug}, pages={pages}, "
        f"passes={passes}, stride={stride})")
    vm = new_vm_1mb().load_elf_data(
        mem_churn_guest(pages=pages, passes=passes, stride=stride))

    step_t = [time.time()]
    mem_ops = [0]

    def on_step(step, state):
        step_t.append(time.time())
        if step % 50 == 0 or step < 4:
            log(f"step {step} folded ({step_t[-1]-step_t[-2]:.2f}s)")

    ckdir = tempfile.mkdtemp(prefix="lt_churn_ckpt_")
    state = prover.prove_vm(vm, max_steps=max_steps, on_step=on_step,
                            checkpoint_dir=ckdir,
                            checkpoint_every=ckpt_every)
    wall = time.time() - t0
    steady = [b - a for a, b in zip(step_t[1:], step_t[2:])]
    steady_s = sum(steady) / max(len(steady), 1)

    peak_bytes = None
    try:
        import jax
        stats = jax.devices()[0].memory_stats()
        peak_bytes = stats.get("peak_bytes_in_use")
    except Exception:
        pass

    log(f"folded {state.steps} steps; steady-state {steady_s:.3f} s/step; "
        f"wall {wall:.0f}s")
    log(f"final acc_comm = {state.acc_comm}")
    print(json.dumps({
        "metric": "mem_churn_prove",
        "steps": state.steps,
        "steady_s_per_step": round(steady_s, 4),
        "wall_s": round(wall, 1),
        "peak_hbm_bytes": peak_bytes,
        "checkpoint_every": ckpt_every,
        "debug": debug,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
