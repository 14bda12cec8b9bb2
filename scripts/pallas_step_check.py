"""Production-scale correctness check of the Pallas fold path: prove 2
IVC steps with LATTICEUM_PALLAS=1 and =0 (same guest, same scheme) and
compare the full chain state — acc_comm, ivc_step_comm, and the folding
sum-check proof — which are deterministic functions of the transcript.
Any divergence in the Pallas comb would change every digest."""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(pallas: bool):
    os.environ["LATTICEUM_PALLAS"] = "1" if pallas else "0"
    # fresh interpreter state per run would be cleaner; jit caches are
    # keyed by the branch (separate keys), so in-process is fine
    from latticeum_tpu.vm.assembler import fib_const_guest
    from latticeum_tpu.vm.vm import new_vm_1mb
    from latticeum_tpu.zkvm.prover import ZkVmProver

    prover = ZkVmProver(device=True, t_layout=True, tail_threshold=512,
                        log=lambda m: print(f"  [{'P' if pallas else 'X'}]"
                                            f" {m}", file=sys.stderr))
    vm = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
    state = prover.prove_vm(vm, max_steps=2)
    return (list(state.acc_comm), list(state.ivc_step_comm),
            state.folding_proof["folding"]["sumcheck"])


if __name__ == "__main__":
    acc_p, step_p, sc_p = run(True)
    acc_x, step_x, sc_x = run(False)
    ok = (acc_p == acc_x) and (step_p == step_x) and (sc_p == sc_x)
    print(json.dumps({"check": "pallas_vs_xla_2step",
                      "acc_equal": acc_p == acc_x,
                      "step_comm_equal": step_p == step_x,
                      "fold_sumcheck_equal": sc_p == sc_x,
                      "pass": ok}))
    sys.exit(0 if ok else 1)
