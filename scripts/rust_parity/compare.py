"""Compare Rust-side parity captures against this repo's replication.

Usage (see README.md in this directory for the capture side):

    python scripts/rust_parity/compare.py --rng /tmp/parity_rng.txt \
        [--acc /tmp/parity_acc.txt] [--guest path/to/reference/fib.elf]

--rng: output of the parity_rng example (32 draws of
  GoldilocksRingNTT::rand(test_rng()), 24 u64 coefficients each).  Checked
  against crypto/ark_rng.py's bit-exact ChaCha12/Montgomery replication
  (the chain already pinned by tests/golden_ajtai_ring.json).

--acc: PARITY acc_comm lines from the patched reference run.  Checked
  against a reference_scheme=True fib-100 prover run here (pass --guest
  with the reference's actual guest ELF for an apples-to-apples chain;
  defaults to the synthesized fib_const_guest, which matches the guest's
  RESULT but not its exact instruction stream/state chain).

  NOTE: the reference must ALSO carry the one-line vm_mem_comm patch from
  README.md §4 in this directory — this repo intentionally commits memory
  with the page-Merkle tree everywhere, while the unpatched reference uses
  a flat digest for z_0 (PARITY.md §memory-commitment divergence); without
  the patch the digest chains legitimately differ from step 0.
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def parse_u64_lists(path):
    """Extract rows of >= 4 u64s from arbitrary rust println output."""
    rows = []
    for line in open(path):
        nums = [int(x) for x in re.findall(r"\d+", line)]
        nums = [n for n in nums if n < (1 << 64)]
        if len(nums) >= 4:
            rows.append(nums[-24:] if len(nums) >= 24 else nums[-4:])
    return rows


def check_rng(path):
    from latticeum_tpu.crypto import ark_rng
    want = parse_u64_lists(path)
    rng = ark_rng.ark_test_rng()
    ok = True
    for k, row in enumerate(want):
        got = ark_rng.ring_ntt_rand(rng)
        if list(row) != got:
            print(f"RNG row {k}: MISMATCH\n  rust: {row}\n  here: {got}")
            ok = False
        else:
            print(f"RNG row {k}: ok")
    golden = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "..", "tests", "golden_ajtai_ring.json")
    pinned = json.load(open(golden))
    if want and list(want[0]) == list(pinned)[:len(want[0])]:
        print("RNG row 0 also matches tests/golden_ajtai_ring.json")
    return ok


def check_acc(path, guest=None, steps=16):
    from latticeum_tpu.vm.assembler import fib_const_guest
    from latticeum_tpu.vm.vm import new_vm_8mb, new_vm_1mb
    from latticeum_tpu.zkvm.prover import ZkVmProver

    want = parse_u64_lists(path)
    prover = ZkVmProver(reference_scheme=True, device=False)
    if guest:
        vm = new_vm_8mb().load_elf(guest)
    else:
        vm = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
        print("NOTE: using the synthesized fib guest — the state chain "
              "only matches the reference if its guest ELF is identical; "
              "pass --guest with the reference ELF for the real check")
    got = []

    def on_step(step, state):
        got.append([int(v) for v in state.acc_comm])

    prover.prove_vm(vm, max_steps=min(steps, len(want)), on_step=on_step)
    ok = True
    for k, (w, g) in enumerate(zip(want[1:], got)):  # want[0] = step 0
        if list(w)[:4] != g[:4]:
            print(f"acc_comm step {k+1}: MISMATCH\n  rust: {w}\n  here: {g}")
            ok = False
        else:
            print(f"acc_comm step {k+1}: ok")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rng")
    ap.add_argument("--acc")
    ap.add_argument("--guest")
    args = ap.parse_args()
    ok = True
    if args.rng:
        ok &= check_rng(args.rng)
    if args.acc:
        ok &= check_acc(args.acc, guest=args.guest)
    if not (args.rng or args.acc):
        ap.error("pass --rng and/or --acc")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
