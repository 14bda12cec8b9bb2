"""zkVM component tests: layout constants, builder shape, commitments."""

import numpy as np
import pytest

from latticeum_tpu.crypto import poseidon2 as p2b, poseidon2_ref as p2
from latticeum_tpu.field import goldilocks as gl
from latticeum_tpu.zkvm import commitments as zc
from latticeum_tpu.zkvm.layout import CCSLayout
from latticeum_tpu.zkvm.params import default_params


def test_layout_matches_reference_constants():
    p = default_params()
    lay = CCSLayout(p)
    assert p.ccs_s == 17
    assert lay.w_size == 19763          # SURVEY §2.7 computed constants
    assert lay.z_size == 19768
    assert lay.w_size * p.L == 98815    # Ajtai N


def test_builder_shape():
    from latticeum_tpu.zkvm.builder import create_riscv_ccs
    lay = CCSLayout(default_params())
    ccs = create_riscv_ccs(lay)
    assert (ccs.t, ccs.q, ccs.d) == (125, 52, 7)
    assert ccs.m == 1 << 17 and ccs.n == 19768 and ccs.l == 4
    # flat multiset traversal covers every matrix exactly once, and each
    # multiset occupies its own index positions (linearization comb relies
    # on this — see builder docstring)
    flat = [j for S in ccs.S for j in S]
    assert sorted(flat) == list(range(125))
    pos = 0
    for S in ccs.S:
        assert sorted(flat[pos:pos + len(S)]) == sorted(S)
        pos += len(S)


def test_merkle_tree_open_verify():
    rows = [[i, i + 1, i * 7, 5] for i in range(16)]
    layers = zc.merkle_levels([p2.hash_narrow(r) for r in rows])
    root = layers[-1][0]
    for idx in (0, 7, 15):
        proof = zc.merkle_open(layers, idx)
        assert zc.merkle_verify(root, p2.hash_narrow(rows[idx]), idx, proof)
    assert not zc.merkle_verify(root, p2.hash_narrow(rows[0]), 1,
                                zc.merkle_open(layers, 1))


def test_batched_merkle_matches_scalar():
    rows = np.arange(8 * 12, dtype=np.uint64).reshape(8, 12)
    levels = p2b.merkle_root_rows(rows)
    got_root = [int(v) for v in gl.to_int(levels[-1])[0]]
    scalar = zc.merkle_root_of_rows([list(map(int, r)) for r in rows])
    assert got_root == scalar


def test_nonpow2_code_comm_padding():
    c = zc.ZkVmCommitter()
    # 5 halfwords -> padded to 8 leaves with zero digests
    comm = c.vm_code_comm(bytes(range(10)))
    leaves = [p2.hash_narrow([int.from_bytes(bytes(range(10))[i:i + 2],
                                             "little")])
              for i in range(0, 10, 2)]
    layers = zc.merkle_levels(leaves)
    assert comm == layers[-1][0]


def test_mem_ops_chain():
    from latticeum_tpu.vm.vm import MemoryOperation
    c = zc.ZkVmCommitter()
    op = MemoryOperation(cycle=3, address=0x40, value=9, is_write=True)
    got = c.vm_mem_ops_vec_comm([1, 2, 3, 4], op)
    assert got == p2.perm8([1, 2, 3, 4, 3, 0x40, 9, 0])[:4]


def test_incremental_mem_tree():
    from latticeum_tpu.vm.vm import VM
    from latticeum_tpu.zkvm.prover import IncrementalMemTree
    vm = VM(words_per_page=8, page_count=16)
    vm.instructions = {}
    tree = IncrementalMemTree(vm)
    root0 = tree.root
    vm.write_mem(0x40, 1234)            # page 2 (8 words * 4 bytes = 32B/page)
    page_idx, _ = vm.physical_addr(0x40)
    tree.update_page(page_idx)
    assert tree.root != root0
    # recompute from scratch agrees
    fresh = IncrementalMemTree(vm)
    assert fresh.root == tree.root
    # opening verifies
    proof = tree.open(page_idx)
    assert zc.merkle_verify(tree.root, p2.hash_narrow(vm.page_words(page_idx)),
                            page_idx, proof)


def test_checkpoint_roundtrip(tmp_path):
    import json
    from latticeum_tpu.field import host as H
    from latticeum_tpu.nifs.structs import LCCCS, Witness
    from latticeum_tpu.vm.vm import VM
    from latticeum_tpu.zkvm import checkpoint as ckpt
    from latticeum_tpu.zkvm.prover import IVCState
    from latticeum_tpu.zkvm.params import ZkVmParams

    params = ZkVmParams(B=1024, L=2, B_SMALL=2, K=10, ccs_s=3)
    vm = VM(words_per_page=8, page_count=16)
    vm.instructions = {}
    vm.write_mem(0x40, 0xDEAD)
    vm.pc = 0x1234
    vm.regs[5] = 99

    import random
    rng = random.Random(4)
    ring = lambda: [rng.randrange(H.P) for _ in range(24)]
    acc = LCCCS(r=[ring() for _ in range(3)], v=[ring() for _ in range(3)],
                cm=[ring() for _ in range(2)], u=[ring() for _ in range(3)],
                x_w=[ring()], h=ring())
    from latticeum_tpu.field import goldilocks as gl
    import numpy as np
    w = gl.from_int(np.array([ring() for _ in range(4)], dtype=object))
    wit = Witness.from_w_ccs(w, params.B, params.L)
    state = IVCState(ivc_step_comm=([1, 2, 3, 4], [{"after_initial_mds": [0] * 16,
                                                    "after_ext_init": [[0] * 16] * 4,
                                                    "after_internal": [[0] * 16] * 22,
                                                    "after_ext_term": [[0] * 16] * 4}] * 2),
                     ivc_step=7, z_0_comm=[9, 8, 7, 6], z_i_comm=[5, 4, 3, 2],
                     acc_comm=[1, 1, 2, 2], acc=acc, w_acc=wit,
                     folding_proof=None, folding_proof_vars=None)
    path = str(tmp_path / "ivc_step_7.npz")
    ckpt.save(path, state, vm, [11, 12, 13, 14], params)

    vm2 = VM(words_per_page=8, page_count=16)
    vm2.instructions = {}
    meta, acc2, wit2, step_comm = ckpt.load(path, vm2, params)
    assert meta["step"] == 7 and vm2.pc == 0x1234 and vm2.regs[5] == 99
    assert vm2.read_mem(0x40) == 0xDEAD
    assert acc2 == acc
    np.testing.assert_array_equal(np.asarray(gl.to_int(wit2.f)),
                                  np.asarray(gl.to_int(wit.f)))
    assert step_comm[0] == [1, 2, 3, 4]
    assert ckpt.latest(str(tmp_path)) == path


def test_gateless_branch_opcode_sets_branching():
    """Opcodes without dedicated gates (warn-only in the reference,
    ccs.rs:958) must still satisfy the universal pc gate
    (1-is_br)(pc_out - pc_in - size) when they branch (e.g. BLTU in the
    memory-churn guest)."""
    from latticeum_tpu.vm.decoder import Inst
    from latticeum_tpu.vm.vm import ExecutionTrace, SideEffects, Snapshot
    from latticeum_tpu.zkvm.witness import set_trace_witness

    lay = CCSLayout(default_params())
    regs = [0] * 32
    trace = ExecutionTrace(
        cycle=0,
        input=Snapshot(pc=0x100, regs=list(regs)),
        output=Snapshot(pc=0x0F0, regs=list(regs)),
        instruction=Inst(name="BLTU", raw_word=0, size=4,
                         args={"rs1": 10, "rs2": 11, "offset": -16}),
        side_effects=SideEffects(branched_to=0x0F0),
    )
    z = [0] * lay.z_size
    set_trace_witness(z, trace, lay)
    assert z[lay.is_branching_idx] == 1
    assert z[lay.branched_to_idx] == 0x0F0
    # pc gate residual is exactly zero
    assert (1 - z[lay.is_branching_idx]) * (
        z[lay.pc_out_idx] - z[lay.pc_in_idx]
        - z[lay.instruction_size_idx]) == 0
    # non-branching unknown opcode keeps the plain pc path
    trace2 = ExecutionTrace(
        cycle=1,
        input=Snapshot(pc=0x100, regs=list(regs)),
        output=Snapshot(pc=0x104, regs=list(regs)),
        instruction=Inst(name="LW", raw_word=0, size=4,
                         args={"rd": 5, "rs1": 10, "offset": 0}),
        side_effects=SideEffects(),
    )
    z2 = [0] * lay.z_size
    set_trace_witness(z2, trace2, lay)
    assert z2[lay.is_branching_idx] == 0
