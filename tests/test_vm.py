"""VM tests: decoder golden values (pinned instruction stream of the
reference's committed sample ELF), full execution, and instruction-semantics
micro-tests via a dummy VM (mirroring vm.rs test strategy)."""

import os

import pytest

from latticeum_tpu.vm.decoder import Inst, decode_compressed, decode_word
from latticeum_tpu.vm.vm import VM, new_vm_1mb

SAMPLE = "/root/reference/latticeum/crates/vm/samples/fibonacci_100_000"
needs_sample = pytest.mark.skipif(not os.path.exists(SAMPLE),
                                  reason="reference sample ELF unavailable")


@needs_sample
def test_fibonacci_instructions():
    """Pinned decode of the sample guest (vm.rs:475-765)."""
    vm = new_vm_1mb().load_elf_file(SAMPLE)
    insts = vm.instructions
    assert len(insts) == 23
    assert vm.elf.entry_point == 0x110F0

    start = vm.elf.raw_code.start
    expect = {
        start: ("ADDI", dict(rd=11, rs1=0, imm=0), 2, 0x4581),
        0x110D6: ("ADDI", dict(rd=10, rs1=0, imm=1), 2, 0x4505),
        0x110D8: ("LUI", dict(rd=12, imm=0x18), 2, 0x6661),
        0x110DA: ("ADDI", dict(rd=12, rs1=12, imm=1695), 4, 0x69F60613),
        0x110DE: ("ADD", dict(rd=13, rs1=0, rs2=10), 2, 0x86AA),
        0x110E0: ("ADDI", dict(rd=12, rs1=12, imm=-1), 2, 0x167D),
        0x110E2: ("ADD", dict(rd=10, rs1=10, rs2=11), 2, 0x952E),
        0x110E4: ("ADD", dict(rd=11, rs1=0, rs2=13), 2, 0x85B6),
        0x110E6: ("BNE", dict(rs1=12, rs2=0, offset=-8), 2, 0xFE65),
        0x110E8: ("AUIPC", dict(rd=6, imm=0), 4, 0x00000317),
        0x110EC: ("JALR", dict(rd=0, rs1=6, offset=42), 4, 0x02A30067),
        0x110F0: ("AUIPC", dict(rd=3, imm=0xFFFFF), 4, 0xFFFFF197),
        0x110F4: ("ADDI", dict(rd=3, rs1=3, imm=1808), 4, 0x71018193),
        0x110F8: ("LUI", dict(rd=2, imm=0x100), 4, 0x00100137),
        0x110FC: ("AUIPC", dict(rd=1, imm=0), 4, 0x00000097),
        0x11100: ("JALR", dict(rd=1, rs1=1, offset=8), 4, 0x008080E7),
        0x11104: ("ADDI", dict(rd=2, rs1=2, imm=-16), 2, 0x1141),
        0x11106: ("SW", dict(rs1=2, rs2=1, offset=12), 2, 0xC606),
        0x11108: ("AUIPC", dict(rd=1, imm=0), 4, 0x00000097),
        0x1110C: ("JALR", dict(rd=1, rs1=1, offset=-52), 4, 0xFCC080E7),
        0x11110: ("JAL", dict(rd=0, offset=0), 2, 0xA001),
        0x11112: ("SW", dict(rs1=0, rs2=10, offset=0), 4, 0x00A02023),
        0x11116: ("JALR", dict(rd=0, rs1=1, offset=0), 2, 0x8082),
    }
    for addr, (name, args, size, raw) in expect.items():
        got = insts[addr]
        assert got.name == name, (hex(addr), got)
        assert got.size == size, (hex(addr), got)
        assert got.raw_word == raw, (hex(addr), got)
        for k, v in args.items():
            assert got.args[k] == v, (hex(addr), k, got)


@needs_sample
def test_fibonacci_100000th_element():
    """Run the sample to completion: mem[RESULT] == 0x34164a7b (vm.rs:768-782)."""
    vm = new_vm_1mb().load_elf_file(SAMPLE)
    traces = []
    vm.run(lambda t, _vm: traces.append(t), max_cycles=2_000_000)
    assert vm.result() == 0x34164A7B
    # halt was a jump-to-self
    assert traces[-1].input.pc == traces[-1].output.pc


def dummy_vm():
    vm = new_vm_1mb()
    vm.instructions = {}
    return vm


def run_inst(vm, inst, cycle=0):
    return vm.execute_step(inst, cycle)


def I(name, **args):  # noqa: E743
    return Inst(name, 0, 4, args)


def test_mul_div_semantics():
    vm = dummy_vm()
    vm.wr(1, 0xFFFFFFFF)
    vm.wr(2, 2)
    run_inst(vm, I("MUL", rd=3, rs1=1, rs2=2))
    assert vm.rr(3) == 0xFFFFFFFE
    run_inst(vm, I("MULHU", rd=3, rs1=1, rs2=2))
    assert vm.rr(3) == 1
    vm.wr(2, 0)
    run_inst(vm, I("DIVU", rd=3, rs1=1, rs2=2))
    assert vm.rr(3) == 0xFFFFFFFF
    run_inst(vm, I("REMU", rd=3, rs1=1, rs2=2))
    assert vm.rr(3) == 0xFFFFFFFF


def test_subword_memory():
    vm = dummy_vm()
    vm.wr(1, 0x100)
    vm.wr(2, 0xDEADBEEF)
    run_inst(vm, I("SW", rs1=1, rs2=2, offset=0))
    run_inst(vm, I("LB", rd=3, rs1=1, offset=0))
    assert vm.rr(3) == 0xFFFFFFEF  # sign-extended 0xEF
    run_inst(vm, I("LBU", rd=3, rs1=1, offset=1))
    assert vm.rr(3) == 0xBE
    run_inst(vm, I("LH", rd=3, rs1=1, offset=2))
    assert vm.rr(3) == 0xFFFFDEAD
    run_inst(vm, I("LHU", rd=3, rs1=1, offset=0))
    assert vm.rr(3) == 0xBEEF
    vm.wr(4, 0x42)
    run_inst(vm, I("SB", rs1=1, rs2=4, offset=1))
    run_inst(vm, I("LW", rd=3, rs1=1, offset=0))
    assert vm.rr(3) == 0xDEAD42EF


def test_lr_sc_amo():
    vm = dummy_vm()
    vm.wr(1, 0x200)
    vm.wr(2, 7)
    run_inst(vm, I("SW", rs1=1, rs2=2, offset=0))
    run_inst(vm, I("LR_W", rd=3, rs1=1))
    assert vm.rr(3) == 7
    vm.wr(4, 9)
    run_inst(vm, I("SC_W", rd=5, rs1=1, rs2=4))
    assert vm.rr(5) == 0 and vm.read_mem(0x200) == 9
    # SC without reservation fails
    run_inst(vm, I("SC_W", rd=5, rs1=1, rs2=4))
    assert vm.rr(5) == 1
    vm.wr(6, 5)
    run_inst(vm, I("AMOADD_W", rd=7, rs1=1, rs2=6))
    assert vm.rr(7) == 9 and vm.read_mem(0x200) == 14


def test_ecall_alloc():
    vm = dummy_vm()
    vm.wr(17, 1)
    vm.wr(10, 64)
    vm.wr(11, 16)
    run_inst(vm, I("ECALL"))
    ptr = vm.rr(10)
    assert ptr != 0 and ptr % 16 == 0
    nxt = vm.heap.next
    assert nxt == ptr + 64


def test_branch_and_x0_pinning():
    vm = dummy_vm()
    vm.pc = 0x1000
    vm.wr(1, 5)
    vm.wr(2, 5)
    t = run_inst(vm, I("BEQ", rs1=1, rs2=2, offset=0x20))
    assert vm.pc == 0x1020 and t.side_effects.branched_to == 0x1020
    t = run_inst(vm, I("BNE", rs1=1, rs2=2, offset=0x20))
    assert vm.pc == 0x1024 and t.side_effects.branched_to is None
    # write to x0 shows in the output snapshot but is pinned afterwards
    t = run_inst(vm, I("ADDI", rd=0, rs1=1, imm=1))
    assert t.output.regs[0] == 6
    assert vm.rr(0) == 0


def test_compressed_decode_spot_checks():
    # compressed AND (inst_decoder.rs:119-135 analog): 0x8ff5 = c.and a5, a3
    i = decode_compressed(0x8FF5)
    assert i.name == "AND" and i.args == dict(rd=15, rs1=15, rs2=13)
    i = decode_compressed(0x8E09)  # c.sub a2, a0
    assert i.name == "SUB" and i.args == dict(rd=12, rs1=12, rs2=10)


def test_word_decode_spot_checks():
    i = decode_word(0x00A02023)  # sw a0, 0(zero)
    assert i.name == "SW" and i.args == dict(rs1=0, rs2=10, offset=0)
    i = decode_word(0xFCC080E7)  # jalr ra, -52(ra)
    assert i.name == "JALR" and i.args == dict(rd=1, rs1=1, offset=-52)
    i = decode_word(0x02A30067)  # jalr zero, 42(t1)
    assert i.name == "JALR" and i.args == dict(rd=0, rs1=6, offset=42)


def test_assembled_guests():
    from latticeum_tpu.vm.assembler import fib_const_guest, fib_loop_guest
    vm = new_vm_1mb().load_elf_data(fib_const_guest(0xC594BFC3))
    vm.run(max_cycles=100)
    assert vm.result() == 0xC594BFC3  # fib-100 anchor (main.rs:221)
    vm2 = new_vm_1mb().load_elf_data(fib_loop_guest(100))
    vm2.run(max_cycles=10_000)
    assert vm2.result() == 0xC594BFC3
