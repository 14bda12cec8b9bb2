"""Label-based text assembler (vm/assembler.py asm/asm_guest) tests.

The reference's guest path is a Rust no_std crate compiled by LLVM
(latticeum/crates/guest/src/lib.rs:13-117); without a cross toolchain the
in-tree path from program text to a proved guest is this assembler.  The
xorshift guest is a real multi-function program (call/ret, nested loops,
shifts/logic/mul, sub-word layout) checked against an independent Python
model of its semantics.
"""

from latticeum_tpu.vm.assembler import (asm, asm_guest, xorshift_guest,
                                        xorshift_guest_expected)
from latticeum_tpu.vm.vm import new_vm_1mb


def _run(elf):
    vm = new_vm_1mb().load_elf_data(elf)
    steps = [0]
    vm.run(lambda tr, v: steps.__setitem__(0, tr.cycle + 1))
    return vm, steps[0]


def test_asm_encodings_roundtrip_through_decoder():
    src = """
    _start:
        li    a0, 42
        li    a1, 0x12345678
        add   a2, a0, a1
        sub   a3, a1, a0
        sll   a4, a0, a0
        srai  a5, a1, 3
        sltu  a6, a0, a1
        xori  a7, a0, -1
        lui   t0, 0xFEDCB
        halt
    """
    vm, _ = _run(asm_guest(src))
    assert vm.regs[10] == 42
    assert vm.regs[11] == 0x12345678
    assert vm.regs[12] == (42 + 0x12345678)
    assert vm.regs[13] == 0x12345678 - 42
    assert vm.regs[15] == (0x12345678 >> 3)  # positive, arithmetic == logic
    assert vm.regs[16] == 1
    assert vm.regs[17] == (42 ^ 0xFFFFFFFF)
    assert vm.regs[5] == 0xFEDCB000


def test_asm_branches_and_calls():
    src = """
    _start:
        li    sp, 0x800000
        li    a0, 10
        call  sum_to_n
        mv    s0, a0
        halt
    sum_to_n:            # a0 = 1 + 2 + ... + a0
        mv    t0, a0
        li    a0, 0
    loop:
        add   a0, a0, t0
        addi  t0, t0, -1
        bne   t0, zero, loop
        ret
    """
    vm, _ = _run(asm_guest(src))
    assert vm.regs[8] == 55


def test_asm_memory_ops():
    src = """
    _start:
        li    t0, 0x40000
        li    t1, 0xDEADBEEF
        sw    t1, 0(t0)
        lw    t2, 0(t0)
        lbu   t3, 1(t0)
        lhu   t4, 2(t0)
        sb    t1, 8(t0)
        lbu   t5, 8(t0)
        halt
    """
    vm, _ = _run(asm_guest(src))
    assert vm.regs[7] == 0xDEADBEEF
    assert vm.regs[28] == 0xBE
    assert vm.regs[29] == 0xDEAD
    assert vm.regs[30] == 0xEF


def test_xorshift_guest_matches_python_model():
    vm, steps = _run(xorshift_guest(64))
    assert vm.result() == xorshift_guest_expected(64)
    assert steps > 1000  # the >=1000-step proved-run workload

    vm8, _ = _run(xorshift_guest(8))
    assert vm8.result() == xorshift_guest_expected(8)
