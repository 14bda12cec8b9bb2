"""Tiny RV32I assembler + ELF32 writer for building test/bench guests.

The reference's guests are Rust no_std binaries (latticeum/crates/guest,
guests/fibonacci); without a Rust cross toolchain we synthesize equivalent
guests directly.  Only the 4-byte encodings are emitted (the decoder and VM
handle compressed forms produced by real toolchains)."""

from __future__ import annotations

import struct

M32 = 0xFFFFFFFF


def _u(v, bits):
    v &= (1 << bits) - 1
    return v


def lui(rd, imm20):
    return (_u(imm20, 20) << 12) | (rd << 7) | 0x37


def auipc(rd, imm20):
    return (_u(imm20, 20) << 12) | (rd << 7) | 0x17


def jal(rd, offset):
    imm = _u(offset, 21)
    w = ((imm >> 20) & 1) << 31 | ((imm >> 1) & 0x3FF) << 21 | \
        ((imm >> 11) & 1) << 20 | ((imm >> 12) & 0xFF) << 12 | (rd << 7) | 0x6F
    return w


def jalr(rd, rs1, offset):
    return (_u(offset, 12) << 20) | (rs1 << 15) | (rd << 7) | 0x67


def _btype(f3, rs1, rs2, offset):
    imm = _u(offset, 13)
    return ((imm >> 12) & 1) << 31 | ((imm >> 5) & 0x3F) << 25 | \
        (rs2 << 20) | (rs1 << 15) | (f3 << 12) | \
        ((imm >> 1) & 0xF) << 8 | ((imm >> 11) & 1) << 7 | 0x63


def beq(rs1, rs2, offset):
    return _btype(0b000, rs1, rs2, offset)


def bne(rs1, rs2, offset):
    return _btype(0b001, rs1, rs2, offset)


def bltu(rs1, rs2, offset):
    return _btype(0b110, rs1, rs2, offset)


def addi(rd, rs1, imm):
    return (_u(imm, 12) << 20) | (rs1 << 15) | (rd << 7) | 0x13


def _rtype(f7, f3, rd, rs1, rs2):
    return (f7 << 25) | (rs2 << 20) | (rs1 << 15) | (f3 << 12) | (rd << 7) | 0x33


def add(rd, rs1, rs2):
    return _rtype(0, 0, rd, rs1, rs2)


def sub(rd, rs1, rs2):
    return _rtype(0x20, 0, rd, rs1, rs2)


def mul(rd, rs1, rs2):
    return _rtype(1, 0, rd, rs1, rs2)


def sw(rs1, rs2, offset):
    imm = _u(offset, 12)
    return ((imm >> 5) << 25) | (rs2 << 20) | (rs1 << 15) | (0b010 << 12) | \
        ((imm & 0x1F) << 7) | 0x23


def lw(rd, rs1, offset):
    return (_u(offset, 12) << 20) | (rs1 << 15) | (0b010 << 12) | (rd << 7) | 0x03


def li32(rd, value):
    """Load a full 32-bit constant: lui + addi (2 instructions)."""
    value &= M32
    lo = value & 0xFFF
    if lo >= 0x800:
        lo -= 0x1000
    hi = ((value - lo) >> 12) & 0xFFFFF
    return [lui(rd, hi), addi(rd, rd, lo)]


def write_elf(words: list[int], entry: int, base: int = 0x11000) -> bytes:
    """Single executable PT_LOAD segment at `base` containing `words`."""
    code = b"".join(struct.pack("<I", w & M32) for w in words)
    ehsize, phentsize = 52, 32
    phoff = ehsize
    code_off = ehsize + phentsize
    eh = struct.pack(
        "<4sBBBBB7xHHIIIIIHHHHHH",
        b"\x7fELF", 1, 1, 1, 0, 0,           # ELF32 LE
        2, 243, 1,                            # EXEC, RISC-V, v1
        entry, phoff, 0, 0,
        ehsize, phentsize, 1,                 # one program header
        0, 0, 0)
    ph = struct.pack("<IIIIIIII", 1, code_off, base, base,
                     len(code), len(code), 0x5, 4)  # PT_LOAD, R+X
    return eh + ph + code


def fib_const_guest(result: int, base: int = 0x11000) -> bytes:
    """Guest mirroring the reference fib-100 shape: the compiler const-folds
    fib(100), so the binary just stores 0xc594bfc3 and halts
    (guests/fibonacci/src/main.rs + crates/guest _start)."""
    # layout: _start at entry: set gp/sp, call main; main: li result, sw, ret;
    # halt: jal 0 (jump-to-self)
    words = []
    # main (offset 0): li a0, result; sw a0, 0(zero); ret
    words += li32(10, result)
    words += [sw(0, 10, 0), jalr(0, 1, 0)]
    main_off = 0
    # _start (offset 20):
    start_off = len(words) * 4
    words += [
        lui(3, 0x11),                 # gp = 0x11000 (dummy global pointer)
        lui(2, 0x800),                # sp = STACK_TOP = 0x0080_0000
        auipc(1, 0),                  # ra = pc
        jalr(1, 1, (main_off - (start_off + 8))),  # call main
        jal(0, 0),                    # halt: jump-to-self
    ]
    return write_elf(words, base + start_off, base)


def fib_loop_guest(n: int, base: int = 0x11000) -> bytes:
    """Guest computing fib(n) with a loop (n+~10 traces) — the analog of the
    committed fibonacci_100_000 sample's main loop."""
    words = []
    # main: a0=0 (fib0), a1=1 (fib1), a2=n
    main = len(words)
    words += [addi(10, 0, 0), addi(11, 0, 1)]
    words += li32(12, n)
    # loop: t0 = a0+a1; a0 = a1; a1 = t0; a2 -= 1; bne a2, x0, loop
    loop_off = len(words) * 4
    words += [
        add(5, 10, 11),
        add(10, 0, 11),
        add(11, 0, 5),
        addi(12, 12, -1),
    ]
    words += [bne(12, 0, loop_off - len(words) * 4)]
    # store fib(n) (in a0 after n iterations fib moves ahead; store a0)
    words += [sw(0, 10, 0), jal(0, 0)]
    entry_off = main * 4
    return write_elf(words, base + entry_off, base)


def mem_churn_guest(pages: int = 64, passes: int = 2, stride: int = 256,
                    base: int = 0x11000) -> bytes:
    """Memory-heavy guest: strided read-modify-write sweeps over `pages`
    4 KiB pages of RAM (the paged-RAM-churn substitute for the reference's
    EVM guest workload, guests/evm/src/main.rs) — every sweep touches every
    page, so each step's Merkle mem-tree update path is exercised under
    churn.  Trace count ~= pages * (4096/stride) * passes * 4 + O(10)."""
    words = []
    # a0 = cursor, a1 = end, a2 = passes, t0 = scratch
    heap = 0x40000                        # past code+stack, page-aligned
    words += li32(12, passes)
    pass_off = len(words) * 4
    words += li32(10, heap)
    words += li32(11, heap + pages * 4096)
    loop_off = len(words) * 4
    words += [
        lw(5, 10, 0),                     # t0 = mem[cursor]
        add(5, 5, 10),                    # t0 += cursor
        sw(10, 5, 0),                     # mem[cursor] = t0
        addi(10, 10, stride),             # cursor += stride
    ]
    words += [bltu(10, 11, loop_off - len(words) * 4)]
    words += [addi(12, 12, -1)]
    words += [bne(12, 0, pass_off - len(words) * 4)]
    # result = checksum word of the last page
    words += [lw(10, 11, -stride), sw(0, 10, 0), jal(0, 0)]
    return write_elf(words, base, base)
