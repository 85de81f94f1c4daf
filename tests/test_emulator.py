"""Emulator tests (mirrors /root/reference/ceno_emul/tests/test_vm_trace.rs:
hand-encoded program, assert final registers and trace shape; keccak syscall
against hashlib oracle).  Pure Python — no devices."""

import hashlib

from ceno_tpu.emul import (
    CENO_PLATFORM,
    Instruction,
    InsnKind as K,
    Program,
    VMState,
    decode_instruction,
    encode_rv32,
)
from ceno_tpu.emul.syscalls import keccakf


def make_program(insns, entry=None):
    entry = entry if entry is not None else CENO_PLATFORM.pc_base()
    return Program.from_instructions(entry, insns)


def test_fibonacci_loop():
    """x1 = fib-ish accumulation, then halt; checks compute/branch/jal."""
    pc = CENO_PLATFORM.pc_base()
    insns = [
        encode_rv32(K.ADDI, 0, 0, 1, 0),     # x1 = 0
        encode_rv32(K.ADDI, 0, 0, 2, 1),     # x2 = 1
        encode_rv32(K.ADDI, 0, 0, 3, 10),    # x3 = 10 (counter)
        # loop:
        encode_rv32(K.ADD, 1, 2, 4, 0),      # x4 = x1 + x2
        encode_rv32(K.ADDI, 2, 0, 1, 0),     # x1 = x2
        encode_rv32(K.ADDI, 4, 0, 2, 0),     # x2 = x4
        encode_rv32(K.ADDI, 3, 0, 3, -1),    # x3 -= 1
        encode_rv32(K.BNE, 3, 0, 0, -16),    # loop while x3 != 0
        # halt: t0 = 0 (halt code), a0 = exit code
        encode_rv32(K.ADDI, 0, 0, 5, 0),
        encode_rv32(K.ADDI, 2, 0, 10, 0),    # a0 = x2
        encode_rv32(K.ECALL, 0, 0, 0, 0),
    ]
    vm = VMState(CENO_PLATFORM, make_program(insns))
    steps = vm.run(max_steps=10000)
    # fib: after 10 iters starting (0,1): x2 = fib(11) = 89
    assert vm.registers[2] == 89
    assert vm.halted and vm.exit_code == 89
    # trace discipline: first step at cycle 4, +4 per step
    assert steps[0].cycle == 4
    assert all(b.cycle - a.cycle == 4 for a, b in zip(steps, steps[1:]))
    # rd ops record previous cycle correctly
    assert steps[0].rd.previous_cycle == 0


def test_load_store_bytes():
    heap = CENO_PLATFORM.heap[0]
    insns = [
        encode_rv32(K.ADDI, 0, 0, 1, heap),          # x1 = heap (LUI-free: imm fits? no)
    ]
    # heap base doesn't fit in 12-bit imm; our internal ADDI takes wide imm
    insns += [
        encode_rv32(K.ADDI, 0, 0, 2, 0x1234ABCD - (1 << 32)),  # x2 = 0x1234ABCD
        encode_rv32(K.SW, 1, 2, 0, 0),               # [x1] = x2
        encode_rv32(K.LBU, 1, 0, 3, 0),              # x3 = byte0 = 0xCD
        encode_rv32(K.LB, 1, 0, 4, 1),               # x4 = sext(0xAB)
        encode_rv32(K.LHU, 1, 0, 7, 2),              # x7 = 0x1234
        encode_rv32(K.SB, 1, 3, 0, 4),               # [x1+4] byte = 0xCD
        encode_rv32(K.LW, 1, 0, 6, 4),               # x6 = 0xCD
        encode_rv32(K.ADDI, 0, 0, 5, 0),
        encode_rv32(K.ADDI, 0, 0, 10, 0),
        encode_rv32(K.ECALL, 0, 0, 0, 0),
    ]
    vm = VMState(CENO_PLATFORM, make_program(insns))
    vm.run(max_steps=100)
    assert vm.registers[3] == 0xCD
    assert vm.registers[4] == 0xFFFFFFAB
    assert vm.registers[7] == 0x1234
    assert vm.registers[6] == 0xCD


def test_mul_div_edge_cases():
    cases = [
        (K.DIV, 7, 0, 0xFFFFFFFF),           # div by zero -> -1
        (K.DIV, 0x80000000, 0xFFFFFFFF, 0x80000000),  # overflow wraps
        (K.REM, 7, 0, 7),
        (K.REM, 0x80000000, 0xFFFFFFFF, 0),
        (K.MULH, 0xFFFFFFFF, 0xFFFFFFFF, 0),  # (-1)*(-1) = 1 -> high 0
        (K.MULHU, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFE),
        (K.DIVU, 7, 2, 3),
        (K.REMU, 7, 2, 1),
    ]
    for kind, a, b, want in cases:
        insns = [
            encode_rv32(K.ADDI, 0, 0, 1, a - (1 << 32) if a >> 31 else a),
            encode_rv32(K.ADDI, 0, 0, 2, b - (1 << 32) if b >> 31 else b),
            encode_rv32(kind, 1, 2, 3, 0),
            encode_rv32(K.ADDI, 0, 0, 5, 0),
            encode_rv32(K.ADDI, 0, 0, 10, 0),
            encode_rv32(K.ECALL, 0, 0, 0, 0),
        ]
        vm = VMState(CENO_PLATFORM, make_program(insns))
        vm.run(max_steps=100)
        assert vm.registers[3] == want, (kind, a, b, vm.registers[3], want)


def test_decoder_roundtrip():
    """Decode raw words for common instructions."""
    # addi x1, x2, 42 => imm=42 rs1=2 rd=1: 0x02A10093
    i = decode_instruction(0x02A1_0093 | 0, pc=0)
    assert (i.kind, i.rd, i.rs1, i.imm) == (K.ADDI, 1, 2, 42)
    # lui x5, 0x12345 -> ADDI wide imm
    word = (0x12345 << 12) | (5 << 7) | 0x37
    i = decode_instruction(word, pc=0)
    assert i.kind == K.ADDI and i.rd == 5 and (i.imm & 0xFFFFFFFF) == 0x12345000
    # auipc x3, 0x1000 at pc=0x2000_0000
    word = (0x1000 << 12) | (3 << 7) | 0x17
    i = decode_instruction(word, pc=0x2000_0000)
    assert i.kind == K.ADDI and (i.imm & 0xFFFFFFFF) == 0x2100_0000
    # ecall
    assert decode_instruction(0x0000_0073, pc=0).kind == K.ECALL


def test_keccakf_against_hashlib():
    """keccak-f via sha3: hashlib's sha3_256 of empty = known; instead test
    keccakf directly against a known-answer: state of all zeros."""
    out = keccakf([0] * 25)
    # first lane of keccak-f(0) is the round-constant accumulation; check
    # against the widely-known value
    assert out[0] == 0xF1258F7940E1DDE7


def test_x0_never_written():
    insns = [
        encode_rv32(K.ADDI, 0, 0, 0, 5),  # addi x0, x0, 5 -> dark write
        encode_rv32(K.ADDI, 0, 0, 5, 0),
        encode_rv32(K.ADDI, 0, 0, 10, 0),
        encode_rv32(K.ECALL, 0, 0, 0, 0),
    ]
    vm = VMState(CENO_PLATFORM, make_program(insns))
    steps = vm.run(max_steps=10)
    assert vm.registers[0] == 0
    # the write went to RD_NULL (reg 32)
    assert steps[0].rd.addr == (32 << 8) >> 2
