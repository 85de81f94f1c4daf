"""Synthesized guest programs (fixture generators).

The reference ships pre-built guest ELFs (ceno_zkvm/examples/fibonacci.elf,
examples/ built by examples-builder); without a RISC-V toolchain we synthesize
the equivalent instruction streams directly via encode_rv32 — same ISA, same
trace schema, no binary copying.
"""

from __future__ import annotations

from .elf import Program
from .insn import InsnKind as K
from .insn import encode_rv32
from .platform import CENO_PLATFORM, Platform


def fibonacci_program(n: int, platform: Platform = CENO_PLATFORM) -> Program:
    """fib(n) mod 2^32 by iteration, result in x10, halts via ECALL.

    Trace profile mirrors the reference fibonacci bench guest: a tight
    ADD/ADDI/BEQ/JAL loop of ~5 instructions per iteration
    (ceno_zkvm/benches/fibonacci.rs workload)."""
    insns = [
        encode_rv32(K.ADDI, 0, 0, 10, n),    # x10 = n
        encode_rv32(K.ADDI, 0, 0, 1, 0),     # a = 0
        encode_rv32(K.ADDI, 0, 0, 2, 1),     # b = 1
        # loop:
        encode_rv32(K.BEQ, 10, 0, 0, 24),    # if n == 0 goto done
        encode_rv32(K.ADD, 1, 2, 3, 0),      # t = a + b
        encode_rv32(K.ADDI, 2, 0, 1, 0),     # a = b
        encode_rv32(K.ADDI, 3, 0, 2, 0),     # b = t
        encode_rv32(K.ADDI, 10, 0, 10, -1),  # n -= 1
        encode_rv32(K.JAL, 0, 0, 0, -20),    # goto loop
        # done:
        encode_rv32(K.ADDI, 1, 0, 10, 0),    # x10 = a  (exit code = fib(n))
        encode_rv32(K.ECALL, 0, 0, 0, 0),    # halt (x5 == 0)
    ]
    return Program.from_instructions(platform.pc_base(), insns)


def fib(n: int) -> int:
    a, b = 0, 1
    for _ in range(n):
        a, b = b, (a + b) & 0xFFFFFFFF
    return a


def memory_workout_program(platform: Platform = CENO_PLATFORM) -> Program:
    """Touches all load/store widths in the stack region, halts with a
    checksum in x10 (host test fixture, ceno_rt_mem analog)."""
    base_hi = 0xBFFFF  # lui-style: ADDI wide imm (LUI transpiles to ADDI);
    # inside the default 32 KiB derived stack window [0xBFFF_8000, 0xC000_0000)
    insns = [
        encode_rv32(K.ADDI, 0, 0, 20, base_hi << 12),   # x20 = 0xB0001000
        encode_rv32(K.ADDI, 0, 0, 2, 0x123),
        encode_rv32(K.SW, 20, 2, 0, 0),
        encode_rv32(K.LW, 20, 0, 3, 0),
        encode_rv32(K.SH, 20, 3, 0, 4),
        encode_rv32(K.SB, 20, 3, 0, 6),
        encode_rv32(K.LHU, 20, 0, 4, 4),
        encode_rv32(K.LBU, 20, 0, 6, 6),  # not x5: it must stay ECALL_HALT
        encode_rv32(K.ADD, 4, 6, 10, 0),                # checksum
        encode_rv32(K.ECALL, 0, 0, 0, 0),
    ]
    return Program.from_instructions(platform.pc_base(), insns)


def pubio_sum_program(platform: Platform = CENO_PLATFORM) -> Program:
    """Reads two words from the public-io window, halts with their sum —
    the PubIOTable fixture (tables/ram.rs:97-113 PubIOCircuit): the verifier
    binds the input by evaluating the raw_pi MLE itself."""
    io_base = platform.public_io[0]
    insns = [
        encode_rv32(K.ADDI, 0, 0, 20, io_base),  # x20 = &public_io (wide imm)
        encode_rv32(K.LW, 20, 0, 1, 0),          # x1 = io[0]
        encode_rv32(K.LW, 20, 0, 2, 4),          # x2 = io[1]
        encode_rv32(K.ADD, 1, 2, 10, 0),         # exit code = x1 + x2
        encode_rv32(K.ECALL, 0, 0, 0, 0),
    ]
    return Program.from_instructions(platform.pc_base(), insns)
