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


# ---------------------------------------------------------------------------
# Label-based mini-assembler for the richer fixtures below.  Branch/JAL
# immediates are pc-relative byte offsets; a string in the stream is a label,
# a string immediate is a reference to one.
# ---------------------------------------------------------------------------

def _assemble(items, platform: Platform) -> Program:
    labels = {}
    idx = 0
    for it in items:
        if isinstance(it, str):
            labels[it] = idx
        else:
            idx += 1
    out = []
    idx = 0
    for it in items:
        if isinstance(it, str):
            continue
        kind, rs1, rs2, rd, imm = it
        if isinstance(imm, str):
            imm = (labels[imm] - idx) * 4
        out.append(encode_rv32(kind, rs1, rs2, rd, imm))
        idx += 1
    return Program.from_instructions(platform.pc_base(), out)


_STACK_BUF = 0xBFFF_8000  # inside the default 32 KiB derived stack window
_LCG_MUL = 1103515245
_LCG_ADD = 12345
_LCG_SEED = 0x2468A


def _lcg_fill(n: int):
    vals, x = [], _LCG_SEED
    for _ in range(n):
        x = (x * _LCG_MUL + _LCG_ADD) & 0xFFFFFFFF
        vals.append(x)
    return vals


def _bubble_sort_asm(buf_reg: int, n: int, items: list, tag: str):
    """Emit an in-place bubble sort of n words at [buf_reg] (sorting.rs /
    bubble_sorting.rs analog): nested branch loops, LW/SW pairs, BGEU."""
    items += [
        (K.ADDI, 0, 0, 6, 0),            # i = 0
        (K.ADDI, 0, 0, 7, n - 1),        # limit = n-1
        f"{tag}_outer",
        (K.BEQ, 6, 7, 0, f"{tag}_done"),
        (K.ADDI, 0, 0, 21, 0),           # j = 0
        (K.SUB, 7, 6, 22, 0),            # inner limit = n-1-i
        f"{tag}_inner",
        (K.BEQ, 21, 22, 0, f"{tag}_onext"),
        (K.SLLI, 21, 0, 9, 2),
        (K.ADD, 9, buf_reg, 9, 0),
        (K.LW, 9, 0, 3, 0),              # a = buf[j]
        (K.LW, 9, 0, 4, 4),              # b = buf[j+1]
        (K.BGEU, 4, 3, 0, f"{tag}_noswap"),
        (K.SW, 9, 4, 0, 0),
        (K.SW, 9, 3, 0, 4),
        f"{tag}_noswap",
        (K.ADDI, 21, 0, 21, 1),
        (K.JAL, 0, 0, 0, f"{tag}_inner"),
        f"{tag}_onext",
        (K.ADDI, 6, 0, 6, 1),
        (K.JAL, 0, 0, 0, f"{tag}_outer"),
        f"{tag}_done",
    ]


def sorting_program(n: int = 16, platform: Platform = CENO_PLATFORM) -> Program:
    """Fill n words with an in-guest LCG, bubble-sort them, halt with
    (min + max) mod 2^32 (examples/sorting.rs + bubble_sorting.rs analog)."""
    items = [
        (K.ADDI, 0, 0, 20, _STACK_BUF),
        (K.ADDI, 0, 0, 1, _LCG_SEED),
        (K.ADDI, 0, 0, 8, _LCG_MUL),
        (K.ADDI, 0, 0, 6, 0),
        (K.ADDI, 0, 0, 7, n),
        "fill",
        (K.BEQ, 6, 7, 0, "fill_done"),
        (K.MUL, 1, 8, 1, 0),
        (K.ADDI, 1, 0, 1, _LCG_ADD),
        (K.SLLI, 6, 0, 9, 2),
        (K.ADD, 9, 20, 9, 0),
        (K.SW, 9, 1, 0, 0),
        (K.ADDI, 6, 0, 6, 1),
        (K.JAL, 0, 0, 0, "fill"),
        "fill_done",
    ]
    _bubble_sort_asm(20, n, items, "s")
    items += [
        (K.LW, 20, 0, 10, 0),            # min
        (K.SLLI, 7, 0, 9, 2),            # &buf[n-1] (x7 == n-1 after sort)
        (K.ADD, 9, 20, 9, 0),
        (K.LW, 9, 0, 3, 0),              # max
        (K.ADD, 10, 3, 10, 0),           # exit = min + max
        (K.ECALL, 0, 0, 0, 0),
    ]
    return _assemble(items, platform)


def sorting_expected(n: int = 16) -> int:
    vals = sorted(_lcg_fill(n))
    return (vals[0] + vals[-1]) & 0xFFFFFFFF


def median_program(n: int = 15, platform: Platform = CENO_PLATFORM) -> Program:
    """Copy n u32s out of the hints segment (CenoStdin item 0 payload at
    base+8), sort, halt with the median (examples/median.rs + hints.rs
    analog).  Run with `hints=CenoStdin().write(struct.pack('<%dI'%n, ...))`."""
    hints_payload = platform.hints[0] + 8
    items = [
        (K.ADDI, 0, 0, 20, hints_payload),
        (K.ADDI, 0, 0, 19, _STACK_BUF),
        (K.ADDI, 0, 0, 6, 0),
        (K.ADDI, 0, 0, 7, n),
        "copy",
        (K.BEQ, 6, 7, 0, "copy_done"),
        (K.SLLI, 6, 0, 9, 2),
        (K.ADD, 9, 20, 3, 0),
        (K.LW, 3, 0, 4, 0),
        (K.ADD, 9, 19, 3, 0),
        (K.SW, 3, 4, 0, 0),
        (K.ADDI, 6, 0, 6, 1),
        (K.JAL, 0, 0, 0, "copy"),
        "copy_done",
    ]
    _bubble_sort_asm(19, n, items, "m")
    items += [
        (K.ADDI, 0, 0, 9, (n // 2) * 4),
        (K.ADD, 9, 19, 9, 0),
        (K.LW, 9, 0, 10, 0),             # exit = buf[n//2]
        (K.ECALL, 0, 0, 0, 0),
    ]
    return _assemble(items, platform)


def keccak_program(rounds: int = 2, platform: Platform = CENO_PLATFORM) -> Program:
    """Apply the KECCAK_PERMUTE syscall `rounds` times to a zeroed 50-word
    state buffer, halt with lane0's low word (ceno_rt_keccak / hashing.rs
    analog)."""
    from .syscalls import KECCAK_PERMUTE

    items = [
        (K.ADDI, 0, 0, 20, _STACK_BUF),
        (K.ADDI, 0, 0, 6, 0),
        (K.ADDI, 0, 0, 7, rounds),
        "loop",
        (K.BEQ, 6, 7, 0, "done"),
        (K.ADDI, 0, 0, 5, KECCAK_PERMUTE),
        (K.ADD, 20, 0, 10, 0),           # a0 = &state
        (K.ECALL, 0, 0, 0, 0),
        (K.ADDI, 6, 0, 6, 1),
        (K.JAL, 0, 0, 0, "loop"),
        "done",
        (K.LW, 20, 0, 10, 0),
        (K.ADDI, 0, 0, 5, 0),            # restore ECALL_HALT selector
        (K.ECALL, 0, 0, 0, 0),
    ]
    return _assemble(items, platform)


def keccak_expected(rounds: int = 2) -> int:
    from .syscalls import keccakf

    state = [0] * 25
    for _ in range(rounds):
        state = keccakf(state)
    return state[0] & 0xFFFFFFFF


def alloc_program(n: int = 8, platform: Platform = CENO_PLATFORM) -> Program:
    """Bump-allocator workout: n two-word allocations from a stack arena,
    write/read each, halt with the checksum sum(0..n-1) (ceno_rt_alloc
    analog; the arena lives in the stack window because synthesized guests
    have no linker-placed heap)."""
    items = [
        (K.ADDI, 0, 0, 20, _STACK_BUF),
        (K.ADDI, 0, 0, 6, 0),
        (K.ADDI, 0, 0, 7, n),
        (K.ADDI, 0, 0, 1, 0),
        "loop",
        (K.BEQ, 6, 7, 0, "done"),
        (K.SW, 20, 6, 0, 0),
        (K.SW, 20, 6, 0, 4),
        (K.LW, 20, 0, 3, 0),
        (K.ADD, 1, 3, 1, 0),
        (K.ADDI, 20, 0, 20, 8),          # bump
        (K.ADDI, 6, 0, 6, 1),
        (K.JAL, 0, 0, 0, "loop"),
        "done",
        (K.ADD, 1, 0, 10, 0),
        (K.ECALL, 0, 0, 0, 0),
    ]
    return _assemble(items, platform)


def mini_program(platform: Platform = CENO_PLATFORM) -> Program:
    """Smallest possible guest: halt(0) (ceno_rt_mini analog)."""
    return _assemble([(K.ADDI, 0, 0, 10, 0), (K.ECALL, 0, 0, 0, 0)], platform)


def panic_program(platform: Platform = CENO_PLATFORM) -> Program:
    """Guest panic path: halts with a non-zero exit code (ceno_rt_panic
    analog — the reference's panic handler lowers to halt(1))."""
    return _assemble([(K.ADDI, 0, 0, 10, 1), (K.ECALL, 0, 0, 0, 0)], platform)


def io_msg_program(msg: bytes = b"hello", platform: Platform = CENO_PLATFORM) -> Program:
    """Write one length-prefixed guest->host message at the info_out region
    (0xC000_0000, host_utils.rs:1-29) then halt(0) (ceno_rt_io analog).
    Run under the full CENO_PLATFORM (whose heap covers info_out)."""
    info_out = 0xC000_0000
    items = [
        (K.ADDI, 0, 0, 20, info_out),
        (K.ADDI, 0, 0, 1, len(msg)),
        (K.SW, 20, 1, 0, 0),
    ]
    for i in range(0, len(msg), 4):
        word = int.from_bytes(msg[i:i + 4].ljust(4, b"\x00"), "little")
        items += [(K.ADDI, 0, 0, 2, word), (K.SW, 20, 2, 0, 4 + i)]
    items += [(K.ADDI, 0, 0, 10, 0), (K.ECALL, 0, 0, 0, 0)]
    return _assemble(items, platform)
