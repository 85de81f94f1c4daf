"""Host<->guest plumbing tests (ceno_host/tests/test_elf.rs analog):
hints round-trip and guest->host messages, emulation-only."""

import struct

from ceno_tpu.emul import CENO_PLATFORM, Program, encode_rv32
from ceno_tpu.emul.insn import InsnKind as K
from ceno_tpu.host import CenoStdin, read_all_messages, run

HINTS = CENO_PLATFORM.hints[0]
INFO = 0xC000_0000


def hints_sum_guest():
    """Reads two u32 hints, writes their sum as a message, halts with it."""
    insns = [
        encode_rv32(K.ADDI, 0, 0, 20, HINTS),
        encode_rv32(K.ADDI, 0, 0, 21, INFO),
        encode_rv32(K.LW, 20, 0, 1, 8),    # item 1 payload
        encode_rv32(K.LW, 20, 0, 2, 16),   # item 2 payload
        encode_rv32(K.ADD, 1, 2, 10, 0),
        encode_rv32(K.ADDI, 0, 0, 3, 4),
        encode_rv32(K.SW, 21, 3, 0, 0),    # message length = 4
        encode_rv32(K.SW, 21, 10, 0, 4),   # payload = sum
        encode_rv32(K.ECALL, 0, 0, 0, 0),
    ]
    return Program.from_instructions(CENO_PLATFORM.pc_base(), insns)


def test_hints_roundtrip():
    stdin = CenoStdin().write(41).write(1)
    blob = stdin.finalise()
    count, l1, v1, l2, v2 = struct.unpack("<5I", blob)
    assert (count, l1, v1, l2, v2) == (2, 4, 41, 4, 1)


def test_hints_guest_and_messages():
    stdin = CenoStdin().write(40).write(2)
    vm, steps, messages = run(CENO_PLATFORM, hints_sum_guest(), stdin)
    assert vm.halted and vm.exit_code == 42
    assert messages == [struct.pack("<I", 42)]
    assert vm._hints_image  # recorded for the HINTS_MEM table init


def test_hints_layout():
    """Platform-derived layout (e2e.rs setup_platform): static memory is a
    pow2 pure function of program+sizes; hints is the dynamic region."""
    from ceno_tpu.emul.platform import setup_platform
    from ceno_tpu.zkvm.riscv.config import MemLayout

    program = hints_sum_guest()
    platform = setup_platform("ceno", program, stack_size=64, heap_size=64)
    layout = MemLayout.from_platform(program, platform)
    assert "HINTS_MEM" in layout.dyn_regions
    off, cap = layout.dyn_regions["HINTS_MEM"]
    assert off == platform.hints[0] >> 2
    assert layout.pub_io is not None
    n = len(layout.static_waddrs)
    assert n & (n - 1) == 0
