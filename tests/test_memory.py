"""Mock-prover unit tests for the load/store circuits and the memory-table
assignment plumbing (memory.rs + ram_impl.rs analogs)."""

import numpy as np
import pytest

from ceno_tpu.emul import CENO_PLATFORM, Program, VMState, encode_rv32
from ceno_tpu.emul.insn import InsnKind as K
from ceno_tpu.zkvm.mock_prover import assert_satisfied
from ceno_tpu.zkvm.riscv.config import _BUILDERS, MemLayout
from ceno_tpu.zkvm.witness import LkMultiplicity

BASE = 0xBFFF_F000  # inside the stack region (writable), within the default
# 32 KiB derived stack window [0xBFFF_8000, 0xC000_0000)


def run_mem_program(insns):
    program = Program.from_instructions(CENO_PLATFORM.pc_base(), insns)
    vm = VMState(CENO_PLATFORM, program)
    vm.init_register_unsafe(20, BASE)
    vm.init_register_unsafe(2, 0x1234_5678)
    vm.init_register_unsafe(3, 0xFEDC_BA98)  # negative-ish bytes/halves
    steps = []
    for s in vm.iter_until_halt(max_steps=len(insns)):
        steps.append(s)
        if len(steps) == len(insns):
            break
    return steps, vm


def check_mem_kind(kind, steps):
    group = [s for s in steps if s.insn.kind == kind]
    assert group, f"no steps of kind {K.NAMES[kind]}"
    builder, assigner = _BUILDERS[kind]
    cfg = builder()
    wm = assigner(cfg, group, LkMultiplicity())
    assert_satisfied(cfg.cs, wm.to_columns(), len(group))
    return group


PROGRAM = [
    encode_rv32(K.SW, 20, 2, 0, 0),       # [BASE] = 0x12345678
    encode_rv32(K.SW, 20, 3, 0, 4),       # [BASE+4] = 0xFEDCBA98
    encode_rv32(K.SH, 20, 3, 0, 8),       # [BASE+8].lo = 0xBA98
    encode_rv32(K.SH, 20, 2, 0, 10),      # [BASE+8].hi = 0x5678
    encode_rv32(K.SB, 20, 2, 0, 13),      # byte 1 of [BASE+12] = 0x78
    encode_rv32(K.SB, 20, 3, 0, 14),      # byte 2 of [BASE+12] = 0x98
    encode_rv32(K.LW, 20, 0, 9, 0),       # = 0x12345678
    encode_rv32(K.LW, 20, 0, 9, 4),       # negative word
    encode_rv32(K.LH, 20, 0, 9, 8),       # 0xBA98 sign-extended
    encode_rv32(K.LH, 20, 0, 9, 10),      # 0x5678 positive
    encode_rv32(K.LHU, 20, 0, 9, 8),      # 0xBA98 zero-extended
    encode_rv32(K.LB, 20, 0, 9, 13),      # 0x78
    encode_rv32(K.LB, 20, 0, 9, 14),      # 0x98 sign-extended
    encode_rv32(K.LBU, 20, 0, 9, 14),     # 0x98 zero-extended
    encode_rv32(K.LBU, 20, 0, 9, 15),     # byte 3
]


@pytest.fixture(scope="module")
def mem_steps():
    steps, vm = run_mem_program(PROGRAM)
    assert len(steps) == len(PROGRAM)
    return steps, vm


@pytest.mark.parametrize("kind", [K.SW, K.SH, K.SB, K.LW, K.LH, K.LHU, K.LB, K.LBU])
def test_mem_circuit(kind, mem_steps):
    steps, _ = mem_steps
    check_mem_kind(kind, steps)


def test_load_semantics(mem_steps):
    steps, vm = mem_steps
    # final LBU reads byte 3 of [BASE+12], which was never stored -> 0
    assert vm.registers[9] == 0
    # the LB at offset 14 saw the SB'd 0x98, sign-extended
    lb14 = [s for s in steps if s.insn.kind == K.LB][-1]
    assert lb14.rd.value.after == 0xFFFF_FF98


def test_mem_layout_from_platform(mem_steps):
    """Layout is a pure function of program+platform (e2e.rs:169-244):
    the stack window lands in the static table and covers BASE."""
    from ceno_tpu.emul.platform import setup_platform

    program = Program.from_instructions(CENO_PLATFORM.pc_base(), PROGRAM)
    platform = setup_platform("ceno", program, stack_size=32768, heap_size=64)
    layout = MemLayout.from_platform(program, platform)
    ws = layout.static_waddrs
    assert ws[0] <= BASE >> 2 <= ws[-1]
    assert (BASE >> 2) in set(int(w) for w in ws)
    n = len(ws)
    assert n & (n - 1) == 0
    # rerunning keygen-side derivation is reproducible without any execution
    layout2 = MemLayout.from_platform(program, platform)
    assert (layout2.static_waddrs == ws).all()
    assert layout2.dyn_regions == layout.dyn_regions


def test_negative_offset_load():
    # x20 + (-4): wrap handling in MemAddr
    insns = [
        encode_rv32(K.SW, 20, 2, 0, 0),
        encode_rv32(K.ADDI, 20, 0, 21, 4),
        encode_rv32(K.LW, 21, 0, 9, -4),
    ]
    program = Program.from_instructions(CENO_PLATFORM.pc_base(), insns)
    vm = VMState(CENO_PLATFORM, program)
    vm.init_register_unsafe(20, BASE)
    vm.init_register_unsafe(2, 0xCAFEBABE)
    steps = []
    for s in vm.iter_until_halt(max_steps=3):
        steps.append(s)
        if len(steps) == 3:
            break
    assert vm.registers[9] == 0xCAFEBABE
    check_mem_kind(K.LW, steps)
