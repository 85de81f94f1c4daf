"""Additional opcode circuits: ADDI, logic (AND/OR/XOR), SLT family,
branches (BEQ/BNE/BLTU/BGEU/BLT/BGE), jumps (JAL/JALR).

Mirrors the reference circuit structure per instruction family:
* arith_imm.rs — I-format add with a witnessed immediate bound by the fetch
  lookup (imm_internal = unsigned view for ADDI);
* logic/logic_circuit.rs — operands as 4 x u8 limbs, one byte-table lookup
  per limb (And/Or/Xor ROM), register exprs recombine u8 pairs to u16;
* slt.rs — IsLt gadget bit becomes the rd value;
* branch/*.rs — branching StateInOut with free next_pc constrained by the
  comparison gadget;
* jump/jal.rs — rd = pc + 4, next_pc = pc + imm.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ...emul.insn import InsnKind
from ..circuit_builder import ConstraintSystem, ROMType
from ..expression import Constant, Expr, WitIn
from ..witness import LkMultiplicity, WitnessMatrix, signed_to_field
from .gadgets import UINT_LIMBS, AssertLtConfig
from .insn_base import (
    PC_STEP_SIZE,
    SUBCYCLE_RS1,
    SUBCYCLE_RS2,
    ReadReg,
    StateInOut,
    WriteRD,
    lk_fetch,
    value_limbs,
)
from .tables import OpsTable

P = 0xFFFFFFFF00000001

K = InsnKind
LOGIC_ROM = {K.AND: ROMType.And, K.OR: ROMType.Or, K.XOR: ROMType.Xor,
             K.ANDI: ROMType.And, K.ORI: ROMType.Or, K.XORI: ROMType.Xor}
LOGIC_FN = {
    ROMType.And: lambda a, b: a & b,
    ROMType.Or: lambda a, b: a | b,
    ROMType.Xor: lambda a, b: a ^ b,
}


def _u64(xs):
    return np.asarray(xs, dtype=np.uint64)


def _u8_limbs(v: np.ndarray) -> List[np.ndarray]:
    v = np.asarray(v, dtype=np.uint64)
    return [(v >> np.uint64(8 * i)) & np.uint64(0xFF) for i in range(4)]


# ---------------------------------------------------------------------------
# ADDI (arith_imm.rs)
# ---------------------------------------------------------------------------


@dataclass
class AddiConfig:
    cs: ConstraintSystem
    state: StateInOut
    rs1: ReadReg
    rd: WriteRD
    rs1_limbs: List[WitIn]
    imm_limbs: List[WitIn]
    carries: List[WitIn]


def construct_addi() -> AddiConfig:
    cs = ConstraintSystem("ADDI")
    state = StateInOut.construct(cs)
    rs1_limbs = [cs.create_witin(f"rs1_l{i}") for i in range(UINT_LIMBS)]
    imm_limbs = [cs.create_witin(f"imm_l{i}") for i in range(UINT_LIMBS)]
    carries = [cs.create_witin(f"carry_{i}") for i in range(UINT_LIMBS)]
    for c in carries:
        cs.require_zero(c * c - c, "carry_bit")
    rd_exprs = []
    for i in range(UINT_LIMBS):
        e = rs1_limbs[i] + imm_limbs[i] - carries[i] * Constant(1 << 16)
        if i > 0:
            e = e + carries[i - 1]
        rd_exprs.append(e)
        cs.lk_record(ROMType.U16, [e])
    rs1 = ReadReg.construct(cs, list(rs1_limbs), state.ts, SUBCYCLE_RS1)
    rd = WriteRD.construct(cs, rd_exprs, state.ts)
    imm_expr = imm_limbs[0] + imm_limbs[1] * Constant(1 << 16)
    lk_fetch(cs, state.pc, K.ADDI, rd.id, rs1.id, Constant(0), imm_expr)
    return AddiConfig(cs, state, rs1, rd, rs1_limbs, imm_limbs, carries)


def assign_addi(config: AddiConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    cycles = _u64([s.cycle for s in steps])
    rs1_v = _u64([s.rs1.value for s in steps])
    imm_v = _u64([s.insn.imm & 0xFFFFFFFF for s in steps])
    rd_prev = _u64([s.rd.value.before for s in steps])
    rd_new = _u64([s.rd.value.after for s in steps])

    config.state.assign(wm, pcs, cycles)
    r1l, iml = value_limbs(rs1_v), value_limbs(imm_v)
    for i in range(UINT_LIMBS):
        wm.set(config.rs1_limbs[i], r1l[i])
        wm.set(config.imm_limbs[i], iml[i])
    c0 = (r1l[0] + iml[0]) >> np.uint64(16)
    c1 = (r1l[1] + iml[1] + c0) >> np.uint64(16)
    wm.set(config.carries[0], c0)
    wm.set(config.carries[1], c1)
    rdl = value_limbs(rd_new)
    lkm.assert_ux(16, rdl[0])
    lkm.assert_ux(16, rdl[1])
    config.rs1.assign(wm, lkm, _u64([(s.rs1.addr << 2) >> 8 for s in steps]),
                      _u64([s.rs1.previous_cycle for s in steps]), cycles)
    config.rd.assign(wm, lkm, _u64([(s.rd.addr << 2) >> 8 for s in steps]),
                     _u64([s.rd.previous_cycle for s in steps]), cycles, rd_prev)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm


# ---------------------------------------------------------------------------
# Logic: AND / OR / XOR (logic_circuit.rs)
# ---------------------------------------------------------------------------


@dataclass
class LogicConfig:
    cs: ConstraintSystem
    kind: int
    rom: int
    state: StateInOut
    rs1: ReadReg
    rs2: ReadReg
    rd: WriteRD
    rs1_u8: List[WitIn]
    rs2_u8: List[WitIn]
    rd_u8: List[WitIn]


def construct_logic(kind: int) -> LogicConfig:
    assert kind in (K.AND, K.OR, K.XOR)
    rom = LOGIC_ROM[kind]
    cs = ConstraintSystem(InsnKind.NAMES[kind])
    state = StateInOut.construct(cs)
    rs1_u8 = [cs.create_witin(f"rs1_b{i}") for i in range(4)]
    rs2_u8 = [cs.create_witin(f"rs2_b{i}") for i in range(4)]
    rd_u8 = [cs.create_witin(f"rd_b{i}") for i in range(4)]
    for i in range(4):
        cs.lk_record(rom, [rs1_u8[i], rs2_u8[i], rd_u8[i]])

    def reg_expr(u8s):
        return [u8s[0] + u8s[1] * Constant(256), u8s[2] + u8s[3] * Constant(256)]

    rs1 = ReadReg.construct(cs, reg_expr(rs1_u8), state.ts, SUBCYCLE_RS1)
    rs2 = ReadReg.construct(cs, reg_expr(rs2_u8), state.ts, SUBCYCLE_RS2)
    rd = WriteRD.construct(cs, reg_expr(rd_u8), state.ts)
    lk_fetch(cs, state.pc, kind, rd.id, rs1.id, rs2.id, Constant(0))
    return LogicConfig(cs, kind, rom, state, rs1, rs2, rd, rs1_u8, rs2_u8, rd_u8)


def assign_logic(config: LogicConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    cycles = _u64([s.cycle for s in steps])
    rs1_v = _u64([s.rs1.value for s in steps])
    rs2_v = _u64([s.rs2.value for s in steps])
    rd_prev = _u64([s.rd.value.before for s in steps])

    config.state.assign(wm, pcs, cycles)
    a8, b8 = _u8_limbs(rs1_v), _u8_limbs(rs2_v)
    fn = LOGIC_FN[config.rom]
    for i in range(4):
        c8 = fn(a8[i], b8[i])
        wm.set(config.rs1_u8[i], a8[i])
        wm.set(config.rs2_u8[i], b8[i])
        wm.set(config.rd_u8[i], c8)
        lkm.increment_many(config.rom, a8[i] * np.uint64(256) + b8[i])
    config.rs1.assign(wm, lkm, _u64([(s.rs1.addr << 2) >> 8 for s in steps]),
                      _u64([s.rs1.previous_cycle for s in steps]), cycles)
    config.rs2.assign(wm, lkm, _u64([(s.rs2.addr << 2) >> 8 for s in steps]),
                      _u64([s.rs2.previous_cycle for s in steps]), cycles)
    config.rd.assign(wm, lkm, _u64([(s.rd.addr << 2) >> 8 for s in steps]),
                     _u64([s.rd.previous_cycle for s in steps]), cycles, rd_prev)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm


# ---------------------------------------------------------------------------
# SLTU / SLT (slt.rs): rd = (rs1 < rs2)
# ---------------------------------------------------------------------------


@dataclass
class SltuConfig:
    cs: ConstraintSystem
    state: StateInOut
    rs1: ReadReg
    rs2: ReadReg
    rd: WriteRD
    rs1_limbs: List[WitIn]
    rs2_limbs: List[WitIn]
    is_lt: WitIn
    diff: List[WitIn]


def construct_sltu() -> SltuConfig:
    cs = ConstraintSystem("SLTU")
    state = StateInOut.construct(cs)
    rs1_limbs = [cs.create_witin(f"rs1_l{i}") for i in range(UINT_LIMBS)]
    rs2_limbs = [cs.create_witin(f"rs2_l{i}") for i in range(UINT_LIMBS)]
    is_lt = cs.create_witin("is_lt")
    cs.require_zero(is_lt * is_lt - is_lt, "is_lt_bit")
    # IsLtConfig (is_lt.rs): lhs - rhs == diff - is_lt * 2^32, diff u16 limbs
    diff = []
    diff_expr = None
    pow16 = 1
    for i in range(UINT_LIMBS):
        w = cs.create_witin(f"lt_diff_{i}")
        cs.lk_record(ROMType.U16, [w])
        diff.append(w)
        term = w * Constant(pow16)
        diff_expr = term if diff_expr is None else diff_expr + term
        pow16 <<= 16
    lhs = rs1_limbs[0] + rs1_limbs[1] * Constant(1 << 16)
    rhs = rs2_limbs[0] + rs2_limbs[1] * Constant(1 << 16)
    cs.require_zero((lhs - rhs) - (diff_expr - is_lt * Constant(1 << 32)), "is_lt")

    rs1 = ReadReg.construct(cs, list(rs1_limbs), state.ts, SUBCYCLE_RS1)
    rs2 = ReadReg.construct(cs, list(rs2_limbs), state.ts, SUBCYCLE_RS2)
    rd = WriteRD.construct(cs, [is_lt + Constant(0), Constant(0)], state.ts)
    lk_fetch(cs, state.pc, K.SLTU, rd.id, rs1.id, rs2.id, Constant(0))
    return SltuConfig(cs, state, rs1, rs2, rd, rs1_limbs, rs2_limbs, is_lt, diff)


def assign_sltu(config: SltuConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    cycles = _u64([s.cycle for s in steps])
    rs1_v = _u64([s.rs1.value for s in steps])
    rs2_v = _u64([s.rs2.value for s in steps])
    rd_prev = _u64([s.rd.value.before for s in steps])

    config.state.assign(wm, pcs, cycles)
    r1l, r2l = value_limbs(rs1_v), value_limbs(rs2_v)
    for i in range(UINT_LIMBS):
        wm.set(config.rs1_limbs[i], r1l[i])
        wm.set(config.rs2_limbs[i], r2l[i])
    lt = (rs1_v < rs2_v).astype(np.uint64)
    wm.set(config.is_lt, lt)
    d = (rs1_v.astype(np.int64) - rs2_v.astype(np.int64) + (lt.astype(np.int64) << 32)).astype(np.uint64)
    for i, w in enumerate(config.diff):
        limb = (d >> np.uint64(16 * i)) & np.uint64(0xFFFF)
        wm.set(w, limb)
        lkm.assert_ux(16, limb)
    config.rs1.assign(wm, lkm, _u64([(s.rs1.addr << 2) >> 8 for s in steps]),
                      _u64([s.rs1.previous_cycle for s in steps]), cycles)
    config.rs2.assign(wm, lkm, _u64([(s.rs2.addr << 2) >> 8 for s in steps]),
                      _u64([s.rs2.previous_cycle for s in steps]), cycles)
    config.rd.assign(wm, lkm, _u64([(s.rd.addr << 2) >> 8 for s in steps]),
                     _u64([s.rd.previous_cycle for s in steps]), cycles, rd_prev)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm


# ---------------------------------------------------------------------------
# Branches: BEQ / BNE (branch/beq.rs via IsEqual) and BLTU/BGEU (via IsLt)
# ---------------------------------------------------------------------------


@dataclass
class BranchConfig:
    cs: ConstraintSystem
    kind: int
    state: StateInOut
    rs1: ReadReg
    rs2: ReadReg
    rs1_limbs: List[WitIn]
    rs2_limbs: List[WitIn]
    imm: WitIn
    cond: WitIn  # branch-taken bit
    aux: List[WitIn]  # inv witness (eq) or diff limbs (ltu)
    msb1: Optional[object] = None  # BLT/BGE sign-bit gadgets
    msb2: Optional[object] = None


def construct_branch(kind: int) -> BranchConfig:
    assert kind in (K.BEQ, K.BNE, K.BLTU, K.BGEU, K.BLT, K.BGE)
    cs = ConstraintSystem(InsnKind.NAMES[kind])
    state = StateInOut.construct(cs, branching=True)
    rs1_limbs = [cs.create_witin(f"rs1_l{i}") for i in range(UINT_LIMBS)]
    rs2_limbs = [cs.create_witin(f"rs2_l{i}") for i in range(UINT_LIMBS)]
    imm = cs.create_witin("imm")
    cond = cs.create_witin("cond")
    cs.require_zero(cond * cond - cond, "cond_bit")

    lhs = rs1_limbs[0] + rs1_limbs[1] * Constant(1 << 16)
    rhs = rs2_limbs[0] + rs2_limbs[1] * Constant(1 << 16)
    aux: List[WitIn] = []
    msb1 = msb2 = None
    if kind in (K.BLT, K.BGE):
        # signed compare: offset both sides by msb*2^32 (signed_ext.rs + is_lt.rs)
        from .gadgets import MsbConfig

        msb1 = MsbConfig.construct(cs, rs1_limbs[1], "msb1")
        msb2 = MsbConfig.construct(cs, rs2_limbs[1], "msb2")
        lhs = lhs - msb1.msb * Constant(1 << 32)
        rhs = rhs - msb2.msb * Constant(1 << 32)
    if kind in (K.BEQ, K.BNE):
        # is_eq gadget: inv witness; diff * is_eq == 0; is_eq = 1 - diff*inv
        inv = cs.create_witin("diff_inv")
        aux.append(inv)
        diff = lhs - rhs
        is_eq_expr = Constant(1) - diff * inv
        eq_bit = cond if kind == K.BEQ else (Constant(1) - cond)
        cs.require_zero(eq_bit - is_eq_expr, "eq_bit")
        cs.require_zero(diff * eq_bit, "diff_eq_zero")
    else:
        # unsigned lt via u16 diff limbs: lhs - rhs == diff - is_lt*2^32
        diff_expr = None
        pow16 = 1
        for i in range(UINT_LIMBS):
            w = cs.create_witin(f"lt_diff_{i}")
            cs.lk_record(ROMType.U16, [w])
            aux.append(w)
            term = w * Constant(pow16)
            diff_expr = term if diff_expr is None else diff_expr + term
            pow16 <<= 16
        lt_bit = cond if kind in (K.BLTU, K.BLT) else (Constant(1) - cond)
        cs.require_zero((lhs - rhs) - (diff_expr - lt_bit * Constant(1 << 32)), "is_lt")

    # next_pc = pc + (cond ? imm : 4)
    next_pc = state.next_pc
    cs.require_zero(
        next_pc - (state.pc + cond * imm + (Constant(1) - cond) * Constant(PC_STEP_SIZE)),
        "branch_next_pc",
    )

    rs1 = ReadReg.construct(cs, list(rs1_limbs), state.ts, SUBCYCLE_RS1)
    rs2 = ReadReg.construct(cs, list(rs2_limbs), state.ts, SUBCYCLE_RS2)
    lk_fetch(cs, state.pc, kind, Constant(32), rs1.id, rs2.id, imm)
    return BranchConfig(cs, kind, state, rs1, rs2, rs1_limbs, rs2_limbs, imm, cond,
                        aux, msb1, msb2)


def assign_branch(config: BranchConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    next_pcs = _u64([s.pc.after for s in steps])
    cycles = _u64([s.cycle for s in steps])
    rs1_v = _u64([s.rs1.value for s in steps])
    rs2_v = _u64([s.rs2.value for s in steps])
    imm_f = signed_to_field([s.insn.imm for s in steps])

    config.state.assign(wm, pcs, cycles, next_pcs)
    r1l, r2l = value_limbs(rs1_v), value_limbs(rs2_v)
    for i in range(UINT_LIMBS):
        wm.set(config.rs1_limbs[i], r1l[i])
        wm.set(config.rs2_limbs[i], r2l[i])
    wm.set(config.imm, imm_f)

    k = config.kind
    if k in (K.BEQ, K.BNE):
        eq = (rs1_v == rs2_v)
        cond = eq if k == K.BEQ else ~eq
        wm.set(config.cond, cond.astype(np.uint64))
        diff = (rs1_v.astype(np.int64) - rs2_v.astype(np.int64))
        inv = np.asarray(
            [0 if d == 0 else pow(int(d) % P, P - 2, P) for d in diff],
            dtype=np.uint64,
        )
        wm.set(config.aux[0], inv)
    else:
        if k in (K.BLT, K.BGE):
            s1 = rs1_v.astype(np.int64)
            s1 = np.where(s1 >= (1 << 31), s1 - (1 << 32), s1)
            s2 = rs2_v.astype(np.int64)
            s2 = np.where(s2 >= (1 << 31), s2 - (1 << 32), s2)
            config.msb1.assign(wm, lkm, (rs1_v >> np.uint64(16)) & np.uint64(0xFFFF))
            config.msb2.assign(wm, lkm, (rs2_v >> np.uint64(16)) & np.uint64(0xFFFF))
        else:
            s1 = rs1_v.astype(np.int64)
            s2 = rs2_v.astype(np.int64)
        lt = s1 < s2
        cond = lt if k in (K.BLTU, K.BLT) else ~lt
        wm.set(config.cond, cond.astype(np.uint64))
        d = (s1 - s2 + (lt.astype(np.int64) << 32)).astype(np.uint64)
        for i, w in enumerate(config.aux):
            limb = (d >> np.uint64(16 * i)) & np.uint64(0xFFFF)
            wm.set(w, limb)
            lkm.assert_ux(16, limb)

    config.rs1.assign(wm, lkm, _u64([(s.rs1.addr << 2) >> 8 for s in steps]),
                      _u64([s.rs1.previous_cycle for s in steps]), cycles)
    config.rs2.assign(wm, lkm, _u64([(s.rs2.addr << 2) >> 8 for s in steps]),
                      _u64([s.rs2.previous_cycle for s in steps]), cycles)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm


# ---------------------------------------------------------------------------
# JAL (jump/jal.rs): rd = pc + 4; next_pc = pc + imm
# ---------------------------------------------------------------------------


@dataclass
class JalConfig:
    cs: ConstraintSystem
    state: StateInOut
    rd: WriteRD
    imm: WitIn
    rd_limbs: List[WitIn]


def construct_jal() -> JalConfig:
    cs = ConstraintSystem("JAL")
    state = StateInOut.construct(cs, branching=True)
    imm = cs.create_witin("imm")
    rd_limbs = [cs.create_witin(f"rd_l{i}") for i in range(UINT_LIMBS)]
    for w in rd_limbs:
        cs.lk_record(ROMType.U16, [w])
    # rd value = pc + 4 (as a 32-bit value; pc+4 never overflows in ROM range)
    cs.require_zero(
        rd_limbs[0] + rd_limbs[1] * Constant(1 << 16) - (state.pc + PC_STEP_SIZE),
        "jal_rd",
    )
    cs.require_zero(state.next_pc - (state.pc + imm), "jal_next_pc")
    rd = WriteRD.construct(cs, [rd_limbs[0] + Constant(0), rd_limbs[1] + Constant(0)], state.ts)
    lk_fetch(cs, state.pc, K.JAL, rd.id, Constant(0), Constant(0), imm)
    return JalConfig(cs, state, rd, imm, rd_limbs)


def assign_jal(config: JalConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    next_pcs = _u64([s.pc.after for s in steps])
    cycles = _u64([s.cycle for s in steps])
    rd_prev = _u64([s.rd.value.before for s in steps])
    config.state.assign(wm, pcs, cycles, next_pcs)
    wm.set(config.imm, signed_to_field([s.insn.imm for s in steps]))
    rdl = value_limbs((pcs + 4) & np.uint64(0xFFFFFFFF))
    wm.set(config.rd_limbs[0], rdl[0])
    wm.set(config.rd_limbs[1], rdl[1])
    lkm.assert_ux(16, rdl[0])
    lkm.assert_ux(16, rdl[1])
    config.rd.assign(wm, lkm, _u64([(s.rd.addr << 2) >> 8 for s in steps]),
                     _u64([s.rd.previous_cycle for s in steps]), cycles, rd_prev)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm
