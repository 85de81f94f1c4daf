"""Opcode circuits, part 2: logic-imm, SLT family, shifts, JALR, MUL family,
DIV family, and the ECALL-HALT circuit.

Mirrors the reference circuits:
* logic_imm.rs — ANDI/ORI/XORI via byte-table lookups with a witnessed
  immediate bound to the fetch record;
* slt.rs / slti.rs — signed/unsigned compare via sign-bit extraction
  (gadgets/signed_ext.rs) + the IsLt diff-limb gadget (gadgets/is_lt.rs);
* shift.rs / shift_imm.rs — multiply/divide by a power of two; immediate
  shifts read 2^shamt straight from the program table (tables/program.rs:56-76
  stores 1<<imm for SLLI/SRLI/SRAI), register shifts look up 2^(rs2 & 31) in
  the Pow ROM;
* jump/jalr.rs — rd = pc+4, next_pc = (rs1 + imm) & ~1 with wrap handling;
* mul.rs — limbed 32x32->64 multiply with carry range checks; signed
  variants via the identity mulh(a,b) = (mulhu(a,b) - msb_a*b - msb_b*a)
  mod 2^32;
* div.rs — magnitude decomposition |a| = q*|d| + r, r < |d|, with sign
  reconstruction and the divide-by-zero / overflow special cases;
* ecall/halt.rs — reads x5 (must equal ECALL_HALT) and x10 (bound to the
  exit_code public instance), forces next_pc = 0.

All zero-assertions are kept at degree <= 2 so the main-sel sumcheck stays
at the reference's degree-3 product shape (prover_v2.rs:491-533).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ...emul.insn import InsnKind
from ...emul.platform import Platform
from ..circuit_builder import ConstraintSystem, RAMType, ROMType
from ..expression import Constant, Expr, Instance, WitIn
from ..witness import LkMultiplicity, WitnessMatrix, signed_to_field
from .gadgets import (
    UINT_LIMBS,
    AssertLtConfig,
    IsZeroConfig,
    LtConfig,
    MsbConfig,
    MulLimbConfig,
)
from .insn_base import (
    PC_STEP_SIZE,
    SUBCYCLE_RS1,
    SUBCYCLE_RS2,
    SUBCYCLES_PER_INSN,
    ReadReg,
    StateInOut,
    WriteRD,
    lk_fetch,
    register_read,
    value_limbs,
)
from .insns import LOGIC_FN, LOGIC_ROM, _u64, _u8_limbs
from .uint import UInt

P = 0xFFFFFFFF00000001
M32 = 0xFFFFFFFF
K = InsnKind


def _val(limbs: List[Expr]) -> Expr:
    return limbs[0] + limbs[1] * Constant(1 << 16)


def _rs1_assign(cfg_rs1: ReadReg, wm, lkm, steps, cycles) -> None:
    cfg_rs1.assign(wm, lkm, _u64([(s.rs1.addr << 2) >> 8 for s in steps]),
                   _u64([s.rs1.previous_cycle for s in steps]), cycles)


def _rs2_assign(cfg_rs2: ReadReg, wm, lkm, steps, cycles) -> None:
    cfg_rs2.assign(wm, lkm, _u64([(s.rs2.addr << 2) >> 8 for s in steps]),
                   _u64([s.rs2.previous_cycle for s in steps]), cycles)


def _rd_assign(cfg_rd: WriteRD, wm, lkm, steps, cycles) -> None:
    cfg_rd.assign(wm, lkm, _u64([(s.rd.addr << 2) >> 8 for s in steps]),
                  _u64([s.rd.previous_cycle for s in steps]), cycles,
                  _u64([s.rd.value.before for s in steps]))


def _signed32(v: np.ndarray) -> np.ndarray:
    """u32 values -> int64 sign-extended."""
    v = np.asarray(v, dtype=np.uint64).astype(np.int64)
    return np.where(v >= (1 << 31), v - (1 << 32), v)


# ---------------------------------------------------------------------------
# ANDI / ORI / XORI (logic_imm.rs)
# ---------------------------------------------------------------------------


@dataclass
class LogicImmConfig:
    cs: ConstraintSystem
    kind: int
    rom: int
    state: StateInOut
    rs1: ReadReg
    rd: WriteRD
    rs1_u8: List[WitIn]
    imm_u8: List[WitIn]
    rd_u8: List[WitIn]


def construct_logic_imm(kind: int) -> LogicImmConfig:
    assert kind in (K.ANDI, K.ORI, K.XORI)
    rom = LOGIC_ROM[kind]
    cs = ConstraintSystem(InsnKind.NAMES[kind])
    state = StateInOut.construct(cs)
    rs1_u8 = [cs.create_witin(f"rs1_b{i}") for i in range(4)]
    imm_u8 = [cs.create_witin(f"imm_b{i}") for i in range(4)]
    rd_u8 = [cs.create_witin(f"rd_b{i}") for i in range(4)]
    for i in range(4):
        cs.lk_record(rom, [rs1_u8[i], imm_u8[i], rd_u8[i]])

    def reg_expr(u8s):
        return [u8s[0] + u8s[1] * Constant(256), u8s[2] + u8s[3] * Constant(256)]

    rs1 = ReadReg.construct(cs, reg_expr(rs1_u8), state.ts, SUBCYCLE_RS1)
    rd = WriteRD.construct(cs, reg_expr(rd_u8), state.ts)
    # unsigned imm view, recombined from the byte witnesses (imm_internal)
    imm_expr = (imm_u8[0] + imm_u8[1] * Constant(256)
                + imm_u8[2] * Constant(1 << 16) + imm_u8[3] * Constant(1 << 24))
    lk_fetch(cs, state.pc, kind, rd.id, rs1.id, Constant(0), imm_expr)
    return LogicImmConfig(cs, kind, rom, state, rs1, rd, rs1_u8, imm_u8, rd_u8)


def assign_logic_imm(config: LogicImmConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    cycles = _u64([s.cycle for s in steps])
    rs1_v = _u64([s.rs1.value for s in steps])
    imm_v = _u64([s.insn.imm & M32 for s in steps])
    config.state.assign(wm, pcs, cycles)
    a8, b8 = _u8_limbs(rs1_v), _u8_limbs(imm_v)
    fn = LOGIC_FN[config.rom]
    for i in range(4):
        wm.set(config.rs1_u8[i], a8[i])
        wm.set(config.imm_u8[i], b8[i])
        wm.set(config.rd_u8[i], fn(a8[i], b8[i]))
        lkm.increment_many(config.rom, a8[i] * np.uint64(256) + b8[i])
    _rs1_assign(config.rs1, wm, lkm, steps, cycles)
    _rd_assign(config.rd, wm, lkm, steps, cycles)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm


# ---------------------------------------------------------------------------
# SLT / SLTI / SLTIU (slt.rs, slti.rs); SLTU lives in insns.py
# ---------------------------------------------------------------------------


@dataclass
class SltConfig:
    cs: ConstraintSystem
    kind: int
    state: StateInOut
    rs1: ReadReg
    rs2: Optional[ReadReg]
    rd: WriteRD
    rs1_u: UInt
    rhs_u: UInt  # rs2 (SLT) or imm (SLTI/SLTIU)
    msb1: Optional[MsbConfig]
    msb2: Optional[MsbConfig]
    lt: LtConfig


def construct_slt(kind: int) -> SltConfig:
    assert kind in (K.SLT, K.SLTI, K.SLTIU)
    signed = kind in (K.SLT, K.SLTI)
    is_imm = kind in (K.SLTI, K.SLTIU)
    cs = ConstraintSystem(InsnKind.NAMES[kind])
    state = StateInOut.construct(cs)
    # register reads are multiset-bound -> unchecked limbs (uint.rs
    # new_unchecked); the immediate needs its own U16 range checks
    rs1_u = UInt.new_unchecked(cs, "rs1")
    rhs_u = UInt.new(cs, "imm") if is_imm else UInt.new_unchecked(cs, "rs2")
    lhs, rhs = rs1_u.value(), rhs_u.value()
    msb1 = msb2 = None
    if signed:
        msb1 = MsbConfig.construct(cs, rs1_u.limbs[1], "msb1")
        msb2 = MsbConfig.construct(cs, rhs_u.limbs[1], "msb2")
        lt = LtConfig.construct(
            cs, lhs - msb1.msb * Constant(1 << 32), rhs - msb2.msb * Constant(1 << 32)
        )
    else:
        lt = LtConfig.construct(cs, lhs, rhs)
    rs1 = ReadReg.construct(cs, rs1_u.expr(), state.ts, SUBCYCLE_RS1)
    rs2 = None
    if not is_imm:
        rs2 = ReadReg.construct(cs, rhs_u.expr(), state.ts, SUBCYCLE_RS2)
    rd = WriteRD.construct(cs, [lt.is_lt + Constant(0), Constant(0)], state.ts)
    if kind == K.SLT:
        lk_fetch(cs, state.pc, kind, rd.id, rs1.id, rs2.id, Constant(0))
    elif kind == K.SLTIU:
        lk_fetch(cs, state.pc, kind, rd.id, rs1.id, Constant(0), rhs)
    else:  # SLTI: fetch stores the signed field view (imm_internal)
        imm_field = rhs + msb2.msb * Constant(P - (1 << 32))
        lk_fetch(cs, state.pc, kind, rd.id, rs1.id, Constant(0), imm_field)
    return SltConfig(cs, kind, state, rs1, rs2, rd, rs1_u, rhs_u, msb1, msb2, lt)


def assign_slt(config: SltConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    cycles = _u64([s.cycle for s in steps])
    rs1_v = _u64([s.rs1.value for s in steps])
    if config.rs2 is not None:
        rhs_v = _u64([s.rs2.value for s in steps])
    else:
        rhs_v = _u64([s.insn.imm & M32 for s in steps])
    config.state.assign(wm, pcs, cycles)
    config.rs1_u.assign(wm, lkm, rs1_v)
    config.rhs_u.assign(wm, lkm, rhs_v)
    if config.msb1 is not None:
        config.msb1.assign(wm, lkm, value_limbs(rs1_v)[1])
        config.msb2.assign(wm, lkm, value_limbs(rhs_v)[1])
        config.lt.assign(wm, lkm, _signed32(rs1_v), _signed32(rhs_v))
    else:
        config.lt.assign(wm, lkm, rs1_v.astype(np.int64), rhs_v.astype(np.int64))
    _rs1_assign(config.rs1, wm, lkm, steps, cycles)
    if config.rs2 is not None:
        _rs2_assign(config.rs2, wm, lkm, steps, cycles)
    _rd_assign(config.rd, wm, lkm, steps, cycles)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm


# ---------------------------------------------------------------------------
# Shifts: SLLI/SRLI/SRAI (shift_imm.rs) and SLL/SRL/SRA (shift.rs)
# ---------------------------------------------------------------------------


@dataclass
class ShiftConfig:
    cs: ConstraintSystem
    kind: int
    state: StateInOut
    rs1: ReadReg
    rs2: Optional[ReadReg]  # register shifts only
    rd: WriteRD
    rs1_u: UInt
    rs2_u: Optional[UInt]
    pow: WitIn
    shamt: Optional[WitIn]  # register shifts: rs2 & 31
    rest: Optional[WitIn]  # rs2_l0 >> 5
    rd_u: UInt
    aux_u: UInt  # SLLI outflow / SRLI-SRAI remainder
    aux_lt: AssertLtConfig
    msb: Optional[MsbConfig]  # SRA/SRAI


def construct_shift(kind: int) -> ShiftConfig:
    assert kind in (K.SLLI, K.SRLI, K.SRAI, K.SLL, K.SRL, K.SRA)
    is_imm = kind in (K.SLLI, K.SRLI, K.SRAI)
    left = kind in (K.SLLI, K.SLL)
    arith = kind in (K.SRAI, K.SRA)
    cs = ConstraintSystem(InsnKind.NAMES[kind])
    state = StateInOut.construct(cs)
    rs1_u = UInt.new_unchecked(cs, "rs1")
    rs1_val = rs1_u.value()
    pow_w = cs.create_witin("pow")
    shamt = rest = None
    rs2_u = None
    rs2 = None
    if not is_imm:
        rs2_u = UInt.new_unchecked(cs, "rs2")
        shamt = cs.create_witin("shamt")
        rest = cs.create_witin("rest")
        # rs2_l0 = shamt + 32*rest, rest < 2^11 via U16(32*rest); shamt < 32
        # enforced by the Pow table domain
        cs.require_zero(rs2_u.limbs[0] - shamt - rest * Constant(32), "shamt_decomp")
        cs.lk_record(ROMType.U16, [rest * Constant(32)])
        cs.lk_record(ROMType.Pow, [Constant(2), shamt, pow_w])

    rd_u = UInt.new(cs, "rd_l")
    aux_u = UInt.new(cs, "aux_l")
    rd_val, aux_val = rd_u.value(), aux_u.value()
    # outflow < pow (SLL) / remainder < pow (SRL, SRA)
    aux_lt = AssertLtConfig.construct(cs, aux_val, pow_w)
    msb = None
    if left:
        # rs1 * pow = outflow * 2^32 + rd
        cs.require_zero(
            rs1_val * pow_w - aux_val * Constant(1 << 32) - rd_val, "shift_left"
        )
    elif not arith:
        # rs1 = rd * pow + rem
        cs.require_zero(rs1_val - rd_val * pow_w - aux_val, "shift_right")
    else:
        # signed: rs1_s = rd_s * pow + rem with s-values offset by msb*2^32
        msb = MsbConfig.construct(cs, rs1_u.limbs[1], "msb")
        off = msb.msb * Constant(1 << 32)
        cs.require_zero(
            (rs1_val - off) - (rd_val - off) * pow_w - aux_val, "shift_arith"
        )

    rs1 = ReadReg.construct(cs, rs1_u.expr(), state.ts, SUBCYCLE_RS1)
    if not is_imm:
        rs2 = ReadReg.construct(cs, rs2_u.expr(), state.ts, SUBCYCLE_RS2)
    rd = WriteRD.construct(cs, rd_u.expr(), state.ts)
    if is_imm:
        # program table stores 2^shamt as the immediate (program.rs:56-76)
        lk_fetch(cs, state.pc, kind, rd.id, rs1.id, Constant(0), pow_w)
    else:
        lk_fetch(cs, state.pc, kind, rd.id, rs1.id, rs2.id, Constant(0))
    return ShiftConfig(cs, kind, state, rs1, rs2, rd, rs1_u, rs2_u, pow_w,
                       shamt, rest, rd_u, aux_u, aux_lt, msb)


def assign_shift(config: ShiftConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    cycles = _u64([s.cycle for s in steps])
    rs1_v = _u64([s.rs1.value for s in steps])
    config.state.assign(wm, pcs, cycles)
    config.rs1_u.assign(wm, lkm, rs1_v)

    if config.rs2 is not None:
        rs2_v = _u64([s.rs2.value for s in steps])
        config.rs2_u.assign(wm, lkm, rs2_v)
        shamt = rs2_v & np.uint64(31)
        rest = (rs2_v & np.uint64(0xFFFF)) >> np.uint64(5)
        wm.set(config.shamt, shamt)
        wm.set(config.rest, rest)
        lkm.assert_ux(16, rest * np.uint64(32))
        lkm.increment_many(ROMType.Pow, shamt)
    else:
        shamt = _u64([s.insn.imm & 0x1F for s in steps])
    pow_v = np.uint64(1) << shamt
    wm.set(config.pow, pow_v)

    left = config.kind in (K.SLL, K.SLLI)
    arith = config.kind in (K.SRA, K.SRAI)
    if left:
        full = rs1_v * pow_v  # < 2^63, fits u64
        rd_v = full & np.uint64(M32)
        aux_v = full >> np.uint64(32)
    elif not arith:
        rd_v = rs1_v >> shamt
        aux_v = rs1_v - (rd_v << shamt)
    else:
        s_v = _signed32(rs1_v)
        rd_s = s_v >> shamt.astype(np.int64)
        aux_v = (s_v - (rd_s << shamt.astype(np.int64))).astype(np.uint64)
        rd_v = (rd_s & np.int64(M32)).astype(np.uint64)
        config.msb.assign(wm, lkm, value_limbs(rs1_v)[1])
    config.rd_u.assign(wm, lkm, rd_v)
    config.aux_u.assign(wm, lkm, aux_v)
    config.aux_lt.assign(wm, lkm, aux_v, pow_v)

    _rs1_assign(config.rs1, wm, lkm, steps, cycles)
    if config.rs2 is not None:
        _rs2_assign(config.rs2, wm, lkm, steps, cycles)
    _rd_assign(config.rd, wm, lkm, steps, cycles)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm


# ---------------------------------------------------------------------------
# JALR (jump/jalr.rs): rd = pc + 4; next_pc = (rs1 + imm) & ~1
# ---------------------------------------------------------------------------


@dataclass
class JalrConfig:
    cs: ConstraintSystem
    state: StateInOut
    rs1: ReadReg
    rd: WriteRD
    rs1_u: UInt
    imm: WitIn
    rd_u: UInt
    npc_half: WitIn
    npc_hi: WitIn
    lsb: WitIn
    kp: WitIn
    kn: WitIn


def construct_jalr() -> JalrConfig:
    cs = ConstraintSystem("JALR")
    state = StateInOut.construct(cs, branching=True)
    rs1_u = UInt.new_unchecked(cs, "rs1")
    imm = cs.create_witin("imm")
    rd_u = UInt.new(cs, "rd_l")
    cs.require_zero(rd_u.value() - (state.pc + PC_STEP_SIZE), "jalr_rd")
    # next_pc = 2*half + hi*2^16 (even, u32): half 15-bit via U16(2*half)
    half = cs.create_witin("npc_half")
    hi = cs.create_witin("npc_hi")
    cs.lk_record(ROMType.U16, [half * Constant(2)])
    cs.lk_record(ROMType.U16, [hi])
    npc_val = half * Constant(2) + hi * Constant(1 << 16)
    cs.require_zero(state.next_pc - npc_val, "jalr_npc")
    lsb = cs.create_witin("lsb")
    cs.require_zero(lsb * lsb - lsb, "lsb_bit")
    kp = cs.create_witin("wrap_p")
    kn = cs.create_witin("wrap_n")
    cs.require_zero(kp * kp - kp, "wrap_p_bit")
    cs.require_zero(kn * kn - kn, "wrap_n_bit")
    cs.require_zero(kp * kn, "wrap_excl")
    # rs1 + imm = next_pc + lsb + (kp - kn)*2^32  (imm is the signed field
    # view pinned by the fetch record)
    cs.require_zero(
        rs1_u.value() + imm - npc_val - lsb - (kp - kn) * Constant(1 << 32),
        "jalr_target",
    )
    rs1 = ReadReg.construct(cs, rs1_u.expr(), state.ts, SUBCYCLE_RS1)
    rd = WriteRD.construct(cs, rd_u.expr(), state.ts)
    lk_fetch(cs, state.pc, K.JALR, rd.id, rs1.id, Constant(0), imm)
    return JalrConfig(cs, state, rs1, rd, rs1_u, imm, rd_u, half, hi, lsb, kp, kn)


def assign_jalr(config: JalrConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    next_pcs = _u64([s.pc.after for s in steps])
    cycles = _u64([s.cycle for s in steps])
    rs1_v = _u64([s.rs1.value for s in steps])
    simm = np.asarray([s.insn.imm for s in steps], dtype=np.int64)
    config.state.assign(wm, pcs, cycles, next_pcs)
    config.rs1_u.assign(wm, lkm, rs1_v)
    wm.set(config.imm, signed_to_field([s.insn.imm for s in steps]))
    config.rd_u.assign(wm, lkm, (pcs + 4) & np.uint64(M32))
    target_full = rs1_v.astype(np.int64) + simm
    target = (target_full & np.int64(M32)).astype(np.uint64)
    lsb = target & np.uint64(1)
    npc = target - lsb
    assert (npc == next_pcs).all(), "jalr target mismatch"
    half = (npc & np.uint64(0xFFFF)) >> np.uint64(1)
    hi = npc >> np.uint64(16)
    wm.set(config.npc_half, half)
    wm.set(config.npc_hi, hi)
    lkm.assert_ux(16, half * np.uint64(2))
    lkm.assert_ux(16, hi)
    wm.set(config.lsb, lsb)
    k = (target_full - target.astype(np.int64)) >> np.int64(32)
    wm.set(config.kp, (k > 0).astype(np.uint64))
    wm.set(config.kn, (k < 0).astype(np.uint64))
    _rs1_assign(config.rs1, wm, lkm, steps, cycles)
    _rd_assign(config.rd, wm, lkm, steps, cycles)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm


# ---------------------------------------------------------------------------
# MUL / MULH / MULHU / MULHSU (mul.rs)
# ---------------------------------------------------------------------------


@dataclass
class MulConfig:
    cs: ConstraintSystem
    kind: int
    state: StateInOut
    rs1: ReadReg
    rs2: ReadReg
    rd: WriteRD
    rs1_u: UInt
    rs2_u: UInt
    mul: MulLimbConfig
    msb1: Optional[MsbConfig]
    msb2: Optional[MsbConfig]
    rd_u: Optional[UInt]  # MULH/MULHSU corrected high word
    borrow: List[WitIn]


def construct_mul(kind: int) -> MulConfig:
    assert kind in (K.MUL, K.MULH, K.MULHU, K.MULHSU)
    cs = ConstraintSystem(InsnKind.NAMES[kind])
    state = StateInOut.construct(cs)
    rs1_u = UInt.new_unchecked(cs, "rs1")
    rs2_u = UInt.new_unchecked(cs, "rs2")
    mul = MulLimbConfig.construct(cs, rs1_u.expr(), rs2_u.expr())
    hi_val = _val(mul.hi)
    msb1 = msb2 = None
    rd_u = None
    borrow: List[WitIn] = []
    if kind == K.MUL:
        rd_exprs = [mul.lo[0] + Constant(0), mul.lo[1] + Constant(0)]
    elif kind == K.MULHU:
        rd_exprs = [mul.hi[0] + Constant(0), mul.hi[1] + Constant(0)]
    else:
        msb1 = MsbConfig.construct(cs, rs1_u.limbs[1], "msb1")
        rd_u = UInt.new(cs, "rdh_l")
        rd_val = rd_u.value()
        n_borrow = 2 if kind == K.MULH else 1
        borrow = [cs.create_witin(f"borrow_{i}") for i in range(n_borrow)]
        for b in borrow:
            cs.require_zero(b * b - b, "borrow_bit")
        borrow_expr = borrow[0] if n_borrow == 1 else borrow[0] + borrow[1]
        # mulh = (hi - msb_a*b - msb_b*a) mod 2^32 ; mulhsu drops the b term
        corr = msb1.msb * rs2_u.value()
        if kind == K.MULH:
            msb2 = MsbConfig.construct(cs, rs2_u.limbs[1], "msb2")
            corr = corr + msb2.msb * rs1_u.value()
        cs.require_zero(
            hi_val - corr - rd_val + borrow_expr * Constant(1 << 32), "mulh"
        )
        rd_exprs = rd_u.expr()
    rs1 = ReadReg.construct(cs, rs1_u.expr(), state.ts, SUBCYCLE_RS1)
    rs2 = ReadReg.construct(cs, rs2_u.expr(), state.ts, SUBCYCLE_RS2)
    rd = WriteRD.construct(cs, rd_exprs, state.ts)
    lk_fetch(cs, state.pc, kind, rd.id, rs1.id, rs2.id, Constant(0))
    return MulConfig(cs, kind, state, rs1, rs2, rd, rs1_u, rs2_u, mul,
                     msb1, msb2, rd_u, borrow)


def assign_mul(config: MulConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    cycles = _u64([s.cycle for s in steps])
    a = _u64([s.rs1.value for s in steps])
    b = _u64([s.rs2.value for s in steps])
    config.state.assign(wm, pcs, cycles)
    config.rs1_u.assign(wm, lkm, a)
    config.rs2_u.assign(wm, lkm, b)
    config.mul.assign(wm, lkm, a, b)
    if config.msb1 is not None:
        msb_a = a >> np.uint64(31)
        config.msb1.assign(wm, lkm, value_limbs(a)[1])
        hi = (a * b) >> np.uint64(32)
        corr = msb_a * b
        if config.kind == K.MULH:
            msb_b = b >> np.uint64(31)
            config.msb2.assign(wm, lkm, value_limbs(b)[1])
            corr = corr + msb_b * a
        val = hi.astype(np.int64) - corr.astype(np.int64)
        rd_v = (val & np.int64(M32)).astype(np.uint64)
        borrow = ((rd_v.astype(np.int64) - val) >> np.int64(32)).astype(np.uint64)
        config.rd_u.assign(wm, lkm, rd_v)
        wm.set(config.borrow[0], np.minimum(borrow, 1))
        if len(config.borrow) > 1:
            wm.set(config.borrow[1], borrow - np.minimum(borrow, 1))
    _rs1_assign(config.rs1, wm, lkm, steps, cycles)
    _rs2_assign(config.rs2, wm, lkm, steps, cycles)
    _rd_assign(config.rd, wm, lkm, steps, cycles)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm


# ---------------------------------------------------------------------------
# DIVU / REMU / DIV / REM (div.rs)
# ---------------------------------------------------------------------------


@dataclass
class DivRemConfig:
    cs: ConstraintSystem
    kind: int
    state: StateInOut
    rs1: ReadReg
    rs2: ReadReg
    rd: WriteRD
    rs1_u: UInt
    rs2_u: UInt
    q_u: UInt
    r_u: UInt
    mul: MulLimbConfig
    div_zero: IsZeroConfig
    r_lt: LtConfig
    # signed-only pieces
    msb1: Optional[MsbConfig] = None
    msb2: Optional[MsbConfig] = None
    a_abs: Optional[UInt] = None
    d_abs: Optional[UInt] = None
    q_out: Optional[UInt] = None
    r_out: Optional[UInt] = None
    s_q: Optional[WitIn] = None
    nz_q: Optional[WitIn] = None
    nz_r: Optional[WitIn] = None


def construct_div_rem(kind: int) -> DivRemConfig:
    assert kind in (K.DIVU, K.REMU, K.DIV, K.REM)
    signed = kind in (K.DIV, K.REM)
    cs = ConstraintSystem(InsnKind.NAMES[kind])
    state = StateInOut.construct(cs)
    rs1_u = UInt.new_unchecked(cs, "rs1")
    rs2_u = UInt.new_unchecked(cs, "rs2")
    a_val, d_val = rs1_u.value(), rs2_u.value()

    msb1 = msb2 = s_q = nz_q = nz_r = None
    a_abs = d_abs = None
    if signed:
        # |x| = (x - msb*2^32) * (1 - 2*msb), bound to u16-checked limbs
        msb1 = MsbConfig.construct(cs, rs1_u.limbs[1], "msb1")
        msb2 = MsbConfig.construct(cs, rs2_u.limbs[1], "msb2")
        a_abs = UInt.new(cs, "a_abs")
        d_abs = UInt.new(cs, "d_abs")
        cs.require_zero(
            a_abs.value()
            - (a_val - msb1.msb * Constant(1 << 32)) * (Constant(1) - msb1.msb * Constant(2)),
            "a_abs",
        )
        cs.require_zero(
            d_abs.value()
            - (d_val - msb2.msb * Constant(1 << 32)) * (Constant(1) - msb2.msb * Constant(2)),
            "d_abs",
        )
        num, den = a_abs.value(), d_abs.value()
        den_u = d_abs
    else:
        num, den = a_val, d_val
        den_u = rs2_u

    q_u = UInt.new(cs, "q_l")
    r_u = UInt.new(cs, "r_l")
    q_val, r_val = q_u.value(), r_u.value()
    # q*den + r = num with q*den < 2^32 (with_hi=False forces the high word 0)
    mul = MulLimbConfig.construct(cs, q_u.expr(), den_u.expr(), with_hi=False)
    cs.require_zero(_val(mul.lo) + r_val - num, "div_identity")
    div_zero = IsZeroConfig.construct(cs, den, "div0")
    r_lt = LtConfig.construct(cs, r_val, den, "rlt")
    z = div_zero.is_zero
    cs.require_zero((Constant(1) - z) * (Constant(1) - r_lt.is_lt), "rem_lt_divisor")

    if not signed:
        cs.require_zero(z * (q_val - Constant(M32)), "div0_q")
        cs.require_zero(z * (r_val - a_val), "div0_r")
        rd_exprs = (q_u if kind == K.DIVU else r_u).expr()
        q_out = r_out = None
    else:
        # sign reconstruction: q = s_q ? -q_abs : q_abs ; r sign = sign(a)
        q_out = UInt.new(cs, "q_out")
        r_out = UInt.new(cs, "r_out")
        s_q = cs.create_witin("s_q")
        cs.require_zero(
            s_q - (msb1.msb + msb2.msb - msb1.msb * msb2.msb * Constant(2)), "s_q_def"
        )
        nz_q = cs.create_witin("nz_q")
        nz_r = cs.create_witin("nz_r")
        cs.require_zero(nz_q * nz_q - nz_q, "nz_q_bit")
        cs.require_zero(nz_r * nz_r - nz_r, "nz_r_bit")
        qo, ro = q_out.value(), r_out.value()
        cs.require_zero(
            s_q * (qo + q_val - nz_q * Constant(1 << 32)) + (Constant(1) - s_q) * (qo - q_val),
            "q_sign",
        )
        cs.require_zero(
            msb1.msb * (ro + r_val - nz_r * Constant(1 << 32))
            + (Constant(1) - msb1.msb) * (ro - r_val),
            "r_sign",
        )
        # divide-by-zero: q = -1 (r = a falls out of the sign reconstruction)
        cs.require_zero(z * (qo - Constant(M32)), "div0_q")
        rd_exprs = (q_out if kind == K.DIV else r_out).expr()

    rs1 = ReadReg.construct(cs, rs1_u.expr(), state.ts, SUBCYCLE_RS1)
    rs2 = ReadReg.construct(cs, rs2_u.expr(), state.ts, SUBCYCLE_RS2)
    rd = WriteRD.construct(cs, rd_exprs, state.ts)
    lk_fetch(cs, state.pc, kind, rd.id, rs1.id, rs2.id, Constant(0))
    return DivRemConfig(cs, kind, state, rs1, rs2, rd, rs1_u, rs2_u,
                        q_u, r_u, mul, div_zero, r_lt, msb1, msb2,
                        a_abs, d_abs, q_out, r_out, s_q, nz_q, nz_r)


def assign_div_rem(config: DivRemConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    cycles = _u64([s.cycle for s in steps])
    a = _u64([s.rs1.value for s in steps])
    d = _u64([s.rs2.value for s in steps])
    config.state.assign(wm, pcs, cycles)
    config.rs1_u.assign(wm, lkm, a)
    config.rs2_u.assign(wm, lkm, d)

    signed = config.kind in (K.DIV, K.REM)
    if signed:
        config.msb1.assign(wm, lkm, value_limbs(a)[1])
        config.msb2.assign(wm, lkm, value_limbs(d)[1])
        num = np.abs(_signed32(a)).astype(np.uint64)
        den = np.abs(_signed32(d)).astype(np.uint64)
        config.a_abs.assign(wm, lkm, num)
        config.d_abs.assign(wm, lkm, den)
    else:
        num, den = a, d

    q = np.where(den != 0, num // np.maximum(den, 1), np.uint64(M32))
    r = np.where(den != 0, num % np.maximum(den, 1), num)
    if signed:
        # divide-by-zero: the signed quotient must be -1; pick the magnitude
        # that reconstructs to -1 under the sign rule (q*0 stays 0 either way)
        msb_a = (a >> np.uint64(31)).astype(bool)
        q = np.where(den == 0, np.where(msb_a, np.uint64(1), np.uint64(M32)), q)
    config.q_u.assign(wm, lkm, q)
    config.r_u.assign(wm, lkm, r)
    config.mul.assign(wm, lkm, q, den)
    config.div_zero.assign(wm, den)
    config.r_lt.assign(wm, lkm, r.astype(np.int64), den.astype(np.int64))

    if signed:
        msb_a = (a >> np.uint64(31)).astype(bool)
        msb_d = (d >> np.uint64(31)).astype(bool)
        s_q = msb_a ^ msb_d
        wm.set(config.s_q, s_q.astype(np.uint64))
        q_out = np.where(s_q, (-q.astype(np.int64)) & np.int64(M32), q.astype(np.int64)).astype(np.uint64)
        q_out = np.where(den == 0, np.uint64(M32), q_out)
        r_out = np.where(msb_a, (-r.astype(np.int64)) & np.int64(M32), r.astype(np.int64)).astype(np.uint64)
        wm.set(config.nz_q, ((s_q) & (q != 0)).astype(np.uint64))
        wm.set(config.nz_r, ((msb_a) & (r != 0)).astype(np.uint64))
        config.q_out.assign(wm, lkm, q_out)
        config.r_out.assign(wm, lkm, r_out)

    _rs1_assign(config.rs1, wm, lkm, steps, cycles)
    _rs2_assign(config.rs2, wm, lkm, steps, cycles)
    _rd_assign(config.rd, wm, lkm, steps, cycles)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm


# ---------------------------------------------------------------------------
# ECALL-HALT (ecall/halt.rs)
# ---------------------------------------------------------------------------


@dataclass
class HaltConfig:
    cs: ConstraintSystem
    state: StateInOut
    prev_x5_ts: WitIn
    prev_x10_ts: WitIn
    exit_lo: WitIn
    exit_hi: WitIn
    lt5: AssertLtConfig
    lt10: AssertLtConfig


def construct_halt() -> HaltConfig:
    from ..vm import PV_EXIT_CODE_HI, PV_EXIT_CODE_LO

    cs = ConstraintSystem("ECALL_HALT")
    state = StateInOut.construct(cs, branching=True)
    cs.require_zero(state.next_pc + Constant(0), "halt_next_pc_zero")
    # x5 read: value must equal ECALL_HALT (= 0)
    code_lo = Constant(Platform.ECALL_HALT & 0xFFFF)
    code_hi = Constant((Platform.ECALL_HALT >> 16) & 0xFFFF)
    prev5 = cs.create_witin("prev_x5_ts")
    lt5 = register_read(cs, Constant(Platform.REG_ECALL), prev5,
                        state.ts + SUBCYCLE_RS1, [code_lo, code_hi])
    # x10 read: value bound to the exit_code public instance
    exit_lo = cs.create_witin("exit_lo")
    exit_hi = cs.create_witin("exit_hi")
    cs.require_zero(exit_lo - cs.query_instance(PV_EXIT_CODE_LO), "exit_lo_pi")
    cs.require_zero(exit_hi - cs.query_instance(PV_EXIT_CODE_HI), "exit_hi_pi")
    prev10 = cs.create_witin("prev_x10_ts")
    lt10 = register_read(cs, Constant(Platform.REG_ARG0), prev10,
                         state.ts + SUBCYCLE_RS2, [exit_lo + Constant(0), exit_hi + Constant(0)])
    # ECALL encodes rs1 = rs2 = rd = 0 (rd_internal -> RD_NULL = 32)
    lk_fetch(cs, state.pc, K.ECALL, Constant(32), Constant(0), Constant(0),
             Constant(0))
    return HaltConfig(cs, state, prev5, prev10, exit_lo, exit_hi, lt5, lt10)


def assign_halt(config: HaltConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    assert n <= 1, "at most one HALT per execution"
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    next_pcs = _u64([s.pc.after for s in steps])
    cycles = _u64([s.cycle for s in steps])
    config.state.assign(wm, pcs, cycles, next_pcs)
    exit_codes = _u64([s.rs2.value for s in steps])
    wm.set(config.exit_lo, exit_codes & np.uint64(0xFFFF))
    wm.set(config.exit_hi, exit_codes >> np.uint64(16))
    prev5 = _u64([s.rs1.previous_cycle for s in steps])
    prev10 = _u64([s.rs2.previous_cycle for s in steps])
    wm.set(config.prev_x5_ts, prev5)
    wm.set(config.prev_x10_ts, prev10)
    config.lt5.assign(wm, lkm, prev5, cycles + SUBCYCLE_RS1)
    config.lt10.assign(wm, lkm, prev10, cycles + SUBCYCLE_RS2)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm
