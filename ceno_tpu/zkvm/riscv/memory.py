"""Load/store opcode circuits: LW/LH/LHU/LB/LBU and SW/SH/SB.

Mirrors /root/reference/ceno_zkvm/src/instructions/riscv/memory/{load,store}.rs
with the MemAddr alignment gadget (memory/gadget.rs):

* address: rs1 + imm (signed, S/I-format) decomposed as
  ``addr = low + 4*waddr`` with low bits b0/b1 (b1 only for half ops, both
  free for byte ops, both zero for word ops), waddr < 2^30 via
  U16(w0) + U16(4*w1) lookups, and a +/-2^32 wrap like JALR;
* memory access: read = r_record(prev_ts) + w_record(ts+3) with the same
  word value; write = r_record(prev word) + w_record(new word); record addr
  unit is the word address, matching StaticMemTable/DynMemTable;
* sub-word extraction/insertion via byte witnesses range-checked in the U8
  ROM; sign extension via MsbConfig-style top-bit decomposition.

Record expressions stay linear (write values are witnesses with separate
degree-2 binding constraints), as required by the RLC record builder
(circuit_builder.rs record degree rule).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ...emul.insn import InsnKind
from ..circuit_builder import ConstraintSystem, RAMType, ROMType
from ..expression import Constant, Expr, WitIn
from ..witness import LkMultiplicity, WitnessMatrix, signed_to_field
from .gadgets import UINT_LIMBS, AssertLtConfig
from .insn_base import (
    SUBCYCLE_RS1,
    SUBCYCLE_RS2,
    ReadReg,
    StateInOut,
    WriteRD,
    lk_fetch,
    value_limbs,
)
from .insns import _u64

K = InsnKind
M32 = 0xFFFFFFFF
SUBCYCLE_MEM = 3

LOADS = (K.LW, K.LH, K.LHU, K.LB, K.LBU)
STORES = (K.SW, K.SH, K.SB)


def _val(limbs: List[Expr]) -> Expr:
    return limbs[0] + limbs[1] * Constant(1 << 16)


@dataclass
class MemAddrConfig:
    """addr = b0 + 2*b1 + 4*(w0 + w1*2^16); word/half ops pin b0 (and b1)."""

    w0: WitIn
    w1: WitIn
    b0: Optional[WitIn]  # None => constrained 0 (half/word ops)
    b1: Optional[WitIn]  # None => constrained 0 (word ops)
    kp: WitIn
    kn: WitIn

    @staticmethod
    def construct(cs: ConstraintSystem, rs1_val: Expr, imm: Expr, align: int
                  ) -> "MemAddrConfig":
        """align: 4 = word, 2 = half, 1 = byte."""
        w0 = cs.create_witin("mem_w0")
        w1 = cs.create_witin("mem_w1")
        cs.lk_record(ROMType.U16, [w0])
        cs.lk_record(ROMType.U16, [w1 * Constant(4)])  # w1 < 2^14
        b0 = b1 = None
        low: Expr = Constant(0)
        if align <= 1:
            b0 = cs.create_witin("mem_b0")
            cs.require_zero(b0 * b0 - b0, "b0_bit")
            low = low + b0
        if align <= 2:
            b1 = cs.create_witin("mem_b1")
            cs.require_zero(b1 * b1 - b1, "b1_bit")
            low = low + b1 * Constant(2)
        kp = cs.create_witin("mem_wrap_p")
        kn = cs.create_witin("mem_wrap_n")
        cs.require_zero(kp * kp - kp, "wrap_p_bit")
        cs.require_zero(kn * kn - kn, "wrap_n_bit")
        cs.require_zero(kp * kn, "wrap_excl")
        addr_val = low + (w0 + w1 * Constant(1 << 16)) * Constant(4)
        cs.require_zero(
            rs1_val + imm - addr_val - (kp - kn) * Constant(1 << 32), "mem_addr"
        )
        return MemAddrConfig(w0, w1, b0, b1, kp, kn)

    @property
    def waddr(self) -> Expr:
        return self.w0 + self.w1 * Constant(1 << 16)

    def assign(self, wm, lkm, rs1_v: np.ndarray, simm: np.ndarray) -> np.ndarray:
        """Returns the byte addresses."""
        full = rs1_v.astype(np.int64) + simm
        addr = (full & np.int64(M32)).astype(np.uint64)
        waddr = addr >> np.uint64(2)
        w0 = waddr & np.uint64(0xFFFF)
        w1 = waddr >> np.uint64(16)
        wm.set(self.w0, w0)
        wm.set(self.w1, w1)
        lkm.assert_ux(16, w0)
        lkm.assert_ux(16, w1 * np.uint64(4))
        if self.b0 is not None:
            wm.set(self.b0, addr & np.uint64(1))
        if self.b1 is not None:
            wm.set(self.b1, (addr >> np.uint64(1)) & np.uint64(1))
        k = (full - addr.astype(np.int64)) >> np.int64(32)
        wm.set(self.kp, (k > 0).astype(np.uint64))
        wm.set(self.kn, (k < 0).astype(np.uint64))
        return addr


def _mem_read(cs, waddr: Expr, value: List[Expr], prev_ts: WitIn, ts: WitIn):
    """read = r_record(prev_ts) + w_record(ts+3), same value."""
    rec_r = [Constant(RAMType.Memory), waddr] + value + [prev_ts]
    rec_w = [Constant(RAMType.Memory), waddr] + value + [ts + SUBCYCLE_MEM]
    cs.read_record(rec_r)
    cs.write_record(rec_w)
    return AssertLtConfig.construct(cs, prev_ts, ts + SUBCYCLE_MEM, UINT_LIMBS)


def _mem_write(cs, waddr: Expr, prev_value: List[Expr], value: List[Expr],
               prev_ts: WitIn, ts: WitIn):
    rec_r = [Constant(RAMType.Memory), waddr] + prev_value + [prev_ts]
    rec_w = [Constant(RAMType.Memory), waddr] + value + [ts + SUBCYCLE_MEM]
    cs.read_record(rec_r)
    cs.write_record(rec_w)
    return AssertLtConfig.construct(cs, prev_ts, ts + SUBCYCLE_MEM, UINT_LIMBS)


# ---------------------------------------------------------------------------
# Loads
# ---------------------------------------------------------------------------


@dataclass
class LoadConfig:
    cs: ConstraintSystem
    kind: int
    state: StateInOut
    rs1: ReadReg
    rd: WriteRD
    rs1_limbs: List[WitIn]
    imm: WitIn
    maddr: MemAddrConfig
    mem_v: List[WitIn]
    mem_prev_ts: WitIn
    mem_lt: AssertLtConfig
    half: Optional[WitIn]  # selected half (LH/LHU/LB/LBU)
    lo8: Optional[WitIn]
    hi8: Optional[WitIn]
    byte: Optional[WitIn]  # selected byte (LB/LBU)
    sign: Optional[WitIn]  # top bit (LH/LB)
    sign_rem: Optional[WitIn]


def construct_load(kind: int) -> LoadConfig:
    assert kind in LOADS
    cs = ConstraintSystem(InsnKind.NAMES[kind])
    state = StateInOut.construct(cs)
    rs1_limbs = [cs.create_witin(f"rs1_l{i}") for i in range(UINT_LIMBS)]
    imm = cs.create_witin("imm")
    align = 4 if kind == K.LW else (2 if kind in (K.LH, K.LHU) else 1)
    maddr = MemAddrConfig.construct(cs, _val(rs1_limbs), imm, align)
    mem_v = [cs.create_witin(f"mem_v{i}") for i in range(2)]
    mem_prev_ts = cs.create_witin("mem_prev_ts")
    mem_lt = _mem_read(cs, maddr.waddr, [mem_v[0] + Constant(0), mem_v[1] + Constant(0)],
                       mem_prev_ts, state.ts)

    half = lo8 = hi8 = byte = sign = sign_rem = None
    if kind == K.LW:
        rd_exprs = [mem_v[0] + Constant(0), mem_v[1] + Constant(0)]
    else:
        half = cs.create_witin("half")
        b1 = maddr.b1
        cs.require_zero(
            half - (mem_v[0] + b1 * (mem_v[1] - mem_v[0])), "half_select"
        )
        if kind in (K.LH, K.LHU):
            if kind == K.LH:
                sign = cs.create_witin("sign")
                sign_rem = cs.create_witin("sign_rem")
                cs.require_zero(sign * sign - sign, "sign_bit")
                cs.lk_record(ROMType.U16, [sign_rem * Constant(2)])
                cs.require_zero(half - sign * Constant(1 << 15) - sign_rem, "sign_decomp")
                rd_exprs = [half + Constant(0), sign * Constant(0xFFFF)]
            else:
                cs.lk_record(ROMType.U16, [half])
                rd_exprs = [half + Constant(0), Constant(0)]
        else:
            lo8 = cs.create_witin("lo8")
            hi8 = cs.create_witin("hi8")
            cs.lk_record(ROMType.U8, [lo8])
            cs.lk_record(ROMType.U8, [hi8])
            cs.require_zero(half - lo8 - hi8 * Constant(256), "half_bytes")
            byte = cs.create_witin("byte")
            cs.require_zero(byte - (lo8 + maddr.b0 * (hi8 - lo8)), "byte_select")
            if kind == K.LB:
                sign = cs.create_witin("sign")
                sign_rem = cs.create_witin("sign_rem")
                cs.require_zero(sign * sign - sign, "sign_bit")
                cs.lk_record(ROMType.U8, [sign_rem * Constant(2)])
                cs.require_zero(byte - sign * Constant(128) - sign_rem, "sign_decomp")
                rd_exprs = [byte + sign * Constant(0xFF00), sign * Constant(0xFFFF)]
            else:
                rd_exprs = [byte + Constant(0), Constant(0)]

    rs1 = ReadReg.construct(cs, list(rs1_limbs), state.ts, SUBCYCLE_RS1)
    rd = WriteRD.construct(cs, rd_exprs, state.ts)
    lk_fetch(cs, state.pc, kind, rd.id, rs1.id, Constant(0), imm)
    return LoadConfig(cs, kind, state, rs1, rd, rs1_limbs, imm, maddr, mem_v,
                      mem_prev_ts, mem_lt, half, lo8, hi8, byte, sign, sign_rem)


def assign_load(config: LoadConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    cycles = _u64([s.cycle for s in steps])
    rs1_v = _u64([s.rs1.value for s in steps])
    simm = np.asarray([s.insn.imm for s in steps], dtype=np.int64)
    config.state.assign(wm, pcs, cycles)
    for i, l in enumerate(value_limbs(rs1_v)):
        wm.set(config.rs1_limbs[i], l)
    wm.set(config.imm, signed_to_field([s.insn.imm for s in steps]))
    addr = config.maddr.assign(wm, lkm, rs1_v, simm)

    words = _u64([s.memory_op.value.after for s in steps])
    wl = value_limbs(words)
    wm.set(config.mem_v[0], wl[0])
    wm.set(config.mem_v[1], wl[1])
    prev_ts = _u64([s.memory_op.previous_cycle for s in steps])
    wm.set(config.mem_prev_ts, prev_ts)
    config.mem_lt.assign(wm, lkm, prev_ts, cycles + SUBCYCLE_MEM)

    if config.half is not None:
        b1 = (addr >> np.uint64(1)) & np.uint64(1)
        half = np.where(b1 == 1, wl[1], wl[0])
        wm.set(config.half, half)
        if config.kind == K.LHU:
            lkm.assert_ux(16, half)
        if config.lo8 is not None:
            lo8, hi8 = half & np.uint64(0xFF), half >> np.uint64(8)
            wm.set(config.lo8, lo8)
            wm.set(config.hi8, hi8)
            lkm.assert_ux(8, lo8)
            lkm.assert_ux(8, hi8)
            b0 = addr & np.uint64(1)
            byte = np.where(b0 == 1, hi8, lo8)
            wm.set(config.byte, byte)
            if config.kind == K.LB:
                sign = byte >> np.uint64(7)
                rem = byte & np.uint64(0x7F)
                wm.set(config.sign, sign)
                wm.set(config.sign_rem, rem)
                lkm.assert_ux(8, rem * np.uint64(2))
        elif config.kind == K.LH:
            sign = half >> np.uint64(15)
            rem = half & np.uint64(0x7FFF)
            wm.set(config.sign, sign)
            wm.set(config.sign_rem, rem)
            lkm.assert_ux(16, rem * np.uint64(2))

    config.rs1.assign(wm, lkm, _u64([(s.rs1.addr << 2) >> 8 for s in steps]),
                      _u64([s.rs1.previous_cycle for s in steps]), cycles)
    config.rd.assign(wm, lkm, _u64([(s.rd.addr << 2) >> 8 for s in steps]),
                     _u64([s.rd.previous_cycle for s in steps]), cycles,
                     _u64([s.rd.value.before for s in steps]))
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm


# ---------------------------------------------------------------------------
# Stores
# ---------------------------------------------------------------------------


@dataclass
class StoreConfig:
    cs: ConstraintSystem
    kind: int
    state: StateInOut
    rs1: ReadReg
    rs2: ReadReg
    rs1_limbs: List[WitIn]
    rs2_limbs: List[WitIn]
    imm: WitIn
    maddr: MemAddrConfig
    prev_v: List[WitIn]
    new_v: List[WitIn]  # SW: aliases rs2 limbs via constraints
    mem_prev_ts: WitIn
    mem_lt: AssertLtConfig
    # SB pieces
    half_prev: Optional[WitIn] = None
    pl8: Optional[WitIn] = None
    ph8: Optional[WitIn] = None
    sb: Optional[WitIn] = None
    sb_hi: Optional[WitIn] = None
    new_half: Optional[WitIn] = None


def construct_store(kind: int) -> StoreConfig:
    assert kind in STORES
    cs = ConstraintSystem(InsnKind.NAMES[kind])
    state = StateInOut.construct(cs)
    rs1_limbs = [cs.create_witin(f"rs1_l{i}") for i in range(UINT_LIMBS)]
    rs2_limbs = [cs.create_witin(f"rs2_l{i}") for i in range(UINT_LIMBS)]
    imm = cs.create_witin("imm")
    align = 4 if kind == K.SW else (2 if kind == K.SH else 1)
    maddr = MemAddrConfig.construct(cs, _val(rs1_limbs), imm, align)
    prev_v = [cs.create_witin(f"prev_v{i}") for i in range(2)]
    new_v = [cs.create_witin(f"new_v{i}") for i in range(2)]

    half_prev = pl8 = ph8 = sb = sb_hi = new_half = None
    if kind == K.SW:
        for i in range(2):
            cs.require_zero(new_v[i] - rs2_limbs[i], "sw_value")
    elif kind == K.SH:
        b1 = maddr.b1
        cs.require_zero(
            new_v[0] - (prev_v[0] + (Constant(1) - b1) * (rs2_limbs[0] - prev_v[0])),
            "sh_low",
        )
        cs.require_zero(
            new_v[1] - (prev_v[1] + b1 * (rs2_limbs[0] - prev_v[1])), "sh_high"
        )
    else:  # SB
        b0, b1 = maddr.b0, maddr.b1
        half_prev = cs.create_witin("half_prev")
        cs.require_zero(
            half_prev - (prev_v[0] + b1 * (prev_v[1] - prev_v[0])), "hp_select"
        )
        pl8 = cs.create_witin("pl8")
        ph8 = cs.create_witin("ph8")
        cs.lk_record(ROMType.U8, [pl8])
        cs.lk_record(ROMType.U8, [ph8])
        cs.require_zero(half_prev - pl8 - ph8 * Constant(256), "hp_bytes")
        sb = cs.create_witin("sb")
        sb_hi = cs.create_witin("sb_hi")
        cs.lk_record(ROMType.U8, [sb])
        cs.lk_record(ROMType.U8, [sb_hi])
        cs.require_zero(rs2_limbs[0] - sb - sb_hi * Constant(256), "rs2_bytes")
        new_half = cs.create_witin("new_half")
        # b0=0: replace low byte -> sb + 256*ph8 ; b0=1: pl8 + 256*sb
        cs.require_zero(
            new_half
            - ((Constant(1) - b0) * (sb + ph8 * Constant(256))
               + b0 * (pl8 + sb * Constant(256))),
            "nh_def",
        )
        cs.require_zero(
            new_v[0] - (prev_v[0] + (Constant(1) - b1) * (new_half - prev_v[0])),
            "sb_low",
        )
        cs.require_zero(
            new_v[1] - (prev_v[1] + b1 * (new_half - prev_v[1])), "sb_high"
        )

    mem_prev_ts = cs.create_witin("mem_prev_ts")
    mem_lt = _mem_write(
        cs, maddr.waddr,
        [prev_v[0] + Constant(0), prev_v[1] + Constant(0)],
        [new_v[0] + Constant(0), new_v[1] + Constant(0)],
        mem_prev_ts, state.ts,
    )
    rs1 = ReadReg.construct(cs, list(rs1_limbs), state.ts, SUBCYCLE_RS1)
    rs2 = ReadReg.construct(cs, list(rs2_limbs), state.ts, SUBCYCLE_RS2)
    lk_fetch(cs, state.pc, kind, Constant(32), rs1.id, rs2.id, imm)
    return StoreConfig(cs, kind, state, rs1, rs2, rs1_limbs, rs2_limbs, imm,
                       maddr, prev_v, new_v, mem_prev_ts, mem_lt,
                       half_prev, pl8, ph8, sb, sb_hi, new_half)


def assign_store(config: StoreConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    cycles = _u64([s.cycle for s in steps])
    rs1_v = _u64([s.rs1.value for s in steps])
    rs2_v = _u64([s.rs2.value for s in steps])
    simm = np.asarray([s.insn.imm for s in steps], dtype=np.int64)
    config.state.assign(wm, pcs, cycles)
    for i, l in enumerate(value_limbs(rs1_v)):
        wm.set(config.rs1_limbs[i], l)
    for i, l in enumerate(value_limbs(rs2_v)):
        wm.set(config.rs2_limbs[i], l)
    wm.set(config.imm, signed_to_field([s.insn.imm for s in steps]))
    addr = config.maddr.assign(wm, lkm, rs1_v, simm)

    prev_w = _u64([s.memory_op.value.before for s in steps])
    new_w = _u64([s.memory_op.value.after for s in steps])
    pl, nl = value_limbs(prev_w), value_limbs(new_w)
    for i in range(2):
        wm.set(config.prev_v[i], pl[i])
        wm.set(config.new_v[i], nl[i])
    prev_ts = _u64([s.memory_op.previous_cycle for s in steps])
    wm.set(config.mem_prev_ts, prev_ts)
    config.mem_lt.assign(wm, lkm, prev_ts, cycles + SUBCYCLE_MEM)

    if config.kind == K.SB:
        b1 = (addr >> np.uint64(1)) & np.uint64(1)
        hp = np.where(b1 == 1, pl[1], pl[0])
        wm.set(config.half_prev, hp)
        pl8, ph8 = hp & np.uint64(0xFF), hp >> np.uint64(8)
        wm.set(config.pl8, pl8)
        wm.set(config.ph8, ph8)
        lkm.assert_ux(8, pl8)
        lkm.assert_ux(8, ph8)
        sb = rs2_v & np.uint64(0xFF)
        sb_hi = (rs2_v >> np.uint64(8)) & np.uint64(0xFF)
        wm.set(config.sb, sb)
        wm.set(config.sb_hi, sb_hi)
        lkm.assert_ux(8, sb)
        lkm.assert_ux(8, sb_hi)
        b0 = addr & np.uint64(1)
        nh = np.where(b0 == 1, pl8 + sb * np.uint64(256), sb + ph8 * np.uint64(256))
        wm.set(config.new_half, nh)

    config.rs1.assign(wm, lkm, _u64([(s.rs1.addr << 2) >> 8 for s in steps]),
                      _u64([s.rs1.previous_cycle for s in steps]), cycles)
    config.rs2.assign(wm, lkm, _u64([(s.rs2.addr << 2) >> 8 for s in steps]),
                      _u64([s.rs2.previous_cycle for s in steps]), cycles)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm
