"""R-type arithmetic circuits: ADD, SUB.

Mirrors /root/reference/ceno_zkvm/src/instructions/riscv/arith.rs: rs1/rs2
register values as unchecked 16-bit limb pairs; rd = rs1 +/- rs2 with a bit
carry per limb (uint/arithmetic.rs:18-95), rd limbs kept as expressions and
range-checked via U16 lookups; R-format plumbing via insn_base.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ...emul.insn import InsnKind
from ..circuit_builder import ConstraintSystem, ROMType
from ..expression import Constant, WitIn
from ..witness import LkMultiplicity, WitnessMatrix
from .gadgets import UINT_LIMBS
from .insn_base import (
    SUBCYCLE_RS1,
    SUBCYCLE_RS2,
    ReadReg,
    StateInOut,
    WriteRD,
    lk_fetch,
    value_limbs,
)


@dataclass
class AddSubConfig:
    cs: ConstraintSystem
    state: StateInOut
    rs1: ReadReg
    rs2: ReadReg
    rd: WriteRD
    rs1_limbs: List[WitIn]
    rs2_limbs: List[WitIn]
    carries: List[WitIn]
    is_add: bool


def construct_add_sub(kind: int, name: str) -> AddSubConfig:
    assert kind in (InsnKind.ADD, InsnKind.SUB)
    is_add = kind == InsnKind.ADD
    cs = ConstraintSystem(name)
    state = StateInOut.construct(cs)
    rs1_limbs = [cs.create_witin(f"rs1_l{i}") for i in range(UINT_LIMBS)]
    rs2_limbs = [cs.create_witin(f"rs2_l{i}") for i in range(UINT_LIMBS)]
    carries = [cs.create_witin(f"carry_{i}") for i in range(UINT_LIMBS)]
    for c in carries:
        cs.require_zero(c * c - c, "carry_bit")

    # rd limbs as expressions (uint/arithmetic.rs:18-95):
    # add: rd_i = rs1_i + rs2_i + carry_{i-1} - carry_i * 2^16
    # sub: rd   = rs1 - rs2  <=>  rs1_i = rd_i + rs2_i ... equivalently
    #      rd_i = rs1_i - rs2_i + borrow_i * 2^16 - borrow_{i-1}
    rd_exprs = []
    for i in range(UINT_LIMBS):
        prev = carries[i - 1] if i > 0 else None
        if is_add:
            e = rs1_limbs[i] + rs2_limbs[i] - carries[i] * Constant(1 << 16)
            if prev is not None:
                e = e + prev
        else:
            e = rs1_limbs[i] - rs2_limbs[i] + carries[i] * Constant(1 << 16)
            if prev is not None:
                e = e - prev
        rd_exprs.append(e)
        cs.lk_record(ROMType.U16, [e])  # range check result limb

    rs1 = ReadReg.construct(cs, list(rs1_limbs), state.ts, SUBCYCLE_RS1)
    rs2 = ReadReg.construct(cs, list(rs2_limbs), state.ts, SUBCYCLE_RS2)
    rd = WriteRD.construct(cs, rd_exprs, state.ts)
    lk_fetch(cs, state.pc, kind, rd.id, rs1.id, rs2.id, Constant(0))
    return AddSubConfig(cs, state, rs1, rs2, rd, rs1_limbs, rs2_limbs, carries, is_add)


def assign_add_sub(
    config: AddSubConfig, steps, lkm: LkMultiplicity
) -> WitnessMatrix:
    """Vectorized assignment from StepRecords (struct-of-arrays extract)."""
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    u64 = lambda xs: np.asarray(xs, dtype=np.uint64)

    pcs = u64([s.pc.before for s in steps])
    cycles = u64([s.cycle for s in steps])
    rs1_v = u64([s.rs1.value for s in steps])
    rs2_v = u64([s.rs2.value for s in steps])
    rd_prev = u64([s.rd.value.before for s in steps])
    rd_new = u64([s.rd.value.after for s in steps])

    config.state.assign(wm, pcs, cycles)
    r1l = value_limbs(rs1_v)
    r2l = value_limbs(rs2_v)
    for i in range(UINT_LIMBS):
        wm.set(config.rs1_limbs[i], r1l[i])
        wm.set(config.rs2_limbs[i], r2l[i])

    if config.is_add:
        c0 = (r1l[0] + r2l[0]) >> np.uint64(16)
        c1 = (r1l[1] + r2l[1] + c0) >> np.uint64(16)
    else:
        # borrow bits: rd = rs1 - rs2
        b0 = (r1l[0] < r2l[0]).astype(np.uint64)
        b1 = ((r1l[1].astype(np.int64) - r2l[1].astype(np.int64) - b0.astype(np.int64)) < 0).astype(np.uint64)
        c0, c1 = b0, b1
    wm.set(config.carries[0], c0)
    wm.set(config.carries[1], c1)

    rdl = value_limbs(rd_new)
    lkm.assert_ux(16, rdl[0])
    lkm.assert_ux(16, rdl[1])

    config.rs1.assign(wm, lkm, u64([(s.rs1.addr << 2) >> 8 for s in steps]),
                      u64([s.rs1.previous_cycle for s in steps]), cycles)
    config.rs2.assign(wm, lkm, u64([(s.rs2.addr << 2) >> 8 for s in steps]),
                      u64([s.rs2.previous_cycle for s in steps]), cycles)
    config.rd.assign(wm, lkm, u64([(s.rd.addr << 2) >> 8 for s in steps]),
                     u64([s.rd.previous_cycle for s in steps]), cycles, rd_prev)

    # fetch lookups: the program table's multiplicity is keyed by pc
    from ..circuit_builder import ROMType as RT
    lkm.increment_many(RT.Instruction, pcs)
    return wm


def config_kind(config: AddSubConfig) -> int:
    return InsnKind.ADD if config.is_add else InsnKind.SUB
