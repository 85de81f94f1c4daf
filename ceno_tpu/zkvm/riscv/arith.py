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
from ..circuit_builder import ConstraintSystem
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
from .uint import UInt, Value, assign_carries, range_check_result


@dataclass
class AddSubConfig:
    cs: ConstraintSystem
    state: StateInOut
    rs1: ReadReg
    rs2: ReadReg
    rd: WriteRD
    rs1_u: UInt
    rs2_u: UInt
    carries: List[WitIn]
    is_add: bool

    # limb witness views (kept for table/debug compat)
    @property
    def rs1_limbs(self):
        return self.rs1_u.witins

    @property
    def rs2_limbs(self):
        return self.rs2_u.witins


def construct_add_sub(kind: int, name: str) -> AddSubConfig:
    assert kind in (InsnKind.ADD, InsnKind.SUB)
    is_add = kind == InsnKind.ADD
    cs = ConstraintSystem(name)
    state = StateInOut.construct(cs)
    # register reads are range-guaranteed by the register multiset -> unchecked
    # (arith.rs:43 uses UInt::new_unchecked for rs1/rs2)
    rs1_u = UInt.new_unchecked(cs, "rs1")
    rs2_u = UInt.new_unchecked(cs, "rs2")
    # rd = rs1 +/- rs2 via the UInt framework (uint/arithmetic.rs:18-95):
    # carry/borrow bit witnesses, result limbs as range-checked expressions
    if is_add:
        rd_u, carries = rs1_u.add(cs, rs2_u, name="rd")
    else:
        rd_u, carries = rs1_u.sub(cs, rs2_u, name="rd")

    rs1 = ReadReg.construct(cs, rs1_u.expr(), state.ts, SUBCYCLE_RS1)
    rs2 = ReadReg.construct(cs, rs2_u.expr(), state.ts, SUBCYCLE_RS2)
    rd = WriteRD.construct(cs, rd_u.expr(), state.ts)
    lk_fetch(cs, state.pc, kind, rd.id, rs1.id, rs2.id, Constant(0))
    return AddSubConfig(cs, state, rs1, rs2, rd, rs1_u, rs2_u, carries, is_add)


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
    r1l = config.rs1_u.assign(wm, lkm, rs1_v)
    r2l = config.rs2_u.assign(wm, lkm, rs2_v)

    bits = (Value.add_carries(r1l, r2l) if config.is_add
            else Value.sub_borrows(r1l, r2l))
    assign_carries(wm, config.carries, bits)
    range_check_result(lkm, rd_new)

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
