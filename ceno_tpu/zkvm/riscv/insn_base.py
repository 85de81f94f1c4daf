"""Common instruction building blocks.

Mirrors /root/reference/ceno_zkvm/src/instructions/riscv/insn_base.rs:
StateInOut (global-state read/write with pc/ts), ReadRS1/ReadRS2/WriteRD
(register records with timestamp ordering asserts), and the program-fetch
lookup (InsnRecord of 6 fields, tables/program.rs:25-75).

Register values are 2 x 16-bit limbs (constants.rs UInt = 32/16).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..circuit_builder import ConstraintSystem, RAMType, ROMType
from ..expression import Constant, Expr, WitIn
from ..witness import LkMultiplicity, WitnessMatrix
from .gadgets import UINT_LIMBS, AssertLtConfig

PC_STEP_SIZE = 4
SUBCYCLES_PER_INSN = 4
SUBCYCLE_RS1, SUBCYCLE_RS2, SUBCYCLE_RD = 0, 1, 2
RD_NULL = 32


def register_read(
    cs: ConstraintSystem, reg_id: Expr, prev_ts: Expr, ts: Expr, value: List[Expr]
) -> AssertLtConfig:
    """read = r_record(prev_ts) + w_record(ts), same value (register.rs)."""
    rec_r = [Constant(RAMType.Register), reg_id] + value + [prev_ts]
    rec_w = [Constant(RAMType.Register), reg_id] + value + [ts]
    cs.read_record(rec_r)
    cs.write_record(rec_w)
    return AssertLtConfig.construct(cs, prev_ts, ts, UINT_LIMBS)


def register_write(
    cs: ConstraintSystem,
    reg_id: Expr,
    prev_ts: Expr,
    ts: Expr,
    prev_value: List[Expr],
    value: List[Expr],
) -> AssertLtConfig:
    rec_r = [Constant(RAMType.Register), reg_id] + prev_value + [prev_ts]
    rec_w = [Constant(RAMType.Register), reg_id] + value + [ts]
    cs.read_record(rec_r)
    cs.write_record(rec_w)
    return AssertLtConfig.construct(cs, prev_ts, ts, UINT_LIMBS)


@dataclass
class StateInOut:
    pc: WitIn
    ts: WitIn
    next_pc: Optional[WitIn] = None

    @staticmethod
    def construct(cs: ConstraintSystem, branching: bool = False) -> "StateInOut":
        pc = cs.create_witin("pc")
        next_pc = cs.create_witin("next_pc") if branching else None
        ts = cs.create_witin("ts")
        next_pc_expr = next_pc if branching else pc + PC_STEP_SIZE
        # state_in = read, state_out = write (global_state.rs)
        cs.read_record([Constant(RAMType.GlobalState), pc, ts])
        cs.write_record(
            [Constant(RAMType.GlobalState), next_pc_expr, ts + SUBCYCLES_PER_INSN]
        )
        return StateInOut(pc, ts, next_pc)

    def assign(self, wm: WitnessMatrix, pcs: np.ndarray, cycles: np.ndarray,
               next_pcs: Optional[np.ndarray] = None) -> None:
        wm.set(self.pc, pcs)
        wm.set(self.ts, cycles)
        if self.next_pc is not None:
            wm.set(self.next_pc, next_pcs)


@dataclass
class ReadReg:
    """ReadRS1 / ReadRS2 (insn_base.rs:76-250)."""

    id: WitIn
    prev_ts: WitIn
    lt: AssertLtConfig
    subcycle: int

    @staticmethod
    def construct(cs: ConstraintSystem, value: List[Expr], ts: WitIn, subcycle: int) -> "ReadReg":
        rid = cs.create_witin(f"rs_id_{subcycle}")
        prev_ts = cs.create_witin(f"prev_rs_ts_{subcycle}")
        lt = register_read(cs, rid, prev_ts, ts + subcycle, value)
        return ReadReg(rid, prev_ts, lt, subcycle)

    def assign(self, wm, lkm, reg_ids, prev_cycles, cycles) -> None:
        wm.set(self.id, reg_ids)
        wm.set(self.prev_ts, prev_cycles)
        self.lt.assign(wm, lkm, prev_cycles, cycles + self.subcycle)


@dataclass
class WriteRD:
    id: WitIn
    prev_ts: WitIn
    prev_value: List[WitIn]  # 2 limbs
    lt: AssertLtConfig

    @staticmethod
    def construct(cs: ConstraintSystem, value: List[Expr], ts: WitIn) -> "WriteRD":
        rid = cs.create_witin("rd_id")
        prev_ts = cs.create_witin("prev_rd_ts")
        prev_value = [cs.create_witin(f"prev_rd_v{i}") for i in range(UINT_LIMBS)]
        lt = register_write(
            cs, rid, prev_ts, ts + SUBCYCLE_RD, list(prev_value), value
        )
        return WriteRD(rid, prev_ts, prev_value, lt)

    def assign(self, wm, lkm, reg_ids, prev_cycles, cycles, prev_values) -> None:
        wm.set(self.id, reg_ids)
        wm.set(self.prev_ts, prev_cycles)
        pv = np.asarray(prev_values, dtype=np.uint64)
        wm.set(self.prev_value[0], pv & np.uint64(0xFFFF))
        wm.set(self.prev_value[1], pv >> np.uint64(16))
        self.lt.assign(wm, lkm, prev_cycles, cycles + SUBCYCLE_RD)


def lk_fetch(cs: ConstraintSystem, pc: Expr, kind: int, rd: Expr, rs1: Expr,
             rs2: Expr, imm: Expr) -> None:
    """Program-table fetch lookup of the 6-field InsnRecord."""
    cs.lk_record(ROMType.Instruction, [pc, Constant(kind), rd, rs1, rs2, imm])


def value_limbs(v: np.ndarray) -> List[np.ndarray]:
    v = np.asarray(v, dtype=np.uint64)
    return [v & np.uint64(0xFFFF), v >> np.uint64(16)]
