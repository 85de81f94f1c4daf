"""DummyInstruction: generic catch-all circuit applying recorded side effects.

Mirrors /root/reference/ceno_zkvm/src/instructions/riscv/dummy/dummy_circuit.rs:24
(DummyConfig::construct_circuit) and the leftover-records routing of
rv32im.rs:315 (assign_opcode_circuit): the circuit performs the register /
memory reads and writes implied by the instruction format WITHOUT
constraining the op semantics, so any guest step — an opcode without a
dedicated circuit, or an unknown (nop'd) ECALL — still proves with sound
RAM-multiset and fetch bookkeeping.

Deviation from the reference (documented): the reference's ecall dummy
declares rs1+rs2+rd+mem-write; this framework's emulator records a nop'd
unknown syscall as a single rs1 read (the REG_ECALL load), so the ECALL
dummy circuit declares exactly that — the circuit must match the tracer's
subcycle contract or the RAM multiset would not balance.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ...emul.insn import BRANCH, LOAD, STORE, InsnKind, insn_format
from ...emul.platform import Platform
from ..circuit_builder import ConstraintSystem, RAMType, ROMType
from ..expression import Constant, WitIn
from ..witness import LkMultiplicity, WitnessMatrix
from .gadgets import UINT_LIMBS, AssertLtConfig
from .insn_base import (
    RD_NULL,
    SUBCYCLE_RS1,
    SUBCYCLE_RS2,
    ReadReg,
    StateInOut,
    WriteRD,
    lk_fetch,
    register_read,
    value_limbs,
)
from .insns import _u64

K = InsnKind
SUBCYCLE_MEM = 3

# pseudo-kind for bucketing nop'd unknown-syscall ECALL steps
ECALL_DUMMY_PSEUDO_KIND = 0x2000


@dataclass
class DummyConfig:
    cs: ConstraintSystem
    kind: int
    state: StateInOut
    rs1: Optional[ReadReg] = None
    rs1_limbs: Optional[List[WitIn]] = None
    rs2: Optional[ReadReg] = None
    rs2_limbs: Optional[List[WitIn]] = None
    rd: Optional[WriteRD] = None
    rd_limbs: Optional[List[WitIn]] = None
    mem_addr: Optional[WitIn] = None
    mem_prev: Optional[List[WitIn]] = None  # loads: value; stores: before
    mem_new: Optional[List[WitIn]] = None  # stores only
    mem_prev_ts: Optional[WitIn] = None
    mem_lt: Optional[AssertLtConfig] = None
    imm: Optional[WitIn] = None
    # ECALL dummy only: x5 (function code) read
    ecall_limbs: Optional[List[WitIn]] = None
    ecall_prev_ts: Optional[WitIn] = None
    ecall_lt: Optional[AssertLtConfig] = None


def construct_dummy(kind: int) -> DummyConfig:
    """dummy_circuit.rs:33-68 format dispatch, adapted to this tracer."""
    name = f"{InsnKind.NAMES[kind]}_DUMMY"
    cs = ConstraintSystem(name)
    fmt = insn_format(kind)
    branching = kind in BRANCH or kind in (K.JAL, K.JALR)
    state = StateInOut.construct(cs, branching=branching)

    with_rs1 = fmt in ("R", "I", "S", "B") and kind != K.ECALL
    with_rs2 = fmt in ("R", "S", "B")
    with_rd = fmt in ("R", "I", "J") and kind != K.ECALL

    cfg = DummyConfig(cs, kind, state)
    if with_rs1:
        cfg.rs1_limbs = [cs.create_witin(f"rs1_v{i}") for i in range(UINT_LIMBS)]
        cfg.rs1 = ReadReg.construct(
            cs, [l + Constant(0) for l in cfg.rs1_limbs], state.ts, SUBCYCLE_RS1
        )
    if with_rs2:
        cfg.rs2_limbs = [cs.create_witin(f"rs2_v{i}") for i in range(UINT_LIMBS)]
        cfg.rs2 = ReadReg.construct(
            cs, [l + Constant(0) for l in cfg.rs2_limbs], state.ts, SUBCYCLE_RS2
        )
    if with_rd:
        cfg.rd_limbs = [cs.create_witin(f"rd_v{i}") for i in range(UINT_LIMBS)]
        cfg.rd = WriteRD.construct(
            cs, [l + Constant(0) for l in cfg.rd_limbs], state.ts
        )

    if kind in LOAD or kind in STORE:
        cfg.mem_addr = cs.create_witin("mem_waddr")
        cfg.mem_prev = [cs.create_witin(f"mem_pv{i}") for i in range(2)]
        prev = [l + Constant(0) for l in cfg.mem_prev]
        if kind in STORE:
            cfg.mem_new = [cs.create_witin(f"mem_nv{i}") for i in range(2)]
            new = [l + Constant(0) for l in cfg.mem_new]
        else:
            new = prev
        cfg.mem_prev_ts = cs.create_witin("mem_prev_ts")
        cs.read_record(
            [Constant(RAMType.Memory), cfg.mem_addr] + prev + [cfg.mem_prev_ts]
        )
        cs.write_record(
            [Constant(RAMType.Memory), cfg.mem_addr] + new
            + [state.ts + SUBCYCLE_MEM]
        )
        cfg.mem_lt = AssertLtConfig.construct(
            cs, cfg.mem_prev_ts, state.ts + SUBCYCLE_MEM, UINT_LIMBS
        )

    cfg.imm = cs.create_witin("imm")
    rd_id = cfg.rd.id if cfg.rd is not None else Constant(RD_NULL)
    rs1_id = cfg.rs1.id if cfg.rs1 is not None else Constant(0)
    rs2_id = cfg.rs2.id if cfg.rs2 is not None else Constant(0)
    lk_fetch(cs, state.pc, kind, rd_id, rs1_id, rs2_id, cfg.imm)
    return cfg


def assign_dummy(config: DummyConfig, steps, lkm: LkMultiplicity) -> WitnessMatrix:
    from .tables import imm_internal

    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    cycles = _u64([s.cycle for s in steps])
    next_pcs = _u64([s.pc.after for s in steps]) if config.state.next_pc is not None else None
    config.state.assign(wm, pcs, cycles, next_pcs)

    if config.rs1 is not None:
        v = _u64([s.rs1.value for s in steps])
        for w, l in zip(config.rs1_limbs, value_limbs(v)):
            wm.set(w, l)
        config.rs1.assign(wm, lkm, _u64([(s.rs1.addr << 2) >> 8 for s in steps]),
                          _u64([s.rs1.previous_cycle for s in steps]), cycles)
    if config.rs2 is not None:
        v = _u64([s.rs2.value for s in steps])
        for w, l in zip(config.rs2_limbs, value_limbs(v)):
            wm.set(w, l)
        config.rs2.assign(wm, lkm, _u64([(s.rs2.addr << 2) >> 8 for s in steps]),
                          _u64([s.rs2.previous_cycle for s in steps]), cycles)
    if config.rd is not None:
        v = _u64([s.rd.value.after for s in steps])
        for w, l in zip(config.rd_limbs, value_limbs(v)):
            wm.set(w, l)
        config.rd.assign(wm, lkm, _u64([(s.rd.addr << 2) >> 8 for s in steps]),
                         _u64([s.rd.previous_cycle for s in steps]), cycles,
                         _u64([s.rd.value.before for s in steps]))

    if config.mem_addr is not None:
        ops = [s.memory_op for s in steps]
        wm.set(config.mem_addr, _u64([op.addr for op in ops]))
        before = _u64([op.value.before for op in ops])
        for w, l in zip(config.mem_prev, value_limbs(before)):
            wm.set(w, l)
        if config.mem_new is not None:
            after = _u64([op.value.after for op in ops])
            for w, l in zip(config.mem_new, value_limbs(after)):
                wm.set(w, l)
        prev_ts = _u64([op.previous_cycle for op in ops])
        wm.set(config.mem_prev_ts, prev_ts)
        config.mem_lt.assign(wm, lkm, prev_ts, cycles + SUBCYCLE_MEM)

    wm.set(config.imm, _u64([imm_internal(s.insn) for s in steps]))
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm


@dataclass
class EcallDummyConfig:
    cs: ConstraintSystem
    state: StateInOut
    fn_limbs: List[WitIn]
    prev_x5_ts: WitIn
    lt5: AssertLtConfig


def construct_ecall_dummy() -> EcallDummyConfig:
    """Catch-all for nop'd unknown syscalls (dummy_ecall.rs EcallDummy /
    rv32im.rs DummyExtraConfig semantics): the step reads x5 (the function
    code, unconstrained value) and advances pc by 4."""
    cs = ConstraintSystem("ECALL_DUMMY")
    state = StateInOut.construct(cs)
    fn_limbs = [cs.create_witin(f"fn_v{i}") for i in range(UINT_LIMBS)]
    prev5 = cs.create_witin("prev_x5_ts")
    lt5 = register_read(cs, Constant(Platform.REG_ECALL), prev5,
                        state.ts + SUBCYCLE_RS1,
                        [l + Constant(0) for l in fn_limbs])
    lk_fetch(cs, state.pc, K.ECALL, Constant(RD_NULL), Constant(0), Constant(0),
             Constant(0))
    return EcallDummyConfig(cs, state, fn_limbs, prev5, lt5)


def assign_ecall_dummy(config: EcallDummyConfig, steps, lkm: LkMultiplicity
                       ) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    cycles = _u64([s.cycle for s in steps])
    config.state.assign(wm, pcs, cycles)
    fn = _u64([s.rs1.value for s in steps])
    for w, l in zip(config.fn_limbs, value_limbs(fn)):
        wm.set(w, l)
    prev5 = _u64([s.rs1.previous_cycle for s in steps])
    wm.set(config.prev_x5_ts, prev5)
    config.lt5.assign(wm, lkm, prev5, cycles + SUBCYCLE_RS1)
    lkm.increment_many(ROMType.Instruction, pcs)
    return wm
