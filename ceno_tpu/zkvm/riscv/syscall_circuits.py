"""Syscall circuits: KECCAK_PERMUTE as a LargeEcallDummy.

Mirrors /root/reference/ceno_zkvm/src/instructions/riscv/dummy/dummy_ecall.rs:
the circuit applies the recorded syscall effects — x5 must equal the
KECCAK_PERMUTE code, x10 (the state pointer, 4-aligned) is read, and the 50
state words are written with their recorded before/after values — WITHOUT
constraining keccak-f itself (the reference's keccak ecall is likewise a
dummy at the pinned commit; a real keccak circuit is future work there too).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ...emul.insn import InsnKind
from ...emul.platform import Platform
from ...emul.syscalls import KECCAK_PERMUTE, KECCAK_WORDS
from ..circuit_builder import ConstraintSystem, RAMType, ROMType
from ..expression import Constant, WitIn
from ..witness import LkMultiplicity, WitnessMatrix
from .gadgets import UINT_LIMBS, AssertLtConfig
from .insn_base import SUBCYCLE_RS1, StateInOut, lk_fetch, register_read
from .insns import _u64

K = InsnKind
SUBCYCLE_MEM = 3

# pseudo-kind for bucketing ECALL steps that carry a syscall witness
KECCAK_PSEUDO_KIND = 0x1000 + KECCAK_PERMUTE


@dataclass
class KeccakDummyConfig:
    cs: ConstraintSystem
    state: StateInOut
    prev_x5_ts: WitIn
    lt5: AssertLtConfig
    ptr_limbs: List[WitIn]  # x10 value (q, hi) with ptr = 4*q + hi*2^16... see below
    ptr_q: WitIn
    ptr_hi: WitIn
    prev_x10_ts: WitIn
    lt10: AssertLtConfig
    prev_vals: List[List[WitIn]]  # 50 x 2 limbs
    new_vals: List[List[WitIn]]
    prev_ts: List[WitIn]
    lts: List[AssertLtConfig]


def construct_keccak_dummy() -> KeccakDummyConfig:
    cs = ConstraintSystem("ECALL_KECCAK")
    state = StateInOut.construct(cs)
    # x5 read: value must equal KECCAK_PERMUTE
    code_lo = Constant(KECCAK_PERMUTE & 0xFFFF)
    code_hi = Constant((KECCAK_PERMUTE >> 16) & 0xFFFF)
    prev5 = cs.create_witin("prev_x5_ts")
    lt5 = register_read(cs, Constant(Platform.REG_ECALL), prev5,
                        state.ts + SUBCYCLE_RS1, [code_lo, code_hi])
    # x10 read at the syscall subcycle: ptr = 4*q + hi*2^16, q < 2^14
    ptr_q = cs.create_witin("ptr_q")
    ptr_hi = cs.create_witin("ptr_hi")
    cs.lk_record(ROMType.U16, [ptr_q * Constant(4)])
    cs.lk_record(ROMType.U16, [ptr_hi])
    prev10 = cs.create_witin("prev_x10_ts")
    lt10 = register_read(cs, Constant(Platform.REG_ARG0), prev10,
                         state.ts + SUBCYCLE_MEM,
                         [ptr_q * Constant(4), ptr_hi + Constant(0)])
    base_waddr = ptr_q + ptr_hi * Constant(1 << 14)

    prev_vals, new_vals, prev_ts, lts = [], [], [], []
    for i in range(KECCAK_WORDS):
        pv = [cs.create_witin(f"prev_{i}_{j}") for j in range(2)]
        nv = [cs.create_witin(f"new_{i}_{j}") for j in range(2)]
        pts = cs.create_witin(f"prev_ts_{i}")
        waddr = base_waddr + Constant(i)
        cs.read_record([Constant(RAMType.Memory), waddr,
                        pv[0] + Constant(0), pv[1] + Constant(0), pts])
        cs.write_record([Constant(RAMType.Memory), waddr,
                         nv[0] + Constant(0), nv[1] + Constant(0),
                         state.ts + SUBCYCLE_MEM])
        lts.append(AssertLtConfig.construct(cs, pts, state.ts + SUBCYCLE_MEM,
                                            UINT_LIMBS))
        prev_vals.append(pv)
        new_vals.append(nv)
        prev_ts.append(pts)

    # ECALL encodes rs1 = rs2 = rd = 0 (rd_internal -> RD_NULL = 32)
    lk_fetch(cs, state.pc, K.ECALL, Constant(32), Constant(0), Constant(0),
             Constant(0))
    return KeccakDummyConfig(cs, state, prev5, lt5, [], ptr_q, ptr_hi, prev10,
                             lt10, prev_vals, new_vals, prev_ts, lts)


def assign_keccak_dummy(config: KeccakDummyConfig, steps, lkm: LkMultiplicity
                        ) -> WitnessMatrix:
    n = len(steps)
    wm = WitnessMatrix(config.cs.num_witin, n)
    pcs = _u64([s.pc.before for s in steps])
    cycles = _u64([s.cycle for s in steps])
    config.state.assign(wm, pcs, cycles)

    prev5 = _u64([s.rs1.previous_cycle for s in steps])
    wm.set(config.prev_x5_ts, prev5)
    config.lt5.assign(wm, lkm, prev5, cycles + SUBCYCLE_RS1)

    regop = [s.syscall.reg_ops[0] for s in steps]
    ptr = _u64([op.value.after for op in regop])
    q = (ptr & np.uint64(0xFFFF)) >> np.uint64(2)
    hi = ptr >> np.uint64(16)
    wm.set(config.ptr_q, q)
    wm.set(config.ptr_hi, hi)
    lkm.assert_ux(16, q * np.uint64(4))
    lkm.assert_ux(16, hi)
    prev10 = _u64([op.previous_cycle for op in regop])
    wm.set(config.prev_x10_ts, prev10)
    config.lt10.assign(wm, lkm, prev10, cycles + SUBCYCLE_MEM)

    for i in range(KECCAK_WORDS):
        ops = [s.syscall.mem_ops[i] for s in steps]
        before = _u64([op.value.before for op in ops])
        after = _u64([op.value.after for op in ops])
        pts = _u64([op.previous_cycle for op in ops])
        for j, v in enumerate((before & np.uint64(0xFFFF), before >> np.uint64(16))):
            wm.set(config.prev_vals[i][j], v)
        for j, v in enumerate((after & np.uint64(0xFFFF), after >> np.uint64(16))):
            wm.set(config.new_vals[i][j], v)
        wm.set(config.prev_ts[i], pts)
        config.lts[i].assign(wm, lkm, pts, cycles + SUBCYCLE_MEM)

    lkm.increment_many(ROMType.Instruction, pcs)
    return wm
