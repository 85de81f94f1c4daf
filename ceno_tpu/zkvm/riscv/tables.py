"""Lookup and RAM table circuits.

Mirrors /root/reference/ceno_zkvm/src/tables/:
* RangeTable (range_impl.rs): fixed content 0..len, witness = multiplicity;
* OpsTable (ops.rs/ops_impl.rs): fixed [a, b, op(a,b)], witness multiplicity;
* ProgramTable (program.rs): fixed 6-field InsnRecord per pc (with the
  imm_internal transform), witness = fetch multiplicity;
* Register table (ram_impl.rs NonVolatileTableConfig, V_LIMBS=2, writable):
  fixed init values + addr, witness final value limbs + final cycle;
  w_table = init @ cycle 0, r_table = final.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ...emul.insn import Instruction, insn_format
from ...emul.platform import Platform
from ..circuit_builder import (
    ConstraintSystem,
    RAMType,
    ROMType,
    SetTableSpec,
)
from ..expression import Constant, Fixed, WitIn
from ..witness import LkMultiplicity, WitnessMatrix, signed_to_field

P = 0xFFFFFFFF00000001


# ---------------------------------------------------------------------------
# Range tables (U5/U8/U14/U16)
# ---------------------------------------------------------------------------


@dataclass
class RangeTable:
    cs: ConstraintSystem
    fixed: Fixed
    mlt: WitIn
    rom_type: int
    table_len: int

    @staticmethod
    def construct(rom_type: int, bits: int) -> "RangeTable":
        name = {5: "U5", 8: "U8", 14: "U14", 16: "U16"}[bits]
        cs = ConstraintSystem(f"RANGE_{name}")
        fixed = cs.create_fixed("range_val")
        mlt = cs.create_witin("mlt")
        table_len = 1 << bits
        cs.lk_table_record(rom_type, table_len, [fixed], mlt)
        return RangeTable(cs, fixed, mlt, rom_type, table_len)

    def fixed_trace(self) -> List[np.ndarray]:
        return [np.arange(self.table_len, dtype=np.uint64)]

    def assign(self, lkm: LkMultiplicity) -> WitnessMatrix:
        wm = WitnessMatrix(self.cs.num_witin, self.table_len)
        mlts = np.zeros(self.table_len, dtype=np.uint64)
        for v, c in lkm.counts.get(self.rom_type, {}).items():
            mlts[v] = c
        wm.set(self.mlt, mlts)
        return wm


# ---------------------------------------------------------------------------
# Ops tables (And/Or/Xor/Ltu/Pow)
# ---------------------------------------------------------------------------

OPS_FNS = {
    ROMType.And: lambda a, b: a & b,
    ROMType.Or: lambda a, b: a | b,
    ROMType.Xor: lambda a, b: a ^ b,
    ROMType.Ltu: lambda a, b: (a < b).astype(np.uint64),
    ROMType.Pow: lambda a, b: (np.uint64(1) << b),  # a fixed to 2
}


@dataclass
class OpsTable:
    cs: ConstraintSystem
    fixed: List[Fixed]
    mlt: WitIn
    rom_type: int
    table_len: int

    @staticmethod
    def construct(rom_type: int) -> "OpsTable":
        name = {ROMType.And: "AND", ROMType.Or: "OR", ROMType.Xor: "XOR",
                ROMType.Ltu: "LTU", ROMType.Pow: "POW"}[rom_type]
        cs = ConstraintSystem(f"OPS_{name}")
        fixed = [cs.create_fixed(n) for n in ("a", "b", "out")]
        mlt = cs.create_witin("mlt")
        table_len = 32 if rom_type == ROMType.Pow else 1 << 16
        cs.lk_table_record(rom_type, table_len, list(fixed), mlt)
        return OpsTable(cs, fixed, mlt, rom_type, table_len)

    def fixed_trace(self) -> List[np.ndarray]:
        if self.rom_type == ROMType.Pow:
            b = np.arange(32, dtype=np.uint64)
            a = np.full(32, 2, dtype=np.uint64)
        else:
            idx = np.arange(1 << 16, dtype=np.uint64)
            a = idx >> np.uint64(8)
            b = idx & np.uint64(0xFF)
        return [a, b, OPS_FNS[self.rom_type](a, b)]

    @staticmethod
    def pack(a: int, b: int) -> int:
        """Multiplicity key: row index (a*256 + b; Pow: exponent)."""
        return a * 256 + b

    def assign(self, lkm: LkMultiplicity) -> WitnessMatrix:
        wm = WitnessMatrix(self.cs.num_witin, self.table_len)
        mlts = np.zeros(self.table_len, dtype=np.uint64)
        for v, c in lkm.counts.get(self.rom_type, {}).items():
            mlts[v] = c
        wm.set(self.mlt, mlts)
        return wm


# ---------------------------------------------------------------------------
# Program table
# ---------------------------------------------------------------------------


def imm_internal(insn: Instruction) -> int:
    """tables/program.rs:54-75 imm transform (field-canonical u64)."""
    from ...emul.insn import InsnKind as K

    if insn.kind in (K.SLLI, K.SRLI, K.SRAI):
        return 1 << (insn.imm & 0x1F)
    fmt = insn_format(insn.kind)
    if fmt == "R" or insn.kind in (K.ADDI, K.SLTIU, K.ANDI, K.XORI, K.ORI):
        return insn.imm & 0xFFFFFFFF
    return insn.imm % P  # signed view


@dataclass
class ProgramTable:
    cs: ConstraintSystem
    record: List[Fixed]  # 6 fields
    mlt: WitIn
    program_size: int

    @staticmethod
    def construct(program_size: int) -> "ProgramTable":
        cs = ConstraintSystem("PROGRAM")
        record = [cs.create_fixed(n) for n in ("pc", "kind", "rd", "rs1", "rs2", "imm")]
        mlt = cs.create_witin("mlt")
        cs.lk_table_record(ROMType.Instruction, program_size, list(record), mlt)
        return ProgramTable(cs, record, mlt, program_size)

    def fixed_trace(self, program) -> List[np.ndarray]:
        """program: emul.Program; pads past the end with mlt-0 rows."""
        n = self.program_size
        pcs = np.zeros(n, dtype=np.uint64)
        kinds = np.zeros(n, dtype=np.uint64)
        rds = np.zeros(n, dtype=np.uint64)
        rs1s = np.zeros(n, dtype=np.uint64)
        rs2s = np.zeros(n, dtype=np.uint64)
        imms = np.zeros(n, dtype=np.uint64)
        base = program.base_address
        for i in range(n):
            pcs[i] = (base + 4 * i) & 0xFFFFFFFF
            if i < len(program.instructions):
                insn = program.instructions[i]
                kinds[i] = insn.kind
                rds[i] = insn.rd_internal()
                rs1s[i] = insn.rs1_or_zero()
                rs2s[i] = insn.rs2_or_zero()
                imms[i] = imm_internal(insn)
        return [pcs, kinds, rds, rs1s, rs2s, imms]

    def assign(self, lkm: LkMultiplicity, program) -> WitnessMatrix:
        wm = WitnessMatrix(self.cs.num_witin, self.program_size)
        mlts = np.zeros(self.program_size, dtype=np.uint64)
        base = program.base_address
        for pc, c in lkm.counts.get(ROMType.Instruction, {}).items():
            mlts[(pc - base) // 4] = c
        wm.set(self.mlt, mlts)
        return wm


# ---------------------------------------------------------------------------
# Register table (NonVolatile, writable, V_LIMBS = 2)
# ---------------------------------------------------------------------------

REG_COUNT_POW2 = 64  # 33 registers padded to a power of two


@dataclass
class RegTable:
    cs: ConstraintSystem
    addr: Fixed
    init_v: List[Fixed]
    final_v: List[WitIn]
    final_cycle: WitIn

    @staticmethod
    def construct() -> "RegTable":
        cs = ConstraintSystem("REG_TABLE")
        init_v = [cs.create_fixed(f"init_v{i}") for i in range(2)]
        addr = cs.create_fixed("addr")
        final_cycle = cs.create_witin("final_cycle")
        final_v = [cs.create_witin(f"final_v{i}") for i in range(2)]
        spec = SetTableSpec(len=REG_COUNT_POW2)
        init_rec = [Constant(RAMType.Register), addr] + list(init_v) + [Constant(0)]
        final_rec = [Constant(RAMType.Register), addr] + list(final_v) + [final_cycle]
        cs.w_table_record(init_rec, spec)
        cs.r_table_record(final_rec, spec)
        return RegTable(cs, addr, init_v, final_v, final_cycle)

    def fixed_trace(self, init_values: Optional[np.ndarray] = None) -> List[np.ndarray]:
        n = REG_COUNT_POW2
        init = np.zeros(n, dtype=np.uint64) if init_values is None else np.asarray(
            init_values, dtype=np.uint64
        )
        addr = np.arange(n, dtype=np.uint64)  # register index as address
        return [init & np.uint64(0xFFFF), init >> np.uint64(16), addr]

    def assign(
        self, final_values: np.ndarray, final_cycles: np.ndarray
    ) -> WitnessMatrix:
        wm = WitnessMatrix(self.cs.num_witin, REG_COUNT_POW2)
        fv = np.asarray(final_values, dtype=np.uint64)
        wm.set(self.final_cycle, np.asarray(final_cycles, dtype=np.uint64))
        wm.set(self.final_v[0], fv & np.uint64(0xFFFF))
        wm.set(self.final_v[1], fv >> np.uint64(16))
        return wm


def global_state_exprs(cs_reg: ConstraintSystem):
    """(initial, finalize) global-state expressions over public instances
    (state.rs:10-45); registered on the vk."""
    from ..circuit_builder import rlc_chip_record
    from ..expression import Instance
    from ..vm import PV_END_CYCLE, PV_END_PC, PV_INIT_CYCLE, PV_INIT_PC

    init = rlc_chip_record(
        [Constant(RAMType.GlobalState), Instance(PV_INIT_PC), Instance(PV_INIT_CYCLE)]
    )
    fin = rlc_chip_record(
        [Constant(RAMType.GlobalState), Instance(PV_END_PC), Instance(PV_END_CYCLE)]
    )
    return init, fin


# ---------------------------------------------------------------------------
# Memory tables (ram_impl.rs NonVolatileTableConfig / DynVolatileRamTableConfig)
# ---------------------------------------------------------------------------


@dataclass
class StaticMemTable:
    """Non-volatile RAM table over a fixed word-address list (program data):
    fixed addr + init value limbs; witness final value limbs + final cycle.
    Record addr unit is the word address (WordAddr), matching the load/store
    circuits (ram_impl.rs:28-100)."""

    cs: ConstraintSystem
    addr: Fixed
    init_v: List[Fixed]
    final_v: List[WitIn]
    final_cycle: WitIn
    waddrs: np.ndarray  # padded word-address list (pow2)

    @staticmethod
    def construct(waddrs: np.ndarray, name: str = "STATIC_MEM") -> "StaticMemTable":
        n = len(waddrs)
        assert n & (n - 1) == 0, "address list must be pow2-padded (MemPadder)"
        cs = ConstraintSystem(name)
        addr = cs.create_fixed("addr")
        init_v = [cs.create_fixed(f"init_v{i}") for i in range(2)]
        final_cycle = cs.create_witin("final_cycle")
        final_v = [cs.create_witin(f"final_v{i}") for i in range(2)]
        spec = SetTableSpec(len=n)
        cs.w_table_record(
            [Constant(RAMType.Memory), addr] + list(init_v) + [Constant(0)], spec
        )
        cs.r_table_record(
            [Constant(RAMType.Memory), addr] + list(final_v) + [final_cycle], spec
        )
        return StaticMemTable(cs, addr, init_v, final_v, final_cycle,
                              np.asarray(waddrs, dtype=np.uint64))

    def fixed_trace(self, init_words: np.ndarray) -> List[np.ndarray]:
        w = np.asarray(init_words, dtype=np.uint64)
        return [self.waddrs, w & np.uint64(0xFFFF), w >> np.uint64(16)]

    def assign(self, final_words: np.ndarray, final_cycles: np.ndarray) -> WitnessMatrix:
        wm = WitnessMatrix(self.cs.num_witin, len(self.waddrs))
        fv = np.asarray(final_words, dtype=np.uint64)
        wm.set(self.final_cycle, np.asarray(final_cycles, dtype=np.uint64))
        wm.set(self.final_v[0], fv & np.uint64(0xFFFF))
        wm.set(self.final_v[1], fv >> np.uint64(16))
        return wm


@dataclass
class PubIOTable:
    """Public-IO RAM table (ram_impl.rs:190-300 PubIOTableConfig +
    tables/ram.rs:97-113): non-volatile, read-only memory whose init (and
    final) values come straight from the PUBLIC instance vectors rather than
    a committed fixed column — so the verifier can bind the guest's public
    input by evaluating the raw_pi MLE at the opened point itself.  Fixed
    column = word address; witness = final access cycle.  Values are exposed
    as two 16-bit-limb instance vectors (PV_PUBLIC_IO_LO/HI) to match this
    build's 2-limb memory record layout (deviation from the reference's
    1-limb MemoryExpr; see PROTOCOL.md)."""

    cs: ConstraintSystem
    addr: Fixed
    final_cycle: WitIn
    waddrs: np.ndarray

    @staticmethod
    def construct(waddrs: np.ndarray) -> "PubIOTable":
        from ..vm import PV_PUBLIC_IO_HI, PV_PUBLIC_IO_LO

        n = len(waddrs)
        assert n & (n - 1) == 0, "pub-io window must be pow2 (setup_platform)"
        cs = ConstraintSystem("PUBIO_MEM")
        addr = cs.create_fixed("addr")
        final_cycle = cs.create_witin("final_cycle")
        lo = cs.query_instance(PV_PUBLIC_IO_LO)
        hi = cs.query_instance(PV_PUBLIC_IO_HI)
        spec = SetTableSpec(len=n)
        cs.w_table_record(
            [Constant(RAMType.Memory), addr, lo, hi, Constant(0)], spec
        )
        cs.r_table_record(
            [Constant(RAMType.Memory), addr, lo, hi, final_cycle], spec
        )
        return PubIOTable(cs, addr, final_cycle, np.asarray(waddrs, dtype=np.uint64))

    def fixed_trace(self) -> List[np.ndarray]:
        return [self.waddrs]

    def assign(self, final_cycles: np.ndarray) -> WitnessMatrix:
        wm = WitnessMatrix(self.cs.num_witin, len(self.waddrs))
        wm.set(self.final_cycle, np.asarray(final_cycles, dtype=np.uint64))
        return wm


@dataclass
class DynMemTable:
    """Dynamic volatile RAM table (ram_impl.rs:306-411): the address column is
    a StructuralWitIn addr_i = offset + i (word addresses), evaluated
    succinctly by the verifier; init value 0 @ cycle 0; the table length is
    dynamic (pow2 of the touched span).  Used for stack/heap/hints regions."""

    cs: ConstraintSystem
    addr: object  # StructuralWitIn
    final_v: List[WitIn]
    final_cycle: WitIn
    offset: int  # word address of row 0
    init_v: Optional[List[WitIn]] = None  # non-zero-init (hints region)

    @staticmethod
    def construct(name: str, offset: int, max_len: int,
                  zero_init: bool = True) -> "DynMemTable":
        cs = ConstraintSystem(name)
        addr = cs.create_structural_witin(max_len, offset, 1, name="addr")
        final_cycle = cs.create_witin("final_cycle")
        final_v = [cs.create_witin(f"final_v{i}") for i in range(2)]
        init_v = None
        if zero_init:
            init_exprs = [Constant(0), Constant(0)]
        else:
            # hints-style region: init values are committed witnesses
            # (the prover's private input, ram_impl.rs non-zero-init variant)
            init_v = [cs.create_witin(f"init_v{i}") for i in range(2)]
            init_exprs = [init_v[0] + Constant(0), init_v[1] + Constant(0)]
        spec = SetTableSpec(len=None, structural_witins=[addr])
        cs.w_table_record(
            [Constant(RAMType.Memory), addr] + init_exprs + [Constant(0)], spec
        )
        cs.r_table_record(
            [Constant(RAMType.Memory), addr] + list(final_v) + [final_cycle], spec
        )
        return DynMemTable(cs, addr, final_v, final_cycle, offset, init_v)

    def assign(
        self, length: int, final_words: np.ndarray, final_cycles: np.ndarray,
        init_words: Optional[np.ndarray] = None,
    ) -> Tuple[WitnessMatrix, List[np.ndarray]]:
        """length: pow2 row count; final_words/cycles indexed by row.
        Returns (witness matrix, structural columns)."""
        assert length & (length - 1) == 0
        wm = WitnessMatrix(self.cs.num_witin, length)
        fv = np.asarray(final_words, dtype=np.uint64)
        wm.set(self.final_cycle, np.asarray(final_cycles, dtype=np.uint64))
        wm.set(self.final_v[0], fv & np.uint64(0xFFFF))
        wm.set(self.final_v[1], fv >> np.uint64(16))
        if self.init_v is not None:
            iv = (np.zeros(length, dtype=np.uint64) if init_words is None
                  else np.asarray(init_words, dtype=np.uint64))
            wm.set(self.init_v[0], iv & np.uint64(0xFFFF))
            wm.set(self.init_v[1], iv >> np.uint64(16))
        addrs = np.uint64(self.offset) + np.arange(length, dtype=np.uint64)
        return wm, [addrs]
