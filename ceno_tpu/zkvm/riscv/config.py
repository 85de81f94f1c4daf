"""Circuit-set configuration: registers circuits + assigns witnesses.

Round-1 subset of the reference's Rv32imConfig (instructions/riscv/rv32im.rs):
ADD/SUB/ADDI/AND/OR/XOR/SLTU/BEQ/BNE/BLTU/BGEU/JAL opcode circuits, the
U16 range table, And/Or/Xor byte tables, program table, register table and
global state.  The `kinds` argument selects a subset (tests use small sets
to bound proving work); widens opcode-by-opcode in subsequent rounds.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from ...emul.insn import InsnKind
from ...emul.platform import Platform
from ...field.gl import Gl
from ..circuit_builder import ROMType
from ..structs import ZKVMConstraintSystem
from ..witness import LkMultiplicity
from .arith import assign_add_sub, construct_add_sub
from .insns import (
    assign_addi,
    assign_branch,
    assign_jal,
    assign_logic,
    assign_sltu,
    construct_addi,
    construct_branch,
    construct_jal,
    construct_logic,
    construct_sltu,
)
from .insns2 import (
    assign_div_rem,
    assign_halt,
    assign_jalr,
    assign_logic_imm,
    assign_mul,
    assign_shift,
    assign_slt,
    construct_div_rem,
    construct_halt,
    construct_jalr,
    construct_logic_imm,
    construct_mul,
    construct_shift,
    construct_slt,
)
from .dummy import (
    ECALL_DUMMY_PSEUDO_KIND,
    assign_dummy,
    assign_ecall_dummy,
    construct_dummy,
    construct_ecall_dummy,
)
from .syscall_circuits import (
    KECCAK_PSEUDO_KIND,
    assign_keccak_dummy,
    construct_keccak_dummy,
)
from .memory import (
    LOADS,
    STORES,
    assign_load,
    assign_store,
    construct_load,
    construct_store,
)
from .tables import (
    DynMemTable,
    OpsTable,
    ProgramTable,
    PubIOTable,
    RangeTable,
    RegTable,
    StaticMemTable,
    global_state_exprs,
)

K = InsnKind

_BUILDERS = {
    K.ADD: (lambda: construct_add_sub(K.ADD, "ADD"), assign_add_sub),
    K.SUB: (lambda: construct_add_sub(K.SUB, "SUB"), assign_add_sub),
    K.ADDI: (construct_addi, assign_addi),
    K.AND: (lambda: construct_logic(K.AND), assign_logic),
    K.OR: (lambda: construct_logic(K.OR), assign_logic),
    K.XOR: (lambda: construct_logic(K.XOR), assign_logic),
    K.SLTU: (construct_sltu, assign_sltu),
    K.BEQ: (lambda: construct_branch(K.BEQ), assign_branch),
    K.BNE: (lambda: construct_branch(K.BNE), assign_branch),
    K.BLTU: (lambda: construct_branch(K.BLTU), assign_branch),
    K.BGEU: (lambda: construct_branch(K.BGEU), assign_branch),
    K.BLT: (lambda: construct_branch(K.BLT), assign_branch),
    K.BGE: (lambda: construct_branch(K.BGE), assign_branch),
    K.JAL: (construct_jal, assign_jal),
    K.JALR: (construct_jalr, assign_jalr),
    K.ANDI: (lambda: construct_logic_imm(K.ANDI), assign_logic_imm),
    K.ORI: (lambda: construct_logic_imm(K.ORI), assign_logic_imm),
    K.XORI: (lambda: construct_logic_imm(K.XORI), assign_logic_imm),
    K.SLT: (lambda: construct_slt(K.SLT), assign_slt),
    K.SLTI: (lambda: construct_slt(K.SLTI), assign_slt),
    K.SLTIU: (lambda: construct_slt(K.SLTIU), assign_slt),
    K.SLLI: (lambda: construct_shift(K.SLLI), assign_shift),
    K.SRLI: (lambda: construct_shift(K.SRLI), assign_shift),
    K.SRAI: (lambda: construct_shift(K.SRAI), assign_shift),
    K.SLL: (lambda: construct_shift(K.SLL), assign_shift),
    K.SRL: (lambda: construct_shift(K.SRL), assign_shift),
    K.SRA: (lambda: construct_shift(K.SRA), assign_shift),
    K.MUL: (lambda: construct_mul(K.MUL), assign_mul),
    K.MULH: (lambda: construct_mul(K.MULH), assign_mul),
    K.MULHU: (lambda: construct_mul(K.MULHU), assign_mul),
    K.MULHSU: (lambda: construct_mul(K.MULHSU), assign_mul),
    K.DIVU: (lambda: construct_div_rem(K.DIVU), assign_div_rem),
    K.REMU: (lambda: construct_div_rem(K.REMU), assign_div_rem),
    K.DIV: (lambda: construct_div_rem(K.DIV), assign_div_rem),
    K.REM: (lambda: construct_div_rem(K.REM), assign_div_rem),
    K.ECALL: (construct_halt, assign_halt),
    KECCAK_PSEUDO_KIND: (construct_keccak_dummy, assign_keccak_dummy),
    ECALL_DUMMY_PSEUDO_KIND: (construct_ecall_dummy, assign_ecall_dummy),
    K.LW: (lambda: construct_load(K.LW), assign_load),
    K.LH: (lambda: construct_load(K.LH), assign_load),
    K.LHU: (lambda: construct_load(K.LHU), assign_load),
    K.LB: (lambda: construct_load(K.LB), assign_load),
    K.LBU: (lambda: construct_load(K.LBU), assign_load),
    K.SW: (lambda: construct_store(K.SW), assign_store),
    K.SH: (lambda: construct_store(K.SH), assign_store),
    K.SB: (lambda: construct_store(K.SB), assign_store),
}

DEFAULT_KINDS = tuple(_BUILDERS.keys())

# which ops-ROM tables each opcode's lookups hit
_OPS_TABLES_OF = {
    K.AND: [ROMType.And], K.OR: [ROMType.Or], K.XOR: [ROMType.Xor],
    K.ANDI: [ROMType.And], K.ORI: [ROMType.Or], K.XORI: [ROMType.Xor],
    K.SLL: [ROMType.Pow], K.SRL: [ROMType.Pow], K.SRA: [ROMType.Pow],
}

# byte-granular memory ops need the U8 range table
_U8_KINDS = {K.LB, K.LBU, K.SB}

_MEM_KINDS = set(LOADS) | set(STORES)


@dataclass
class MemLayout:
    """Word-address layout of the RAM tables (mmu.rs MmuConfig + MemPadder).

    Pure function of (program, platform) — NEVER of an execution — so keygen
    is reproducible without running the guest and one vk serves every input
    (e2e.rs:169-244 setup_platform/init_mem).

    static_waddrs: pow2 list covering program data + stack + heap (all
    zero/image-initialised non-volatile rows, like the reference's init_mem);
    pub_io: (offset_waddr, pow2 len) window whose values are public instances;
    dyn regions: (offset_waddr, pow2 max_len) per named region — addresses
    are StructuralWitIns addr_i = offset + i evaluated succinctly by the
    verifier; the per-run row count is the touched pow2 prefix."""

    static_waddrs: np.ndarray
    dyn_regions: Dict[str, tuple]  # name -> (offset, max_len)
    pub_io: Optional[tuple] = None  # (offset, len)

    @staticmethod
    def minimal() -> "MemLayout":
        """Unit-test layout: a 4-word static window, no dyn regions."""
        return MemLayout(
            np.arange(4, dtype=np.uint64) + np.uint64(0x2000_0400 >> 2), {}
        )

    @staticmethod
    def from_platform(program, platform) -> "MemLayout":
        """mmu.rs:16-113 MmuConfig + e2e.rs:214-244 init_mem: static memory
        = program image + stack + heap windows (total is pow2 by
        setup_platform's padding); public-io its own instance-valued table;
        hints the one dynamic region.  Asserts the address spaces are
        disjoint (mmu.rs:55-63)."""
        img = np.asarray(sorted({a >> 2 for a in program.image}), dtype=np.uint64)
        stack = np.arange(platform.stack[0] >> 2, platform.stack[1] >> 2,
                          dtype=np.uint64)
        heap = np.arange(platform.heap[0] >> 2, platform.heap[1] >> 2,
                         dtype=np.uint64)
        static = np.unique(np.concatenate([img, stack, heap]))
        n = len(static)
        assert n == len(img) + len(stack) + len(heap), (
            "program image / stack / heap windows overlap"
        )
        assert n & (n - 1) == 0, (
            f"static memory is {n} words — not pow2; derive the platform via "
            "setup_platform so the heap pad makes it so"
        )

        io_off = platform.public_io[0] >> 2
        io_len = (platform.public_io[1] - platform.public_io[0]) >> 2
        hints_off = platform.hints[0] >> 2
        hints_cap = (platform.hints[1] - platform.hints[0]) >> 2

        # address-space uniqueness (mmu.rs:55-63): window-vs-static overlap
        # via sorted-range intersection, window-vs-window via intervals
        def touches_static(lo, length):
            i = np.searchsorted(static, np.uint64(lo))
            return i < n and static[i] < np.uint64(lo + length)

        assert not touches_static(io_off, io_len), "pub-io overlaps static mem"
        assert not touches_static(hints_off, hints_cap), "hints overlap static mem"
        assert (io_off + io_len <= hints_off or hints_off + hints_cap <= io_off), (
            "pub-io window overlaps hints"
        )

        return MemLayout(
            static,
            {"HINTS_MEM": (hints_off, hints_cap)},
            pub_io=(io_off, io_len),
        )


@dataclass
class Rv32imConfig:
    zkvm_cs: ZKVMConstraintSystem
    opcode_cfgs: Dict[int, object]
    u16_table: RangeTable
    ops_tables: Dict[int, OpsTable]
    program_table: ProgramTable
    reg_table: RegTable
    u8_table: Optional[RangeTable] = None
    static_mem: Optional[StaticMemTable] = None
    dyn_mems: Dict[str, DynMemTable] = field(default_factory=dict)
    mem_layout: Optional[MemLayout] = None
    extra_ranges: List[RangeTable] = field(default_factory=list)
    pub_io_table: Optional[PubIOTable] = None
    assigners: Dict[int, object] = field(default_factory=dict)

    @staticmethod
    def construct(
        program_size: int,
        kinds: Sequence[int] = DEFAULT_KINDS,
        mem_layout: Optional[MemLayout] = None,
        full_tables: bool = False,
        dummy_kinds: Sequence[int] = (),
    ) -> "Rv32imConfig":
        """full_tables=True registers every ROM table the reference does
        (U5/U8/U14/U16 + And/Or/Xor/Ltu/Pow, rv32im.rs) even when unused by
        the selected circuits; the default registers only the tables the
        selected circuits look up (smaller proofs for subsets/tests).

        dummy_kinds routes those InsnKinds through the generic
        DummyInstruction circuit (reads/writes only, no op semantics —
        dummy_circuit.rs:24) instead of their dedicated circuits."""
        zkvm_cs = ZKVMConstraintSystem()
        opcode_cfgs = {}
        assigners = {}
        for kind in kinds:
            if kind in dummy_kinds:
                cfg = construct_dummy(kind)
                assigners[kind] = assign_dummy
            else:
                builder, assigner = _BUILDERS[kind]
                cfg = builder()
                assigners[kind] = assigner
            opcode_cfgs[kind] = cfg
            zkvm_cs.register(cfg.cs)
        for kind in dummy_kinds:
            if kind not in opcode_cfgs:
                cfg = construct_dummy(kind)
                assigners[kind] = assign_dummy
                opcode_cfgs[kind] = cfg
                zkvm_cs.register(cfg.cs)

        u16 = RangeTable.construct(ROMType.U16, 16)
        zkvm_cs.register(u16.cs)
        u8 = None
        if full_tables or (_U8_KINDS & set(opcode_cfgs)):
            u8 = RangeTable.construct(ROMType.U8, 8)
            zkvm_cs.register(u8.cs)
        extra_ranges = []
        if full_tables:
            for rom, bits in ((ROMType.U5, 5), (ROMType.U14, 14)):
                tbl = RangeTable.construct(rom, bits)
                extra_ranges.append(tbl)
                zkvm_cs.register(tbl.cs)
        ops_tables = {}
        wanted = {rom for kind, roms in _OPS_TABLES_OF.items()
                  if kind in opcode_cfgs for rom in roms}
        if full_tables:
            wanted |= {ROMType.And, ROMType.Or, ROMType.Xor, ROMType.Ltu,
                       ROMType.Pow}
        for rom in sorted(wanted):
            tbl = OpsTable.construct(rom)
            ops_tables[rom] = tbl
            zkvm_cs.register(tbl.cs)
        prog = ProgramTable.construct(program_size)
        zkvm_cs.register(prog.cs)
        reg = RegTable.construct()
        zkvm_cs.register(reg.cs)

        static_mem = None
        dyn_mems: Dict[str, DynMemTable] = {}
        pub_io_table = None
        if _MEM_KINDS & set(opcode_cfgs):
            if mem_layout is None:
                mem_layout = MemLayout.minimal()
            static_mem = StaticMemTable.construct(mem_layout.static_waddrs)
            zkvm_cs.register(static_mem.cs)
            for name, (off, max_len) in mem_layout.dyn_regions.items():
                dyn = DynMemTable.construct(name, off, max_len=max_len,
                                            zero_init=(name != "HINTS_MEM"))
                dyn_mems[name] = dyn
                zkvm_cs.register(dyn.cs)
            if mem_layout.pub_io is not None:
                io_off, io_len = mem_layout.pub_io
                pub_io_table = PubIOTable.construct(
                    np.uint64(io_off) + np.arange(io_len, dtype=np.uint64)
                )
                zkvm_cs.register(pub_io_table.cs)

        init_gs, fin_gs = global_state_exprs(reg.cs)
        zkvm_cs.initial_global_state_expr = init_gs
        zkvm_cs.finalize_global_state_expr = fin_gs
        return Rv32imConfig(zkvm_cs, opcode_cfgs, u16, ops_tables, prog, reg,
                            u8, static_mem, dyn_mems, mem_layout, extra_ranges,
                            pub_io_table, assigners)

    def generate_fixed_traces(self, program, reg_init: np.ndarray) -> Dict[str, List[Gl]]:
        from ...field import gl

        def cols(arrs):
            return [gl.from_u64(a) for a in arrs]

        out = {
            "RANGE_U16": cols(self.u16_table.fixed_trace()),
            "PROGRAM": cols(self.program_table.fixed_trace(program)),
            "REG_TABLE": cols(self.reg_table.fixed_trace(reg_init)),
        }
        if self.u8_table is not None:
            out["RANGE_U8"] = cols(self.u8_table.fixed_trace())
        for tbl in self.extra_ranges:
            out[tbl.cs.name] = cols(tbl.fixed_trace())
        for tbl in self.ops_tables.values():
            out[tbl.cs.name] = cols(tbl.fixed_trace())
        if self.static_mem is not None:
            init_words = np.asarray(
                [program.image.get(int(w) << 2, 0) for w in self.static_mem.waddrs],
                dtype=np.uint64,
            )
            out[self.static_mem.cs.name] = cols(self.static_mem.fixed_trace(init_words))
        if self.pub_io_table is not None:
            out[self.pub_io_table.cs.name] = cols(self.pub_io_table.fixed_trace())
        return out

    def assign_witnesses(self, steps, program, vm) -> tuple:
        """Bucket steps by kind, assign opcode circuits, then tables.

        Returns (witnesses, num_instances, structural) dicts by circuit name."""
        lkm = LkMultiplicity()
        buckets: Dict[int, list] = {}
        for s in steps:
            kind = s.insn.kind
            if kind == K.ECALL:
                if s.syscall is not None:
                    kind = KECCAK_PSEUDO_KIND
                elif s.rs1 is not None and s.rs1.value != Platform.ECALL_HALT:
                    # non-HALT, nop'd unknown syscall -> ECALL_DUMMY bucket
                    # (rv32im.rs:315 leftover-records semantics)
                    kind = ECALL_DUMMY_PSEUDO_KIND
            buckets.setdefault(kind, []).append(s)
        unknown = set(buckets) - set(self.opcode_cfgs)
        assert not unknown, (
            f"no circuit for opcodes {sorted(unknown)}: add them to `kinds` "
            f"or route via `dummy_kinds` (DummyInstruction catch-all)"
        )

        witnesses: Dict[str, List[Gl]] = {}
        num_instances: Dict[str, int] = {}

        for kind, cfg in self.opcode_cfgs.items():
            assigner = self.assigners.get(kind) or _BUILDERS[kind][1]
            group = buckets.get(kind, [])
            name = cfg.cs.name
            if group:
                wm = assigner(cfg, group, lkm)
                witnesses[name] = wm.to_columns()
                num_instances[name] = len(group)
            else:
                num_instances[name] = 0

        # register table: final values/cycles from the tracer
        from .tables import REG_COUNT_POW2

        final_vals = np.zeros(REG_COUNT_POW2, dtype=np.uint64)
        final_cycles = np.zeros(REG_COUNT_POW2, dtype=np.uint64)
        reg_init = getattr(vm, "_reg_init", np.zeros(REG_COUNT_POW2, dtype=np.uint64))
        final_vals[: len(reg_init)] = reg_init[: REG_COUNT_POW2]
        for idx in range(vm.REG_COUNT):
            final_vals[idx] = vm.registers[idx]
        for waddr, cycle in vm.tracer.final_accesses().items():
            # register VMAs are idx<<8 -> word addr idx<<6
            if waddr % 64 == 0 and waddr // 64 < REG_COUNT_POW2:
                idx = waddr // 64
                final_cycles[idx] = cycle
        witnesses["REG_TABLE"] = self.reg_table.assign(final_vals, final_cycles).to_columns()
        num_instances["REG_TABLE"] = REG_COUNT_POW2

        witnesses["PROGRAM"] = self.program_table.assign(lkm, program).to_columns()
        num_instances["PROGRAM"] = self.program_table.program_size

        witnesses["RANGE_U16"] = self.u16_table.assign(lkm).to_columns()
        num_instances["RANGE_U16"] = self.u16_table.table_len
        if self.u8_table is not None:
            witnesses["RANGE_U8"] = self.u8_table.assign(lkm).to_columns()
            num_instances["RANGE_U8"] = self.u8_table.table_len
        for tbl in self.extra_ranges:
            witnesses[tbl.cs.name] = tbl.assign(lkm).to_columns()
            num_instances[tbl.cs.name] = tbl.table_len
        for tbl in self.ops_tables.values():
            witnesses[tbl.cs.name] = tbl.assign(lkm).to_columns()
            num_instances[tbl.cs.name] = tbl.table_len

        # memory tables: final word values/cycles from the VM + tracer
        structural: Dict[str, List[Gl]] = {}
        if self.static_mem is not None:
            from ...field import gl

            accesses = vm.tracer.latest_accesses

            def finals(waddrs):
                words = np.asarray(
                    [vm.peek_memory(int(w)) for w in waddrs], dtype=np.uint64
                )
                cyc = np.asarray(
                    [accesses.get(int(w), 0) for w in waddrs], dtype=np.uint64
                )
                return words, cyc

            sm = self.static_mem
            words, cyc = finals(sm.waddrs)
            witnesses[sm.cs.name] = sm.assign(words, cyc).to_columns()
            num_instances[sm.cs.name] = len(sm.waddrs)

            if self.pub_io_table is not None:
                io = self.pub_io_table
                io_cyc = np.asarray(
                    [accesses.get(int(w), 0) for w in io.waddrs], dtype=np.uint64
                )
                witnesses[io.cs.name] = io.assign(io_cyc).to_columns()
                num_instances[io.cs.name] = len(io.waddrs)

            hints_image = getattr(vm, "_hints_image", {})
            for name, dyn in self.dyn_mems.items():
                off, max_len = self.mem_layout.dyn_regions[name]
                # per-run row count: pow2 prefix covering every touched /
                # hint-initialised word (ram_impl.rs DynVolatileRamTable —
                # addresses are structural so the vk pins only offset/max_len)
                top = 0
                for w in hints_image:
                    if off <= w < off + max_len:
                        top = max(top, w - off + 1)
                for w in accesses:
                    if off <= w < off + max_len:
                        top = max(top, w - off + 1)
                if top == 0:
                    num_instances[name] = 0
                    continue
                length = 1 << (top - 1).bit_length()
                assert length <= max_len
                waddrs = np.uint64(off) + np.arange(length, dtype=np.uint64)
                words, cyc = finals(waddrs)
                init_words = None
                if dyn.init_v is not None:
                    init_words = np.asarray(
                        [hints_image.get(int(w), 0) for w in waddrs],
                        dtype=np.uint64,
                    )
                wm, cols_np = dyn.assign(length, words, cyc, init_words)
                witnesses[name] = wm.to_columns()
                structural[name] = [gl.from_u64(c) for c in cols_np]
                num_instances[name] = length

        return witnesses, num_instances, structural
