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
from .tables import OpsTable, ProgramTable, RangeTable, RegTable, global_state_exprs

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
    K.JAL: (construct_jal, assign_jal),
}

DEFAULT_KINDS = tuple(_BUILDERS.keys())

_LOGIC_TABLE_OF = {K.AND: ROMType.And, K.OR: ROMType.Or, K.XOR: ROMType.Xor}


@dataclass
class Rv32imConfig:
    zkvm_cs: ZKVMConstraintSystem
    opcode_cfgs: Dict[int, object]
    u16_table: RangeTable
    ops_tables: Dict[int, OpsTable]
    program_table: ProgramTable
    reg_table: RegTable

    @staticmethod
    def construct(
        program_size: int, kinds: Sequence[int] = DEFAULT_KINDS
    ) -> "Rv32imConfig":
        zkvm_cs = ZKVMConstraintSystem()
        opcode_cfgs = {}
        for kind in kinds:
            builder, _ = _BUILDERS[kind]
            cfg = builder()
            opcode_cfgs[kind] = cfg
            zkvm_cs.register(cfg.cs)

        u16 = RangeTable.construct(ROMType.U16, 16)
        zkvm_cs.register(u16.cs)
        ops_tables = {}
        for kind, rom in _LOGIC_TABLE_OF.items():
            if kind in opcode_cfgs:
                tbl = OpsTable.construct(rom)
                ops_tables[rom] = tbl
                zkvm_cs.register(tbl.cs)
        prog = ProgramTable.construct(program_size)
        zkvm_cs.register(prog.cs)
        reg = RegTable.construct()
        zkvm_cs.register(reg.cs)

        init_gs, fin_gs = global_state_exprs(reg.cs)
        zkvm_cs.initial_global_state_expr = init_gs
        zkvm_cs.finalize_global_state_expr = fin_gs
        return Rv32imConfig(zkvm_cs, opcode_cfgs, u16, ops_tables, prog, reg)

    def generate_fixed_traces(self, program, reg_init: np.ndarray) -> Dict[str, List[Gl]]:
        from ...field import gl

        def cols(arrs):
            return [gl.from_u64(a) for a in arrs]

        out = {
            "RANGE_U16": cols(self.u16_table.fixed_trace()),
            "PROGRAM": cols(self.program_table.fixed_trace(program)),
            "REG_TABLE": cols(self.reg_table.fixed_trace(reg_init)),
        }
        for tbl in self.ops_tables.values():
            out[tbl.cs.name] = cols(tbl.fixed_trace())
        return out

    def assign_witnesses(self, steps, program, vm) -> tuple:
        """Bucket steps by kind, assign opcode circuits, then tables.

        Returns (witnesses dict name -> columns, num_instances dict)."""
        lkm = LkMultiplicity()
        buckets: Dict[int, list] = {}
        for s in steps:
            buckets.setdefault(s.insn.kind, []).append(s)
        unknown = set(buckets) - set(self.opcode_cfgs)
        assert not unknown, f"opcode circuits not yet implemented: {unknown}"

        witnesses: Dict[str, List[Gl]] = {}
        num_instances: Dict[str, int] = {}

        for kind, cfg in self.opcode_cfgs.items():
            _, assigner = _BUILDERS[kind]
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
        for tbl in self.ops_tables.values():
            witnesses[tbl.cs.name] = tbl.assign(lkm).to_columns()
            num_instances[tbl.cs.name] = tbl.table_len

        return witnesses, num_instances
