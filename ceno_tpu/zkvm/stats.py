"""Circuit statistics reports.

Mirrors /root/reference/ceno_zkvm/src/stats.rs: StaticReport (per-circuit
witness/read/write/lookup counts and degrees, known at keygen time) and
TraceReport (instance counts for a given trace), with JSON output.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional

from .circuit_builder import ConstraintSystem
from .structs import ZKVMConstraintSystem


@dataclass
class OpCodeStats:
    witnesses: int
    reads: int
    writes: int
    lookups: int
    degrees: List[int]


@dataclass
class TableStats:
    witnesses: int
    fixed: int
    structural: int
    table_len: List[int]


@dataclass
class StaticReport:
    opcodes: Dict[str, OpCodeStats] = field(default_factory=dict)
    tables: Dict[str, TableStats] = field(default_factory=dict)

    @staticmethod
    def build(zkvm_cs: ZKVMConstraintSystem) -> "StaticReport":
        rep = StaticReport()
        for name, cs in zkvm_cs.circuits.items():
            if cs.r_table_expressions or cs.w_table_expressions or cs.lk_table_expressions:
                rep.tables[name] = TableStats(
                    witnesses=cs.num_witin,
                    fixed=cs.num_fixed,
                    structural=cs.num_structural_witin,
                    table_len=[x.table_len for x in cs.lk_table_expressions]
                    + [x.table_spec.len or 0 for x in cs.r_table_expressions],
                )
            else:
                degrees = [
                    e.degree() for e in cs.assert_zero_sumcheck_expressions
                ]
                rep.opcodes[name] = OpCodeStats(
                    witnesses=cs.num_witin,
                    reads=len(cs.r_expressions),
                    writes=len(cs.w_expressions),
                    lookups=len(cs.lk_expressions),
                    degrees=degrees,
                )
        return rep

    def to_json(self) -> str:
        return json.dumps(
            {
                "opcodes": {k: asdict(v) for k, v in self.opcodes.items()},
                "tables": {k: asdict(v) for k, v in self.tables.items()},
            },
            indent=2,
        )

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())


@dataclass
class TraceReport:
    static: StaticReport
    num_instances: Dict[str, int]

    def total_witness_cells(self) -> int:
        total = 0
        for name, st in self.static.opcodes.items():
            total += st.witnesses * self.num_instances.get(name, 0)
        for name, st in self.static.tables.items():
            total += st.witnesses * self.num_instances.get(name, 0)
        return total

    def to_json(self) -> str:
        return json.dumps(
            {
                "num_instances": self.num_instances,
                "total_witness_cells": self.total_witness_cells(),
            },
            indent=2,
        )


def _fmt_table(rows: List[List[str]]) -> str:
    """Plain-text aligned table (stats.rs:237 save_table's prettytable)."""
    widths = [max(len(str(r[i])) for r in rows) for i in range(len(rows[0]))]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep]
    for i, row in enumerate(rows):
        out.append(
            "| " + " | ".join(str(c).ljust(w) for c, w in zip(row, widths)) + " |"
        )
        if i == 0:
            out.append(sep)
    out.append(sep)
    return "\n".join(out)


def format_report(report: TraceReport) -> str:
    """Human-readable per-circuit cost table (riscv_stats.rs:16 output)."""
    op_rows = [["opcode_name", "num_instances", "lookups", "reads",
                "witnesses", "writes", "0_expr_sumcheck_deg"]]
    for name in sorted(report.static.opcodes):
        st = report.static.opcodes[name]
        degs: Dict[int, int] = {}
        for d in st.degrees:
            degs[d] = degs.get(d, 0) + 1
        op_rows.append([
            name, report.num_instances.get(name, 0), st.lookups, st.reads,
            st.witnesses, st.writes,
            ", ".join(f"deg{d}: {c}" for d, c in sorted(degs.items())) or "-",
        ])
    tbl_rows = [["table_name", "num_instances", "witnesses", "fixed",
                 "structural", "table_len"]]
    for name in sorted(report.static.tables):
        st = report.static.tables[name]
        tbl_rows.append([
            name, report.num_instances.get(name, 0), st.witnesses, st.fixed,
            st.structural, ",".join(map(str, st.table_len)) or "-",
        ])
    return (_fmt_table(op_rows) + "\n\n" + _fmt_table(tbl_rows)
            + f"\n\ntotal witness cells: {report.total_witness_cells()}")


def main(argv: Optional[List[str]] = None) -> None:
    """CLI: `python -m ceno_tpu.zkvm.stats [elf] [--max-steps N] [-o FILE]`.

    Mirrors /root/reference/ceno_zkvm/src/bin/riscv_stats.rs:16: builds the
    full Rv32imConfig and emits the per-circuit cost table; with an ELF it
    also emulates and reports real per-circuit instance counts."""
    import argparse

    from ..emul import load_elf
    from ..emul.platform import setup_platform
    from .riscv.config import MemLayout, Rv32imConfig

    ap = argparse.ArgumentParser(prog="ceno_tpu.zkvm.stats")
    ap.add_argument("elf", nargs="?", help="guest ELF to emulate for instance counts")
    ap.add_argument("--max-steps", type=int, default=1 << 20)
    ap.add_argument("--platform", default="ceno", choices=["ceno", "sp1"])
    ap.add_argument("-o", "--output", default=None,
                    help="also write the table to this file")
    args = ap.parse_args(argv)

    num_instances: Dict[str, int] = {}
    if args.elf:
        from .e2e import emulate_program

        with open(args.elf, "rb") as f:
            program = load_elf(f.read())
        platform = setup_platform(args.platform, program, 1 << 17, 1 << 17, 64)
        mem_layout = MemLayout.from_platform(program, platform)
        config = Rv32imConfig.construct(
            max(16, 1 << (len(program.instructions) - 1).bit_length()),
            mem_layout=mem_layout, full_tables=True,
        )
        vm, steps, _ = emulate_program(program, platform, args.max_steps)
        _, num_instances, _ = config.assign_witnesses(steps, program, vm)
    else:
        config = Rv32imConfig.construct(16, full_tables=True)

    report = TraceReport(StaticReport.build(config.zkvm_cs), num_instances)
    text = format_report(report)
    print(text)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text + "\n")


def proof_size_bytes(proof) -> int:
    """Canonical serialized proof size (fibonacci.rs:55-63 reports bincode
    len; here the length of serialize.py's deterministic encoding)."""
    from .serialize import proof_size_bytes as _psb

    return _psb(proof)


if __name__ == "__main__":
    main()
