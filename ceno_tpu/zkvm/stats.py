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


def proof_size_bytes(proof) -> int:
    """Canonical serialized proof size (fibonacci.rs:55-63 reports bincode
    len; here the length of serialize.py's deterministic encoding)."""
    from .serialize import proof_size_bytes as _psb

    return _psb(proof)
