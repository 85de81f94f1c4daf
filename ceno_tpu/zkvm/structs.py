"""ZKVM-level aggregates: constraint-system registry, keys, proof container.

Mirrors /root/reference/ceno_zkvm/src/structs.rs:147-381 (ZKVMConstraintSystem
/ ZKVMProvingKey / ZKVMVerifyingKey / ZKVMProof) and keygen.rs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..field.gl import Gl
from ..field.gl2 import Gl2
from ..pcs import Basefold, BasefoldCommitment, BasefoldCommitmentWithWitness
from .circuit_builder import ConstraintSystem
from .expression import Expr


@dataclass
class CircuitProvingKey:
    cs: ConstraintSystem
    fixed_traces: Optional[List[Gl]] = None
    fixed_cww: Optional[BasefoldCommitmentWithWitness] = None

    @property
    def fixed_commit(self) -> Optional[BasefoldCommitment]:
        return self.fixed_cww.to_commitment() if self.fixed_cww else None


@dataclass
class ZKVMConstraintSystem:
    """Registry of all circuits, keyed (and iterated) by sorted name."""

    circuits: Dict[str, ConstraintSystem] = field(default_factory=dict)
    initial_global_state_expr: Optional[Expr] = None
    finalize_global_state_expr: Optional[Expr] = None

    def register(self, cs: ConstraintSystem) -> ConstraintSystem:
        assert cs.name not in self.circuits
        self.circuits[cs.name] = cs
        return cs

    def sorted_names(self) -> List[str]:
        return sorted(self.circuits.keys())

    def key_gen(self, pcs: Basefold, fixed_traces: Dict[str, List[Gl]]):
        """Commit every circuit's fixed columns (keygen.rs:9-38)."""
        pks: Dict[str, CircuitProvingKey] = {}
        for name in self.sorted_names():
            cs = self.circuits[name]
            fixed = fixed_traces.get(name)
            fixed_cww = None
            if fixed:
                assert len(fixed) == cs.num_fixed
                fixed_cww = pcs.commit(fixed)
            pks[name] = CircuitProvingKey(cs, fixed, fixed_cww)
        return ZKVMProvingKey(
            pcs, pks, self.initial_global_state_expr, self.finalize_global_state_expr
        )


@dataclass
class ZKVMProvingKey:
    pcs: Basefold
    circuit_pks: Dict[str, CircuitProvingKey]
    initial_global_state_expr: Optional[Expr]
    finalize_global_state_expr: Optional[Expr]

    def sorted_names(self) -> List[str]:
        return sorted(self.circuit_pks.keys())


@dataclass
class ZKVMProof:
    raw_pi: List[List[int]]  # public values as base-field vectors
    pi_evals: Dict[int, Gl2]  # filled by table proofs / constants
    opcode_proofs: Dict[str, Tuple[int, object]] = field(default_factory=dict)
    table_proofs: Dict[str, Tuple[int, object]] = field(default_factory=dict)
