"""ConstraintSystem + CircuitBuilder.

Mirrors /root/reference/ceno_zkvm/src/circuit_builder.rs: a per-circuit
registry of witness columns, fixed columns, RAM read/write records, LogUp
lookup records, and zero assertions (linear ones checked at the opened point,
higher-degree ones via the main-sel zerocheck sumcheck).  Records are
RLC-compressed with the two global chip challenges alpha = Challenge(0),
beta = Challenge(1): rlc(items) = alpha + sum_i beta^i * items_i
(chip_handler/utils.rs:8-21).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from .expression import (
    Challenge,
    Constant,
    Expr,
    Fixed,
    Instance,
    StructuralWitIn,
    WitIn,
    to_expr,
)

ALPHA = Challenge(0)
BETA = Challenge(1)


class RAMType:
    GlobalState = 0
    Register = 1
    Memory = 2


class ROMType:
    U5 = 0
    U8 = 1
    U14 = 2
    U16 = 3
    And = 4
    Or = 5
    Xor = 6
    Ltu = 7
    Pow = 8
    Instruction = 9


@dataclass
class SetTableSpec:
    """Table-side r/w set (ram_impl.rs SetTableSpec)."""

    len: Optional[int] = None
    structural_witins: List[StructuralWitIn] = field(default_factory=list)


@dataclass
class SetTableExpression:
    expr: Expr
    table_spec: SetTableSpec


@dataclass
class LogupTableExpression:
    multiplicity: Expr
    values: Expr
    table_len: int


def rlc_chip_record(items: List[Expr]) -> Expr:
    assert items
    acc = None
    beta_pow: Expr = Constant(1)
    for it in items:
        term = it * beta_pow
        acc = term if acc is None else acc + term
        beta_pow = beta_pow * BETA
    return acc + ALPHA


class ConstraintSystem:
    def __init__(self, name: str = "circuit"):
        self.name = name
        self.num_witin = 0
        self.num_fixed = 0
        self.num_structural_witin = 0
        self.instance_ids: List[int] = []
        self.witin_names: List[str] = []
        self.fixed_names: List[str] = []
        # opcode side (parallel *_names lists carry namespaced labels for
        # diagnostics — mock_prover.rs:163-296 reports failures by name)
        self.r_expressions: List[Expr] = []
        self.r_names: List[str] = []
        self.w_expressions: List[Expr] = []
        self.w_names: List[str] = []
        self.lk_expressions: List[Expr] = []
        self.lk_names: List[str] = []
        self.lk_raw: List[tuple] = []  # (rom_type, items) per lk_record
        # table side
        self.r_table_expressions: List[SetTableExpression] = []
        self.w_table_expressions: List[SetTableExpression] = []
        self.lk_table_expressions: List[LogupTableExpression] = []
        self.lk_table_raw: List[tuple] = []  # (rom_type, items, multiplicity)
        # zero assertions
        self.assert_zero_expressions: List[Expr] = []
        self.assert_zero_names: List[str] = []
        self.assert_zero_sumcheck_expressions: List[Expr] = []
        self.assert_names: List[str] = []
        self.max_non_lc_degree = 0
        self._ns: List[str] = []  # namespace stack (circuit_builder.rs ns)

    # -- namespaces ---------------------------------------------------------

    def namespace(self, name: str):
        """Context manager: prefix every registered name with `name/` —
        the reference's `cb.namespace(|| "...", ...)` idiom."""
        return _Namespace(self, name)

    def _n(self, name: str) -> str:
        return "/".join(self._ns + [name]) if self._ns else name

    # -- registration -----------------------------------------------------

    def create_witin(self, name: str = "w") -> WitIn:
        w = WitIn(self.num_witin)
        self.num_witin += 1
        self.witin_names.append(self._n(name))
        return w

    def create_fixed(self, name: str = "f") -> Fixed:
        f = Fixed(self.num_fixed)
        self.num_fixed += 1
        self.fixed_names.append(self._n(name))
        return f

    def create_structural_witin(
        self, max_len: int, offset: int = 0, multi_factor: int = 1, name: str = "sw"
    ) -> StructuralWitIn:
        s = StructuralWitIn(self.num_structural_witin, max_len, offset, multi_factor)
        self.num_structural_witin += 1
        return s

    def query_instance(self, idx: int) -> Instance:
        if idx not in self.instance_ids:
            self.instance_ids.append(idx)
        return Instance(idx)

    # -- records ------------------------------------------------------------

    def read_record(self, items: List[Expr], name: str = "r") -> None:
        e = rlc_chip_record([to_expr(i) for i in items])
        assert e.degree() == 1, "read_record must be linear"
        self.r_expressions.append(e)
        self.r_names.append(self._n(name))

    def write_record(self, items: List[Expr], name: str = "w") -> None:
        e = rlc_chip_record([to_expr(i) for i in items])
        assert e.degree() == 1, "write_record must be linear"
        self.w_expressions.append(e)
        self.w_names.append(self._n(name))

    def lk_record(self, rom_type: int, items: List[Expr], name: str = "lk") -> None:
        e = rlc_chip_record([Constant(rom_type)] + [to_expr(i) for i in items])
        assert e.degree() == 1, "lk_record must be linear"
        self.lk_expressions.append(e)
        self.lk_names.append(self._n(name))
        self.lk_raw.append((rom_type, [to_expr(i) for i in items]))

    def lk_table_record(
        self, rom_type: int, table_len: int, items: List[Expr], multiplicity: Expr,
        name: str = "lk_table",
    ) -> None:
        e = rlc_chip_record([Constant(rom_type)] + [to_expr(i) for i in items])
        assert e.degree() == 1
        self.lk_table_expressions.append(
            LogupTableExpression(multiplicity, e, table_len)
        )
        self.lk_table_raw.append((rom_type, [to_expr(i) for i in items], multiplicity))

    def r_table_record(
        self, items: List[Expr], spec: SetTableSpec, name: str = "r_table"
    ) -> None:
        e = rlc_chip_record([to_expr(i) for i in items])
        assert e.degree() == 1
        self.r_table_expressions.append(SetTableExpression(e, spec))

    def w_table_record(
        self, items: List[Expr], spec: SetTableSpec, name: str = "w_table"
    ) -> None:
        e = rlc_chip_record([to_expr(i) for i in items])
        assert e.degree() == 1
        self.w_table_expressions.append(SetTableExpression(e, spec))

    # -- assertions -----------------------------------------------------------

    def require_zero(self, expr: Expr, name: str = "zero") -> None:
        expr = to_expr(expr)
        d = expr.degree()
        if d <= 1:
            self.assert_zero_expressions.append(expr)
            self.assert_zero_names.append(self._n(name))
        else:
            self.max_non_lc_degree = max(self.max_non_lc_degree, d)
            self.assert_zero_sumcheck_expressions.append(expr)
            self.assert_names.append(self._n(name))

    def require_equal(self, a, b, name: str = "eq") -> None:
        self.require_zero(to_expr(a) - to_expr(b), name)

    def require_one(self, e, name: str = "one") -> None:
        self.require_zero(to_expr(e) - 1, name)

    def condition_require_equal(self, cond, a, b, name: str = "cond_eq") -> None:
        """cond * (a - b) == 0 (chip_handler/general.rs condition_require_equal)."""
        self.require_zero(to_expr(cond) * (to_expr(a) - to_expr(b)), name)

    def select(self, cond, a, b) -> Expr:
        """cond ? a : b as cond*a + (1-cond)*b (chip_handler select)."""
        cond, a, b = to_expr(cond), to_expr(a), to_expr(b)
        return cond * a + (Constant(1) - cond) * b

    def fingerprint(self) -> int:
        """Structural hash: identical circuits share jit kernels (frozen
        dataclass expressions hash by value)."""
        if not hasattr(self, "_fp"):
            self._fp = hash((
                self.num_witin, self.num_fixed, self.num_structural_witin,
                tuple(self.r_expressions), tuple(self.w_expressions),
                tuple(self.lk_expressions),
                tuple((x.expr, x.table_spec.len, tuple(x.table_spec.structural_witins))
                      for x in self.r_table_expressions),
                tuple((x.expr, x.table_spec.len, tuple(x.table_spec.structural_witins))
                      for x in self.w_table_expressions),
                tuple((x.multiplicity, x.values, x.table_len)
                      for x in self.lk_table_expressions),
                tuple(self.assert_zero_expressions),
                tuple(self.assert_zero_sumcheck_expressions),
            ))
        return self._fp


class _Namespace:
    """Pushes a name onto the CS namespace stack for the `with` body."""

    def __init__(self, cs: ConstraintSystem, name: str):
        self.cs = cs
        self.name = name

    def __enter__(self):
        self.cs._ns.append(self.name)
        return self.cs

    def __exit__(self, *exc):
        self.cs._ns.pop()
        return False


class CircuitBuilder:
    """Thin namespaced wrapper (the reference separates CS and CB; we keep
    the CS as `.cs` and forward)."""

    def __init__(self, cs: ConstraintSystem):
        self.cs = cs

    def __getattr__(self, item):
        return getattr(self.cs, item)
