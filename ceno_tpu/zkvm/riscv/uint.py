"""UInt limb framework: circuit-side M-bit integers + witness-side values.

Mirrors /root/reference/ceno_zkvm/src/uint.rs (UIntLimbs<M, C, E>, default
UInt = 32/16) and uint/arithmetic.rs:18-264:

* a UInt is M/C little-endian C-bit limbs, each either a range-checked
  witness column or an arbitrary expression;
* `add`/`add_const`/`sub` introduce one carry/borrow *bit* witness per limb
  and keep the RESULT limbs as expressions
  ``r_i = a_i + b_i + carry_{i-1} - carry_i * 2^C`` which are range-checked
  directly via C-bit lookups (no extra witness columns — the reference's
  key trick, uint/arithmetic.rs:18-95);
* `mul` uses witnessed product limbs with range-checked column carries
  (uint/arithmetic.rs:213-264) via gadgets.MulLimbConfig;
* the witness-side `Value` mirror (uint/util.rs) computes limb
  decompositions and add/mul carries vectorized over the instance axis.

Adopted across the opcode circuits (arith, SLT/SLTI/SLTIU, shifts, JALR,
MUL and DIV families — mirroring the reference where every circuit sits on
UIntLimbs, uint.rs:81); byte-granular circuits (logic, load/store subword)
use U8 decompositions that have no UIntLimbs analog either.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ..circuit_builder import ConstraintSystem, ROMType
from ..expression import Constant, Expr, WitIn, to_expr
from ..witness import LkMultiplicity, WitnessMatrix
from .gadgets import MulLimbConfig

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
UINT_LIMBS = 2  # UInt = UIntLimbs<32, 16>


# ---------------------------------------------------------------------------
# witness-side Value mirror (vectorized over the instance axis)
# ---------------------------------------------------------------------------


class Value:
    """Static numpy helpers for limb math (uint/util.rs `Value`)."""

    @staticmethod
    def limbs(vals: np.ndarray, n: int = UINT_LIMBS) -> List[np.ndarray]:
        v = np.asarray(vals, dtype=np.uint64)
        return [(v >> np.uint64(LIMB_BITS * i)) & np.uint64(LIMB_MASK)
                for i in range(n)]

    @staticmethod
    def from_limbs(limbs: List[np.ndarray]) -> np.ndarray:
        acc = np.zeros_like(np.asarray(limbs[0], dtype=np.uint64))
        for i, l in enumerate(limbs):
            acc |= np.asarray(l, dtype=np.uint64) << np.uint64(LIMB_BITS * i)
        return acc

    @staticmethod
    def add_carries(a: List[np.ndarray], b: List[np.ndarray]) -> List[np.ndarray]:
        """Per-limb running carry bits of a + b."""
        carries, prev = [], None
        for i in range(len(a)):
            t = a[i] + b[i] + (prev if prev is not None else 0)
            prev = t >> np.uint64(LIMB_BITS)
            carries.append(prev)
        return carries

    @staticmethod
    def sub_borrows(a: List[np.ndarray], b: List[np.ndarray]) -> List[np.ndarray]:
        """Per-limb running borrow bits of a - b."""
        borrows, prev = [], None
        for i in range(len(a)):
            d = a[i].astype(np.int64) - b[i].astype(np.int64) - (
                prev.astype(np.int64) if prev is not None else 0)
            prev = (d < 0).astype(np.uint64)
            borrows.append(prev)
        return borrows


# ---------------------------------------------------------------------------
# circuit-side UInt
# ---------------------------------------------------------------------------


@dataclass
class UInt:
    """M-bit integer as limb expressions; `witins` non-empty when backed by
    witness columns (then `assign` writes them)."""

    limbs: List[Expr]
    witins: List[WitIn] = field(default_factory=list)
    range_checked: bool = False

    # -- construction -------------------------------------------------------

    @staticmethod
    def new(cs: ConstraintSystem, name: str = "u", n: int = UINT_LIMBS) -> "UInt":
        """Witness limbs, each range-checked via a C-bit lookup (uint.rs new)."""
        ws = [cs.create_witin(f"{name}_l{i}") for i in range(n)]
        for w in ws:
            cs.lk_record(ROMType.U16, [w], name=f"{name}_range")
        return UInt([to_expr(w) for w in ws], ws, True)

    @staticmethod
    def new_unchecked(cs: ConstraintSystem, name: str = "u", n: int = UINT_LIMBS) -> "UInt":
        """Witness limbs with NO range check — for values whose range is
        guaranteed elsewhere (e.g. register reads already constrained by the
        RAM multiset, uint.rs new_unchecked)."""
        ws = [cs.create_witin(f"{name}_l{i}") for i in range(n)]
        return UInt([to_expr(w) for w in ws], ws, False)

    @staticmethod
    def from_exprs(exprs: List[Expr]) -> "UInt":
        return UInt([to_expr(e) for e in exprs])

    # -- views ----------------------------------------------------------------

    def expr(self) -> List[Expr]:
        return list(self.limbs)

    def value(self) -> Expr:
        """Full-width value as one expression (uint.rs value())."""
        acc = None
        for i, l in enumerate(self.limbs):
            term = l * Constant(1 << (LIMB_BITS * i)) if i else l
            acc = term if acc is None else acc + term
        return acc

    # -- arithmetic -----------------------------------------------------------

    def add(self, cs: ConstraintSystem, other: "UInt", name: str = "add",
            range_check: bool = True) -> Tuple["UInt", List[WitIn]]:
        """self + other mod 2^M: carry-bit witnesses, expression result limbs
        (uint/arithmetic.rs:18-95)."""
        n = len(self.limbs)
        carries = [cs.create_witin(f"{name}_carry_{i}") for i in range(n)]
        for c in carries:
            cs.require_zero(c * c - c, f"{name}_carry_bit")
        out = []
        for i in range(n):
            e = self.limbs[i] + other.limbs[i] - carries[i] * Constant(1 << LIMB_BITS)
            if i > 0:
                e = e + carries[i - 1]
            out.append(e)
            if range_check:
                cs.lk_record(ROMType.U16, [e], name=f"{name}_limb_range")
        return UInt(out, range_checked=range_check), carries

    def sub(self, cs: ConstraintSystem, other: "UInt", name: str = "sub",
            range_check: bool = True) -> Tuple["UInt", List[WitIn]]:
        """self - other mod 2^M with borrow bits: r_i = a_i - b_i
        + borrow_i*2^C - borrow_{i-1}."""
        n = len(self.limbs)
        borrows = [cs.create_witin(f"{name}_borrow_{i}") for i in range(n)]
        for b in borrows:
            cs.require_zero(b * b - b, f"{name}_borrow_bit")
        out = []
        for i in range(n):
            e = self.limbs[i] - other.limbs[i] + borrows[i] * Constant(1 << LIMB_BITS)
            if i > 0:
                e = e - borrows[i - 1]
            out.append(e)
            if range_check:
                cs.lk_record(ROMType.U16, [e], name=f"{name}_limb_range")
        return UInt(out, range_checked=range_check), borrows

    def add_const(self, cs: ConstraintSystem, const: int, name: str = "addc",
                  range_check: bool = True) -> Tuple["UInt", List[WitIn]]:
        """self + compile-time constant (uint/arithmetic.rs add_const)."""
        n = len(self.limbs)
        const_limbs = [(const >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)]
        other = UInt([Constant(c) for c in const_limbs])
        return self.add(cs, other, name, range_check)

    def mul(self, cs: ConstraintSystem, other: "UInt", name: str = "mul",
            with_hi: bool = True) -> Tuple["UInt", "UInt", MulLimbConfig]:
        """self * other -> (lo 32-bit UInt, hi 32-bit UInt) via witnessed
        product limbs + range-checked column carries
        (uint/arithmetic.rs:213-264, gadgets.MulLimbConfig)."""
        assert len(self.limbs) == 2 and len(other.limbs) == 2
        cfg = MulLimbConfig.construct(cs, self.limbs, other.limbs, name, with_hi)
        lo = UInt([to_expr(w) for w in cfg.lo], cfg.lo, True)
        hi = (UInt([to_expr(w) for w in cfg.hi], cfg.hi, True)
              if with_hi else UInt([Constant(0), Constant(0)]))
        return lo, hi, cfg

    # -- assignment -------------------------------------------------------------

    def assign(self, wm: WitnessMatrix, lkm: Optional[LkMultiplicity],
               values: np.ndarray) -> List[np.ndarray]:
        """Write witness limbs from full-width values; count range lookups
        when this UInt was created range-checked.  Returns the limbs."""
        assert self.witins, "assign requires witness-backed limbs"
        limbs = Value.limbs(values, len(self.witins))
        for w, l in zip(self.witins, limbs):
            wm.set(w, l)
            if self.range_checked:
                assert lkm is not None
                lkm.assert_ux(LIMB_BITS, l)
        return limbs


def assign_carries(wm: WitnessMatrix, carries: List[WitIn],
                   bits: List[np.ndarray]) -> None:
    for w, b in zip(carries, bits):
        wm.set(w, b)


def range_check_result(lkm: LkMultiplicity, result_values: np.ndarray,
                       n: int = UINT_LIMBS) -> None:
    """Count the U16 lookups of expression result limbs (add/sub paths)."""
    for l in Value.limbs(result_values, n):
        lkm.assert_ux(LIMB_BITS, l)
