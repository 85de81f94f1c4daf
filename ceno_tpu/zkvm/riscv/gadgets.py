"""Circuit gadgets (mirrors /root/reference/ceno_zkvm/src/gadgets/).

AssertLtConfig: constrain lhs < rhs via u16-limb decomposition of
rhs - lhs - 1... — exactly the reference's InnerLtConfig with is_lt pinned
to 1 (is_lt.rs:23-296): witness diff = lhs - rhs + 2^(16*limbs), u16 limbs
range-checked, require lhs - rhs == diff - 2^(16*limbs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..circuit_builder import ConstraintSystem, ROMType
from ..expression import Constant, Expr, WitIn
from ..witness import LkMultiplicity, WitnessMatrix

UINT_LIMBS = 2  # 32-bit values as 2 x 16-bit limbs


@dataclass
class AssertLtConfig:
    diff: List[WitIn]
    max_num_u16_limbs: int

    @staticmethod
    def construct(
        cs: ConstraintSystem, lhs: Expr, rhs: Expr, max_num_u16_limbs: int = UINT_LIMBS
    ) -> "AssertLtConfig":
        diff = []
        for i in range(max_num_u16_limbs):
            w = cs.create_witin(f"lt_diff_{i}")
            cs.lk_record(ROMType.U16, [w])
            diff.append(w)
        diff_expr = None
        pow16 = 1
        for w in diff:
            term = w * Constant(pow16)
            diff_expr = term if diff_expr is None else diff_expr + term
            pow16 = (pow16 << 16)
        rng = 1 << (16 * max_num_u16_limbs)
        # lhs - rhs == diff - range  (is_lt == 1)
        cs.require_zero((lhs - rhs) - (diff_expr - Constant(rng)), "assert_lt")
        return AssertLtConfig(diff, max_num_u16_limbs)

    def assign(
        self, wm: WitnessMatrix, lkm: LkMultiplicity, lhs: np.ndarray, rhs: np.ndarray
    ) -> None:
        """lhs/rhs: u64 arrays with lhs < rhs (cycle ordering)."""
        rng = 1 << (16 * self.max_num_u16_limbs)
        diff = (np.asarray(lhs, dtype=np.int64) - np.asarray(rhs, dtype=np.int64)) + rng
        assert (diff >= 0).all() and (diff < rng).all(), "assert_lt violated"
        d = diff.astype(np.uint64)
        for i, w in enumerate(self.diff):
            limb = (d >> np.uint64(16 * i)) & np.uint64(0xFFFF)
            wm.set(w, limb)
            lkm.assert_ux(16, limb)


@dataclass
class MsbConfig:
    """Sign-bit extraction from a u16 high limb (signed_ext.rs analog):
    high = msb*2^15 + rem with rem 15-bit (checked via U16 lookup of 2*rem)."""

    msb: WitIn
    rem: WitIn

    @staticmethod
    def construct(cs: ConstraintSystem, high_limb: Expr, name: str = "msb") -> "MsbConfig":
        msb = cs.create_witin(f"{name}_bit")
        rem = cs.create_witin(f"{name}_rem")
        cs.require_zero(msb * msb - msb, f"{name}_bool")
        cs.lk_record(ROMType.U16, [rem * Constant(2)])
        cs.require_zero(high_limb - msb * Constant(1 << 15) - rem, f"{name}_decomp")
        return MsbConfig(msb, rem)

    def assign(self, wm: WitnessMatrix, lkm: LkMultiplicity, high_limbs: np.ndarray) -> None:
        h = np.asarray(high_limbs, dtype=np.uint64)
        msb = h >> np.uint64(15)
        rem = h & np.uint64(0x7FFF)
        wm.set(self.msb, msb)
        wm.set(self.rem, rem)
        lkm.assert_ux(16, rem * np.uint64(2))


@dataclass
class LtConfig:
    """is_lt as a witness bit (IsLtConfig, is_lt.rs:23-296):
    lhs - rhs == diff - is_lt*2^32 with diff u32 (2 x U16 lookups).
    Sound for any lhs/rhs expressions whose integer values lie in
    (-2^31, 2^32) with |lhs - rhs| < 2^32 (u32 or signed-i32 views)."""

    is_lt: WitIn
    diff: List[WitIn]

    @staticmethod
    def construct(cs: ConstraintSystem, lhs: Expr, rhs: Expr, name: str = "lt") -> "LtConfig":
        is_lt = cs.create_witin(f"{name}_bit")
        cs.require_zero(is_lt * is_lt - is_lt, f"{name}_bool")
        diff = []
        diff_expr = None
        pow16 = 1
        for i in range(UINT_LIMBS):
            w = cs.create_witin(f"{name}_diff_{i}")
            cs.lk_record(ROMType.U16, [w])
            diff.append(w)
            term = w * Constant(pow16)
            diff_expr = term if diff_expr is None else diff_expr + term
            pow16 <<= 16
        cs.require_zero(
            (lhs - rhs) - (diff_expr - is_lt * Constant(1 << 32)), f"{name}_lt"
        )
        return LtConfig(is_lt, diff)

    def assign(
        self, wm: WitnessMatrix, lkm: LkMultiplicity, lhs: np.ndarray, rhs: np.ndarray
    ) -> np.ndarray:
        """lhs/rhs as int64 arrays (signed values allowed); returns the bit."""
        a = np.asarray(lhs, dtype=np.int64)
        b = np.asarray(rhs, dtype=np.int64)
        lt = (a < b).astype(np.uint64)
        d = (a - b + (lt.astype(np.int64) << 32)).astype(np.uint64)
        wm.set(self.is_lt, lt)
        for i, w in enumerate(self.diff):
            limb = (d >> np.uint64(16 * i)) & np.uint64(0xFFFF)
            wm.set(w, limb)
            lkm.assert_ux(16, limb)
        return lt


@dataclass
class IsZeroConfig:
    """is_zero via inverse witness (is_zero.rs:11-110)."""

    is_zero: WitIn
    inv: WitIn

    @staticmethod
    def construct(cs: ConstraintSystem, x: Expr, name: str = "zero") -> "IsZeroConfig":
        z = cs.create_witin(f"{name}_is")
        inv = cs.create_witin(f"{name}_inv")
        cs.require_zero(z - (Constant(1) - x * inv), f"{name}_def")
        cs.require_zero(x * z, f"{name}_prod")
        return IsZeroConfig(z, inv)

    def assign(self, wm: WitnessMatrix, x_vals: np.ndarray) -> np.ndarray:
        P = 0xFFFFFFFF00000001
        x = np.asarray(x_vals, dtype=np.uint64)
        z = (x == 0).astype(np.uint64)
        inv = np.asarray(
            [0 if int(v) == 0 else pow(int(v), P - 2, P) for v in x], dtype=np.uint64
        )
        wm.set(self.is_zero, z)
        wm.set(self.inv, inv)
        return z


@dataclass
class MulLimbConfig:
    """32x32 -> 64-bit limbed multiply (uint/arithmetic.rs mul carries):
    a*b = lo + hi*2^32 with u16 column sums and range-checked carries.
    `with_hi=False` additionally forces the high word to zero (product < 2^32,
    the DIV quotient*divisor case)."""

    lo: List[WitIn]
    hi: List[WitIn]  # empty when with_hi=False
    c0: WitIn
    c1_lo: WitIn
    c1_hi: WitIn

    @staticmethod
    def construct(
        cs: ConstraintSystem,
        a: List[Expr],
        b: List[Expr],
        name: str = "mul",
        with_hi: bool = True,
    ) -> "MulLimbConfig":
        lo = [cs.create_witin(f"{name}_lo{i}") for i in range(2)]
        hi = [cs.create_witin(f"{name}_hi{i}") for i in range(2)] if with_hi else []
        c0 = cs.create_witin(f"{name}_c0")
        c1_lo = cs.create_witin(f"{name}_c1lo")
        c1_hi = cs.create_witin(f"{name}_c1hi")
        for w in lo + hi + [c0, c1_lo]:
            cs.lk_record(ROMType.U16, [w + Constant(0)])
        cs.require_zero(c1_hi * c1_hi - c1_hi, f"{name}_c1hi_bool")
        c1 = c1_lo + c1_hi * Constant(1 << 16)
        cs.require_zero(a[0] * b[0] - lo[0] - c0 * Constant(1 << 16), f"{name}_col0")
        cs.require_zero(
            a[0] * b[1] + a[1] * b[0] + c0 - lo[1] - c1 * Constant(1 << 16),
            f"{name}_col1",
        )
        if with_hi:
            cs.require_zero(
                a[1] * b[1] + c1 - hi[0] - hi[1] * Constant(1 << 16), f"{name}_col2"
            )
        else:
            cs.require_zero(a[1] * b[1] + c1, f"{name}_col2")
        return MulLimbConfig(lo, hi, c0, c1_lo, c1_hi)

    def assign(
        self, wm: WitnessMatrix, lkm: LkMultiplicity, a: np.ndarray, b: np.ndarray
    ) -> None:
        """a, b: u32 values as uint64 arrays."""
        a = np.asarray(a, dtype=np.uint64)
        b = np.asarray(b, dtype=np.uint64)
        a0, a1 = a & np.uint64(0xFFFF), a >> np.uint64(16)
        b0, b1 = b & np.uint64(0xFFFF), b >> np.uint64(16)
        t0 = a0 * b0
        c0 = t0 >> np.uint64(16)
        lo0 = t0 & np.uint64(0xFFFF)
        t1 = a0 * b1 + a1 * b0 + c0
        c1 = t1 >> np.uint64(16)
        lo1 = t1 & np.uint64(0xFFFF)
        t2 = a1 * b1 + c1
        vals = {self.lo[0]: lo0, self.lo[1]: lo1, self.c0: c0,
                self.c1_lo: c1 & np.uint64(0xFFFF)}
        wm.set(self.c1_hi, c1 >> np.uint64(16))
        if self.hi:
            vals[self.hi[0]] = t2 & np.uint64(0xFFFF)
            vals[self.hi[1]] = t2 >> np.uint64(16)
        else:
            assert (t2 == 0).all(), "mul high word must be zero"
        for w, v in vals.items():
            wm.set(w, v)
            lkm.assert_ux(16, v)
