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
