"""Witness assignment: row-major matrices and lookup multiplicities.

Mirrors /root/reference/ceno_zkvm/src/witness.rs (RowMajorMatrix with pow2
instance padding, LkMultiplicity per ROMType).  TPU-native: assignment is
vectorized with numpy over the instance axis (struct-of-arrays extracted from
StepRecords), then shipped to the device once as Gl columns.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List

import numpy as np

from ..field import gl
from ..field.gl import Gl

P = gl.P


class LkMultiplicity:
    """Per-ROMType value multiset (witness.rs:125-185)."""

    def __init__(self):
        self.counts: Dict[int, Counter] = {}

    def assert_ux(self, bits: int, values: np.ndarray) -> None:
        from .circuit_builder import ROMType

        rom = {5: ROMType.U5, 8: ROMType.U8, 14: ROMType.U14, 16: ROMType.U16}[bits]
        self.increment_many(rom, values)

    def increment_many(self, rom_type: int, values) -> None:
        c = self.counts.setdefault(rom_type, Counter())
        arr = np.asarray(values).reshape(-1)
        uniq, cnt = np.unique(arr, return_counts=True)
        for v, n in zip(uniq, cnt):
            c[int(v)] += int(n)

    def increment(self, rom_type: int, value: int, times: int = 1) -> None:
        self.counts.setdefault(rom_type, Counter())[int(value)] += times

    def merge(self, other: "LkMultiplicity") -> None:
        for rom, c in other.counts.items():
            mine = self.counts.setdefault(rom, Counter())
            mine.update(c)


class WitnessMatrix:
    """(num_cols, num_instances) uint64 matrix; columns indexed by WitIn id.

    Padding strategy 'default' zero-pads to the next power of two; 'last'
    repeats the final instance row (used by some tables); a callable is
    InstancePaddingStrategy::Custom (witness.rs:45-49): called as
    fn(row_index_array, col_index) -> uint64 values for the pad rows of
    each column (e.g. structural address sequences that must keep counting
    past the real instances)."""

    def __init__(self, num_cols: int, num_instances: int, padding="default"):
        self.num_instances = num_instances
        # min 2: single-instance circuits still get a 1-bit instance axis
        # (reference next_pow2_instance_padding, utils.rs:187-189)
        n = max(2, 1 << (num_instances - 1).bit_length()) if num_instances > 1 else 2
        self.padded = n
        self.data = np.zeros((num_cols, n), dtype=np.uint64)
        self.padding = padding

    def set(self, witin, values) -> None:
        """values: scalar or (num_instances,) array (auto mod P)."""
        col = witin.id if hasattr(witin, "id") else int(witin)
        arr = np.asarray(values, dtype=np.object_) if isinstance(values, (list, tuple)) else values
        if np.isscalar(arr) or getattr(arr, "shape", None) == ():
            self.data[col, : self.num_instances] = np.uint64(int(arr) % P)
        else:
            a = np.asarray([int(v) % P for v in arr], dtype=np.uint64) if (
                isinstance(arr, (list, tuple)) or arr.dtype == np.object_
            ) else np.asarray(arr, dtype=np.uint64)
            self.data[col, : self.num_instances] = a

    def finalize(self) -> None:
        if self.num_instances >= self.padded:
            return
        if self.padding == "last" and self.num_instances > 0:
            self.data[:, self.num_instances :] = self.data[
                :, self.num_instances - 1 : self.num_instances
            ]
        elif callable(self.padding):
            rows = np.arange(self.num_instances, self.padded, dtype=np.uint64)
            for col in range(self.data.shape[0]):
                vals = np.asarray(self.padding(rows, col), dtype=np.uint64) % P
                self.data[col, self.num_instances :] = vals

    def to_columns(self) -> List[Gl]:
        """Device columns, one Gl per WitIn."""
        self.finalize()
        return [gl.from_u64(self.data[i]) for i in range(self.data.shape[0])]


def signed_to_field(v) -> np.ndarray:
    """i64 -> canonical field value (i64_to_base)."""
    arr = np.asarray(v, dtype=np.int64)
    # P doesn't fit in int64; wrapping uint64 add gives arr + P exactly for
    # negative arr (two's complement + P - 2^64 wrap), canonical since |arr| < P
    with np.errstate(over="ignore"):
        wrapped = arr.astype(np.uint64) + np.uint64(P)
    return np.where(arr < 0, wrapped, arr.astype(np.uint64))
