"""Host-side guest plumbing (ceno_host analog).

Mirrors /root/reference/ceno_host/src/lib.rs:
* `CenoStdin` — a hints buffer serialized into the hints region
  (0x4000_0000, platform.rs) before the run; the reference uses rkyv with an
  aligned item table (lib.rs:17-128) — here the wire format is simple
  u32-length-prefixed little-endian frames followed by a u32 item count
  trailer at the region start (documented deviation: no Rust rkyv consumers
  exist on the TPU build, the emulator is the only reader);
* `run` — load, init hints, run to halt, collect messages (lib.rs:130-152);
* `read_all_messages` — length-prefixed guest->host messages at the info_out
  region 0xC000_0000 (ceno_emul/src/host_utils.rs:1-29).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence, Tuple

from ..emul import Program, VMState
from ..emul.platform import CENO_PLATFORM, Platform

INFO_OUT_ADDR = 0xC000_0000


class CenoStdin:
    """Hints buffer: items are raw bytes (or ints encoded as u32 LE)."""

    def __init__(self):
        self.items: List[bytes] = []

    def write(self, item) -> "CenoStdin":
        if isinstance(item, int):
            item = struct.pack("<I", item & 0xFFFFFFFF)
        self.items.append(bytes(item))
        return self

    def finalise(self) -> bytes:
        """[u32 count][per item: u32 len + padded payload]"""
        out = [struct.pack("<I", len(self.items))]
        for item in self.items:
            out.append(struct.pack("<I", len(item)))
            out.append(item)
            out.append(b"\x00" * (-len(item) % 4))
        return b"".join(out)

    @staticmethod
    def from_raw(data: bytes) -> "RawHints":
        """bin/e2e.rs --hints: a raw file mapped as a memory segment,
        zero-padded to the next power-of-two size."""
        return RawHints(data)

    def memory_image(self, platform: Platform = CENO_PLATFORM) -> dict:
        """waddr -> word image of the serialized buffer in the hints region."""
        blob = self.finalise()
        base = platform.hints[0]
        image = {}
        for i in range(0, len(blob), 4):
            word = int.from_bytes(blob[i : i + 4].ljust(4, b"\x00"), "little")
            image[(base + i) >> 2] = word
        return image


class RawHints:
    """A raw byte blob mapped into the hints segment, zero-padded to the
    next power-of-two word count (bin/e2e.rs --hints semantics)."""

    def __init__(self, data: bytes):
        self.data = bytes(data)

    def memory_image(self, platform: Platform = CENO_PLATFORM) -> dict:
        n_words = max(1, (len(self.data) + 3) // 4)
        n_words = 1 << (n_words - 1).bit_length()
        blob = self.data.ljust(4 * n_words, b"\x00")
        base = platform.hints[0]
        return {
            (base + i) >> 2: int.from_bytes(blob[i : i + 4], "little")
            for i in range(0, len(blob), 4)
        }


def read_all_messages(vm: VMState) -> List[bytes]:
    """Length-prefixed messages starting at 0xC000_0000 (host_utils.rs)."""
    out = []
    addr = INFO_OUT_ADDR
    while True:
        length = vm.peek_memory(addr >> 2)
        if length == 0:
            break
        data = bytearray()
        for i in range((length + 3) // 4):
            data += vm.peek_memory((addr + 4 + 4 * i) >> 2).to_bytes(4, "little")
        out.append(bytes(data[:length]))
        addr += 4 + ((length + 3) & ~3)
    return out


def run(
    platform: Platform,
    program: Program,
    hints: Optional[CenoStdin] = None,
    max_steps: int = 1 << 20,
) -> Tuple[VMState, list, List[bytes]]:
    """Load + init hints + run to halt; returns (vm, steps, messages)."""
    vm = VMState(platform, program)
    if hints is not None:
        image = hints.memory_image(platform)
        for waddr, word in image.items():
            vm.memory[waddr] = word
        vm._hints_image = image  # the HINTS_MEM table's committed init values
    steps = list(vm.iter_until_halt(max_steps))
    return vm, steps, read_all_messages(vm)
