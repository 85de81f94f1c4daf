"""VM platform: virtual memory layout + ecall codes.

Mirrors /root/reference/ceno_emul/src/platform.rs:11-132.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Set, Tuple

WORD_SIZE = 4
PC_STEP_SIZE = 4


@dataclass
class Platform:
    rom: Tuple[int, int] = (0x2000_0000, 0x3000_0000)
    prog_data: Set[int] = field(default_factory=set)
    stack: Tuple[int, int] = (0xB000_0000, 0xC000_0000)
    heap: Tuple[int, int] = (0x8000_0000, 0xFFFF_0000)
    public_io: Tuple[int, int] = (0x3000_1000, 0x3000_2000)
    hints: Tuple[int, int] = (0x4000_0000, 0x5000_0000)
    unsafe_ecall_nop: bool = False

    def is_rom(self, addr: int) -> bool:
        return self.rom[0] <= addr < self.rom[1]

    def is_prog_data(self, addr: int) -> bool:
        return (addr & ~0x3) in self.prog_data

    def is_ram(self, addr: int) -> bool:
        return (
            self.stack[0] <= addr < self.stack[1]
            or self.heap[0] <= addr < self.heap[1]
            or self.is_prog_data(addr)
        )

    def is_pub_io(self, addr: int) -> bool:
        return self.public_io[0] <= addr < self.public_io[1]

    def is_hints(self, addr: int) -> bool:
        return self.hints[0] <= addr < self.hints[1]

    def can_read(self, addr: int) -> bool:
        return self.can_write(addr)

    def can_write(self, addr: int) -> bool:
        return self.is_ram(addr) or self.is_pub_io(addr) or self.is_hints(addr)

    @staticmethod
    def register_vma(idx: int) -> int:
        return idx << 8

    @staticmethod
    def register_index(vma: int) -> int:
        return vma >> 8

    def pc_base(self) -> int:
        return self.rom[0]

    # ecall conventions
    REG_ECALL = 5  # t0
    REG_ARG0 = 10  # a0
    REG_ARG1 = 11  # a1
    ECALL_HALT = 0
    CODE_SUCCESS = 0


CENO_PLATFORM = Platform()
