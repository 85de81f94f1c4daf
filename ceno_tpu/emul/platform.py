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

# SP1-compatible preset (e2e.rs:176-184): the stack section is not in the
# ELF headers, so the stack-top constant is repeated here; ecalls other than
# HALT/KECCAK become no-ops.
SP1_PLATFORM = Platform(stack=(0x0020_0400, 0x0020_0400), unsafe_ecall_nop=True)

PRESETS = {"ceno": CENO_PLATFORM, "sp1": SP1_PLATFORM}


def setup_platform(
    preset,
    program,
    stack_size: int = 32768,
    heap_size: int = 2 * 1024 * 1024,
    pub_io_size: int = 64,
) -> Platform:
    """Derive the concrete platform from a preset + the program image +
    declared stack/heap/pub-io sizes ONLY (no execution involved), mirroring
    /root/reference/ceno_zkvm/src/e2e.rs:169-212 `setup_platform`:

    * stack  = [preset.stack_end - stack_size, preset.stack_end)
    * heap   = [max(image)+4, +heap_size), then extended so that
      |prog_data| + |stack| + |heap| is a power of two (MemPadder analog)
    * rom    = [base, base + 4*len(instructions))
    * public_io sized to the next power of two of pub_io_size

    Sizes are in bytes and must be word multiples.  The resulting static
    memory layout (program data + stack + heap) is a pure function of
    (program, sizes), so the verifying key does not depend on any run.
    """
    base = preset if isinstance(preset, Platform) else PRESETS[preset]
    for sz in (stack_size, heap_size):
        assert sz % WORD_SIZE == 0, "sizes must be word multiples"
    prog_data = {a & ~0x3 for a in program.image}
    stack = (base.stack[1] - stack_size, base.stack[1])
    # image-less (synthesized) programs fall back to the preset's heap start
    # so the heap cannot collide with the pub-io/hints windows
    heap_start = (max(program.image) + WORD_SIZE) if program.image else base.heap[0]
    heap_end = heap_start + heap_size
    mem_words = (len(prog_data) + (stack[1] - stack[0]) // WORD_SIZE
                 + (heap_end - heap_start) // WORD_SIZE)
    pad_words = (1 << max(0, (mem_words - 1).bit_length())) - mem_words
    heap_end += pad_words * WORD_SIZE
    assert heap_end <= 0xFFFF_FFFF, "not enough space for padding; reduce heap"
    pub_io_bytes = 1 << max(2, (pub_io_size - 1).bit_length() if pub_io_size > 1 else 2)
    return Platform(
        rom=(program.base_address,
             program.base_address + WORD_SIZE * len(program.instructions)),
        prog_data=prog_data,
        stack=stack,
        heap=(heap_start, heap_end),
        public_io=(base.public_io[0], base.public_io[0] + pub_io_bytes),
        hints=base.hints,
        unsafe_ecall_nop=base.unsafe_ecall_nop,
    )
