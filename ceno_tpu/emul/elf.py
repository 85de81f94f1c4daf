"""Minimal ELF32 loader (risc0-derived semantics, mirrors
/root/reference/ceno_emul/src/elf.rs:32-174): collect PT_LOAD segments into a
word-addressed image, decode the executable words, record entry/base."""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List

from .insn import Instruction, decode_instruction
from .platform import WORD_SIZE


@dataclass
class Program:
    entry: int
    base_address: int
    instructions: List[Instruction]
    image: Dict[int, int] = field(default_factory=dict)  # byte addr -> word

    @staticmethod
    def from_instructions(entry: int, instructions: List[Instruction]) -> "Program":
        return Program(entry, entry, list(instructions), {})


def load_elf(data: bytes, max_mem: int = 0xFFFF_0000) -> Program:
    """Parse an ELF32 RISC-V executable into a Program."""
    assert data[:4] == b"\x7fELF", "not an ELF file"
    assert data[4] == 1, "not ELF32"
    assert data[5] == 1, "not little-endian"
    (e_type, e_machine, _ver, e_entry, e_phoff, _shoff, _flags, _ehsize,
     e_phentsize, e_phnum) = struct.unpack_from("<HHIIIIIHHH", data, 16)
    assert e_machine == 0xF3, "not RISC-V"

    image: Dict[int, int] = {}
    exec_ranges = []
    for i in range(e_phnum):
        off = e_phoff + i * e_phentsize
        (p_type, p_offset, p_vaddr, _p_paddr, p_filesz, p_memsz, p_flags,
         _p_align) = struct.unpack_from("<IIIIIIII", data, off)
        if p_type != 1:  # PT_LOAD
            continue
        assert p_vaddr % WORD_SIZE == 0, "unaligned segment"
        seg = data[p_offset : p_offset + p_filesz]
        seg = seg + b"\x00" * ((-len(seg)) % 4)
        for j in range(0, len(seg), 4):
            (word,) = struct.unpack_from("<I", seg, j)
            image[p_vaddr + j] = word
        # zero-init the bss tail
        for j in range(len(seg), (p_memsz + 3) & ~3, 4):
            image[p_vaddr + j] = 0
        if p_flags & 0x1:  # PF_X
            exec_ranges.append((p_vaddr, p_vaddr + p_filesz))

    base = min(r[0] for r in exec_ranges) if exec_ranges else e_entry
    end = max(r[1] for r in exec_ranges) if exec_ranges else e_entry
    instructions = []
    for addr in range(base, end, 4):
        word = image.get(addr, 0)
        instructions.append(decode_instruction(word, addr))
    return Program(e_entry, base, instructions, image)
