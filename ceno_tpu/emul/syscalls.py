"""SP1-compatible syscalls (mirrors /root/reference/ceno_emul/src/syscalls.rs
and syscalls/keccak_permute.rs): KECCAK_PERMUTE reads 50 words at a0 (25
u64 lanes little-endian), applies keccak-f[1600], writes them back."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from .platform import Platform
from .tracer import Change, MemOp, SUBCYCLE_MEM

KECCAK_PERMUTE = 0x00_01_01_09

KECCAK_WORDS = 50  # 25 u64 lanes as 32-bit words

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
M64 = (1 << 64) - 1


def keccakf(state: List[int]) -> List[int]:
    """keccak-f[1600] over 25 u64 lanes (lane [x][y] at index x + 5y)."""
    a = list(state)
    for rnd in range(24):
        # theta
        c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
        d = [
            c[(x - 1) % 5] ^ (((c[(x + 1) % 5] << 1) | (c[(x + 1) % 5] >> 63)) & M64)
            for x in range(5)
        ]
        a = [(a[i] ^ d[i % 5]) for i in range(25)]
        # rho + pi
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                r = _ROT[x][y]
                v = a[x + 5 * y]
                b[y + 5 * ((2 * x + 3 * y) % 5)] = ((v << r) | (v >> (64 - r))) & M64
        # chi
        a = [
            b[i] ^ ((~b[(i + 1) % 5 + 5 * (i // 5)]) & M64 & b[(i + 2) % 5 + 5 * (i // 5)])
            for i in range(25)
        ]
        # iota
        a[0] ^= _RC[rnd]
    return a


@dataclass
class SyscallWitness:
    mem_ops: List[MemOp]
    reg_ops: List[MemOp]


@dataclass
class SyscallEffects:
    """Deferred state updates + trace ops (syscalls.rs:30-64)."""

    reg_values: List[Tuple[int, int]]
    mem_values: List[Tuple[int, int]]  # (word addr, new value)
    mem_before: List[int]
    reg_reads: List[Tuple[int, int]]
    next_pc: Optional[int] = None

    def finalize(self, tracer) -> SyscallWitness:
        reg_ops = []
        for idx, value in self.reg_reads:
            addr = Platform.register_vma(idx) >> 2
            prev = tracer.track_access(addr, SUBCYCLE_MEM)
            reg_ops.append(MemOp(addr, Change(value, value), prev))
        mem_ops = []
        for (waddr, after), before in zip(self.mem_values, self.mem_before):
            prev = tracer.track_access(waddr, SUBCYCLE_MEM)
            mem_ops.append(MemOp(waddr, Change(before, after), prev))
        return SyscallWitness(mem_ops, reg_ops)


class UnknownSyscallError(RuntimeError):
    pass


def handle_syscall(vm, function: int) -> SyscallEffects:
    if function == KECCAK_PERMUTE:
        return keccak_permute(vm)
    raise UnknownSyscallError(f"unknown syscall {function:#x}")


def keccak_permute(vm) -> SyscallEffects:
    state_ptr = vm.peek_register(Platform.REG_ARG0)
    assert state_ptr % 4 == 0
    waddr = state_ptr >> 2
    words = [vm.peek_memory(waddr + i) for i in range(KECCAK_WORDS)]
    lanes = [
        words[2 * i] | (words[2 * i + 1] << 32) for i in range(25)
    ]
    out = keccakf(lanes)
    new_words = []
    for lane in out:
        new_words.append(lane & 0xFFFFFFFF)
        new_words.append(lane >> 32)
    return SyscallEffects(
        reg_values=[],
        mem_values=[(waddr + i, new_words[i]) for i in range(KECCAK_WORDS)],
        mem_before=words,
        reg_reads=[(Platform.REG_ARG0, state_ptr)],
    )
