"""Execution tracing: StepRecord per instruction with 4 subcycles.

Mirrors /root/reference/ceno_emul/src/tracer.rs: cycle 0 = init, program
starts at cycle 4, each instruction advances by 4; subcycles rs1=+0, rs2=+1,
rd=+2, mem=+3; registers unified with memory via VMA idx<<8; every op
records the previous access cycle of its address.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from .insn import Instruction
from .platform import Platform


@dataclass(frozen=True)
class Change:
    before: int
    after: int


@dataclass(frozen=True)
class MemOp:
    addr: int  # WordAddr for memory; register VMA>>2 for registers
    value: object  # int (read) or Change (write)
    previous_cycle: int


@dataclass
class StepRecord:
    cycle: int = 4
    pc: Change = Change(0, 0)
    insn: Instruction = Instruction()
    rs1: Optional[MemOp] = None
    rs2: Optional[MemOp] = None
    rd: Optional[MemOp] = None
    memory_op: Optional[MemOp] = None
    syscall: Optional[object] = None


SUBCYCLE_RS1 = 0
SUBCYCLE_RS2 = 1
SUBCYCLE_RD = 2
SUBCYCLE_MEM = 3
SUBCYCLES_PER_INSN = 4


class Tracer:
    def __init__(self):
        self.record = StepRecord(cycle=SUBCYCLES_PER_INSN)
        self.latest_accesses: Dict[int, int] = {}

    def advance(self) -> StepRecord:
        rec = self.record
        self.record = StepRecord(cycle=rec.cycle + SUBCYCLES_PER_INSN)
        return rec

    def store_pc(self, pc: int) -> None:
        self.record.pc = Change(self.record.pc.before, pc)

    def fetch(self, pc_waddr: int, insn: Instruction) -> None:
        self.record.pc = Change(pc_waddr << 2, self.record.pc.after)
        self.record.insn = insn

    def load_register(self, idx: int, value: int) -> None:
        addr = Platform.register_vma(idx) >> 2
        if self.record.rs1 is None and self.record.rs2 is None:
            self.record.rs1 = MemOp(addr, value, self.track_access(addr, SUBCYCLE_RS1))
        elif self.record.rs2 is None:
            self.record.rs2 = MemOp(addr, value, self.track_access(addr, SUBCYCLE_RS2))
        else:
            raise RuntimeError("only two register reads per step")

    def store_register(self, idx: int, change: Change) -> None:
        assert self.record.rd is None, "only one register write per step"
        addr = Platform.register_vma(idx) >> 2
        self.record.rd = MemOp(addr, change, self.track_access(addr, SUBCYCLE_RD))

    def load_memory(self, waddr: int, value: int) -> None:
        self.store_memory(waddr, Change(value, value))

    def store_memory(self, waddr: int, change: Change) -> None:
        assert self.record.memory_op is None, "only one memory op per step"
        self.record.memory_op = MemOp(
            waddr, change, self.track_access(waddr, SUBCYCLE_MEM)
        )

    def track_syscall(self, effects) -> None:
        witness = effects.finalize(self)
        assert self.record.syscall is None
        self.record.syscall = witness

    def track_access(self, addr: int, subcycle: int) -> int:
        prev = self.latest_accesses.get(addr, 0)
        self.latest_accesses[addr] = self.record.cycle + subcycle
        return prev

    def final_accesses(self) -> Dict[int, int]:
        return self.latest_accesses

    def cycle(self) -> int:
        return self.record.cycle
