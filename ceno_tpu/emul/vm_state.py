"""The RISC-V virtual machine state + step execution.

Mirrors /root/reference/ceno_emul/src/vm_state.rs (sparse word memory, 33
registers incl. the RD_NULL dark-write register, busy-loop detection) and
rv32im.rs step semantics (step_compute/branch/load/store/system).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

from .insn import (
    BRANCH,
    COMPUTE,
    LOAD,
    RD_NULL,
    STORE,
    SYSTEM,
    Instruction,
    InsnKind as K,
)
from .platform import PC_STEP_SIZE, Platform, WORD_SIZE
from .tracer import Change, StepRecord, Tracer

M32 = 0xFFFFFFFF


def _s32(v: int) -> int:
    v &= M32
    return v - (1 << 32) if v >> 31 else v


def _trunc_div(a: int, b: int) -> int:
    """Exact integer division truncated toward zero (C/rust semantics)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


class VMState:
    REG_COUNT = 33  # x0..x31 + RD_NULL

    def __init__(self, platform: Platform, program):
        self.platform = platform
        self.program = program
        self.pc = program.entry
        self.memory: Dict[int, int] = {
            (addr >> 2): word for addr, word in program.image.items()
        }
        self.registers = [0] * self.REG_COUNT
        self.halted = False
        self.tracer = Tracer()

    # -- iteration -----------------------------------------------------------

    def iter_until_halt(self, max_steps: int = 1 << 32) -> Iterator[StepRecord]:
        for _ in range(max_steps):
            if self.halted:
                return
            pc_before = self.pc
            self.step()
            record = self.tracer.advance()
            yield record
            if not self.halted and self.pc == pc_before:
                raise RuntimeError(f"busy loop at pc={self.pc:#x}")

    def run(self, max_steps: int = 1 << 32) -> List[StepRecord]:
        steps = list(self.iter_until_halt(max_steps))
        if not self.halted:
            raise RuntimeError("program did not halt")
        return steps

    # -- step ------------------------------------------------------------------

    def step(self) -> None:
        insn = self.fetch(self.pc >> 2)
        if insn is None:
            raise RuntimeError(f"no instruction at pc={self.pc:#x}")
        kind = insn.kind
        if kind in COMPUTE:
            done = self._step_compute(insn)
        elif kind in BRANCH:
            done = self._step_branch(insn)
        elif kind in LOAD:
            done = self._step_load(insn)
        elif kind in STORE:
            done = self._step_store(insn)
        elif kind in SYSTEM:
            done = self._ecall()
        else:
            raise RuntimeError(f"illegal instruction {insn.raw:#x} at pc={self.pc:#x}")
        if done:
            self.tracer.store_pc(self.pc)

    def _step_compute(self, insn: Instruction) -> bool:
        pc = self.pc
        new_pc = (pc + PC_STEP_SIZE) & M32
        imm = insn.imm & M32
        k = insn.kind
        if k == K.JAL:
            new_pc = (pc + (insn.imm & M32)) & M32
            out = (pc + PC_STEP_SIZE) & M32
        else:
            rs1 = self.load_register(insn.rs1)
            if k == K.ADDI:
                out = (rs1 + imm) & M32
            elif k == K.XORI:
                out = rs1 ^ imm
            elif k == K.ORI:
                out = rs1 | imm
            elif k == K.ANDI:
                out = rs1 & imm
            elif k == K.SLLI:
                out = (rs1 << (imm & 0x1F)) & M32
            elif k == K.SRLI:
                out = rs1 >> (imm & 0x1F)
            elif k == K.SRAI:
                out = (_s32(rs1) >> (imm & 0x1F)) & M32
            elif k == K.SLTI:
                out = 1 if _s32(rs1) < _s32(imm) else 0
            elif k == K.SLTIU:
                out = 1 if rs1 < imm else 0
            elif k == K.JALR:
                new_pc = (rs1 + imm) & M32 & ~1
                out = (pc + PC_STEP_SIZE) & M32
            else:
                rs2 = self.load_register(insn.rs2)
                if k == K.ADD:
                    out = (rs1 + rs2) & M32
                elif k == K.SUB:
                    out = (rs1 - rs2) & M32
                elif k == K.XOR:
                    out = rs1 ^ rs2
                elif k == K.OR:
                    out = rs1 | rs2
                elif k == K.AND:
                    out = rs1 & rs2
                elif k == K.SLL:
                    out = (rs1 << (rs2 & 0x1F)) & M32
                elif k == K.SRL:
                    out = rs1 >> (rs2 & 0x1F)
                elif k == K.SRA:
                    out = (_s32(rs1) >> (rs2 & 0x1F)) & M32
                elif k == K.SLT:
                    out = 1 if _s32(rs1) < _s32(rs2) else 0
                elif k == K.SLTU:
                    out = 1 if rs1 < rs2 else 0
                elif k == K.MUL:
                    out = (rs1 * rs2) & M32
                elif k == K.MULH:
                    out = ((_s32(rs1) * _s32(rs2)) >> 32) & M32
                elif k == K.MULHSU:
                    out = ((_s32(rs1) * rs2) >> 32) & M32
                elif k == K.MULHU:
                    out = ((rs1 * rs2) >> 32) & M32
                elif k == K.DIV:
                    if rs2 == 0:
                        out = M32
                    else:
                        a, b = _s32(rs1), _s32(rs2)
                        # rust wrapping_div: truncated toward zero;
                        # i32::MIN / -1 wraps to i32::MIN
                        if a == -(1 << 31) and b == -1:
                            out = a & M32
                        else:
                            out = _trunc_div(a, b) & M32
                elif k == K.DIVU:
                    out = M32 if rs2 == 0 else rs1 // rs2
                elif k == K.REM:
                    if rs2 == 0:
                        out = rs1
                    else:
                        a, b = _s32(rs1), _s32(rs2)
                        if a == -(1 << 31) and b == -1:
                            out = 0
                        else:
                            out = (a - _trunc_div(a, b) * b) & M32
                elif k == K.REMU:
                    out = rs1 if rs2 == 0 else rs1 % rs2
                else:
                    raise RuntimeError(f"illegal compute insn {k}")
        if new_pc & 0x3:
            raise RuntimeError("instruction address misaligned")
        self.store_register(insn.rd_internal(), out)
        self.pc = new_pc
        return True

    def _step_branch(self, insn: Instruction) -> bool:
        pc = self.pc
        rs1 = self.load_register(insn.rs1)
        rs2 = self.load_register(insn.rs2)
        k = insn.kind
        taken = {
            K.BEQ: rs1 == rs2,
            K.BNE: rs1 != rs2,
            K.BLT: _s32(rs1) < _s32(rs2),
            K.BGE: _s32(rs1) >= _s32(rs2),
            K.BLTU: rs1 < rs2,
            K.BGEU: rs1 >= rs2,
        }[k]
        new_pc = (pc + (insn.imm & M32)) & M32 if taken else (pc + PC_STEP_SIZE) & M32
        if new_pc & 0x3:
            raise RuntimeError("branch target misaligned")
        self.pc = new_pc
        return True

    def _step_load(self, insn: Instruction) -> bool:
        rs1 = self.load_register(insn.rs1)
        addr = (rs1 + (insn.imm & M32)) & M32
        if not self.platform.can_read(addr):
            raise RuntimeError(f"load access fault at {addr:#x}")
        k = insn.kind
        if k == K.LW and addr & 0x3:
            raise RuntimeError("load address misaligned")
        if k in (K.LH, K.LHU) and addr & 0x1:
            raise RuntimeError("load address misaligned")
        word = self.load_memory(addr >> 2)
        shift = (addr & 0x3) * 8
        if k == K.LW:
            out = word
        elif k == K.LBU:
            out = (word >> shift) & 0xFF
        elif k == K.LB:
            b = (word >> shift) & 0xFF
            out = (b - 0x100) & M32 if b & 0x80 else b
        elif k == K.LHU:
            out = (word >> shift) & 0xFFFF
        else:  # LH
            h = (word >> shift) & 0xFFFF
            out = (h - 0x10000) & M32 if h & 0x8000 else h
        self.store_register(insn.rd_internal(), out)
        self.pc = (self.pc + PC_STEP_SIZE) & M32
        return True

    def _step_store(self, insn: Instruction) -> bool:
        rs1 = self.load_register(insn.rs1)
        rs2 = self.load_register(insn.rs2)
        addr = (rs1 + (insn.imm & M32)) & M32
        if not self.platform.can_write(addr):
            raise RuntimeError(f"store access fault at {addr:#x}")
        k = insn.kind
        if k == K.SW and addr & 0x3:
            raise RuntimeError("store address misaligned")
        if k == K.SH and addr & 0x1:
            raise RuntimeError("store address misaligned")
        shift = (addr & 0x3) * 8
        before = self.peek_memory(addr >> 2)
        if k == K.SW:
            word = rs2
        elif k == K.SB:
            word = (before & ~(0xFF << shift)) | ((rs2 & 0xFF) << shift)
        else:  # SH
            word = (before & ~(0xFFFF << shift)) | ((rs2 & 0xFFFF) << shift)
        self.store_memory(addr >> 2, word & M32)
        self.pc = (self.pc + PC_STEP_SIZE) & M32
        return True

    def _ecall(self) -> bool:
        function = self.load_register(Platform.REG_ECALL)
        if function == Platform.ECALL_HALT:
            exit_code = self.load_register(Platform.REG_ARG0)
            self._exit_code = exit_code
            self.pc = 0
            self.halted = True
            return True
        from .syscalls import UnknownSyscallError, handle_syscall

        try:
            effects = handle_syscall(self, function)
        except UnknownSyscallError:
            if self.platform.unsafe_ecall_nop:
                # SP1 compat (platform.rs unsafe_ecall_nop): treat the
                # unknown ecall as a nop; the step proves via ECALL_DUMMY
                self.pc = (self.pc + PC_STEP_SIZE) & M32
                return True
            raise
        for waddr, value in effects.mem_values:
            self.memory[waddr] = value
        for idx, value in effects.reg_values:
            self.registers[idx] = value
        self.pc = (self.pc + PC_STEP_SIZE) & M32
        self.tracer.track_syscall(effects)
        return True

    @property
    def exit_code(self) -> int:
        return getattr(self, "_exit_code", 0)

    # -- memory/register plumbing (tracer hooks) ------------------------------

    def fetch(self, pc_waddr: int) -> Optional[Instruction]:
        byte_pc = (pc_waddr << 2) & M32
        rel = (byte_pc - self.program.base_address) & M32
        idx = rel // WORD_SIZE
        if idx >= len(self.program.instructions):
            return None
        insn = self.program.instructions[idx]
        self.tracer.fetch(pc_waddr, insn)
        return insn

    def load_register(self, idx: int) -> int:
        v = self.registers[idx]
        self.tracer.load_register(idx, v)
        return v

    def store_register(self, idx: int, after: int) -> None:
        if idx == 0:
            # dark write to RD_NULL (rv32im.rs:240-247): x0 stays zero but the
            # write record still lands on a real register-table row
            idx = RD_NULL
        before = self.registers[idx]
        self.tracer.store_register(idx, Change(before, after))
        self.registers[idx] = after

    def load_memory(self, waddr: int) -> int:
        v = self.peek_memory(waddr)
        self.tracer.load_memory(waddr, v)
        return v

    def store_memory(self, waddr: int, after: int) -> None:
        before = self.peek_memory(waddr)
        self.tracer.store_memory(waddr, Change(before, after))
        self.memory[waddr] = after

    def peek_memory(self, waddr: int) -> int:
        return self.memory.get(waddr, 0)

    def peek_register(self, idx: int) -> int:
        """Untraced register read (syscall handlers)."""
        return self.registers[idx]

    def init_register_unsafe(self, idx: int, value: int) -> None:
        self.registers[idx] = value
