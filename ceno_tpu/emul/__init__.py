from .insn import Instruction, InsnKind, decode_instruction, encode_rv32
from .platform import CENO_PLATFORM, Platform
from .tracer import Change, MemOp, StepRecord, Tracer
from .vm_state import VMState
from .elf import Program, load_elf

__all__ = [
    "Instruction", "InsnKind", "decode_instruction", "encode_rv32",
    "CENO_PLATFORM", "Platform", "Change", "MemOp", "StepRecord", "Tracer",
    "VMState", "Program", "load_elf",
]
