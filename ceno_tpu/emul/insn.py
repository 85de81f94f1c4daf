"""RV32IM instruction set: kinds, formats, decoding.

Mirrors /root/reference/ceno_emul/src/rv32im.rs:140-260 (47 InsnKinds — no
LUI/AUIPC: the decoder transpiles them to ADDI with a widened immediate,
disassemble/mod.rs:252-300) and encode_rv32 (rv32im.rs:26-49).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class InsnKind:
    INVALID = 0
    ADD = 1; SUB = 2; XOR = 3; OR = 4; AND = 5
    SLL = 6; SRL = 7; SRA = 8; SLT = 9; SLTU = 10
    ADDI = 11; XORI = 12; ORI = 13; ANDI = 14
    SLLI = 15; SRLI = 16; SRAI = 17; SLTI = 18; SLTIU = 19
    BEQ = 20; BNE = 21; BLT = 22; BGE = 23; BLTU = 24; BGEU = 25
    JAL = 26; JALR = 27
    MUL = 28; MULH = 29; MULHSU = 30; MULHU = 31
    DIV = 32; DIVU = 33; REM = 34; REMU = 35
    LB = 36; LH = 37; LW = 38; LBU = 39; LHU = 40
    SB = 41; SH = 42; SW = 43
    ECALL = 44

    NAMES = {}


InsnKind.NAMES = {
    v: k for k, v in vars(InsnKind).items() if isinstance(v, int)
}

K = InsnKind

_R = {K.ADD, K.SUB, K.XOR, K.OR, K.AND, K.SLL, K.SRL, K.SRA, K.SLT, K.SLTU,
      K.MUL, K.MULH, K.MULHSU, K.MULHU, K.DIV, K.DIVU, K.REM, K.REMU}
_I = {K.ADDI, K.XORI, K.ORI, K.ANDI, K.SLLI, K.SRLI, K.SRAI, K.SLTI, K.SLTIU,
      K.JALR, K.LB, K.LH, K.LW, K.LBU, K.LHU, K.ECALL}
_S = {K.SB, K.SH, K.SW}
_B = {K.BEQ, K.BNE, K.BLT, K.BGE, K.BLTU, K.BGEU}
_J = {K.JAL}

COMPUTE = _R | {K.ADDI, K.XORI, K.ORI, K.ANDI, K.SLLI, K.SRLI, K.SRAI,
                K.SLTI, K.SLTIU, K.JAL, K.JALR}
BRANCH = set(_B)
LOAD = {K.LB, K.LH, K.LW, K.LBU, K.LHU}
STORE = set(_S)
SYSTEM = {K.ECALL}

RD_NULL = 32


def insn_format(kind: int) -> str:
    if kind in _R:
        return "R"
    if kind in _S:
        return "S"
    if kind in _B:
        return "B"
    if kind in _J:
        return "J"
    return "I"


@dataclass(frozen=True)
class Instruction:
    kind: int = InsnKind.INVALID
    rs1: int = 0
    rs2: int = 0
    rd: int = 0
    imm: int = 0  # signed (python int; may exceed 12 bits after LUI/AUIPC)
    raw: int = 0

    def rd_internal(self) -> int:
        """rd or the dark-write register RD_NULL (rv32im.rs:240-247)."""
        if insn_format(self.kind) in ("R", "I", "J") and self.rd != 0:
            return self.rd
        return RD_NULL

    def rs1_or_zero(self) -> int:
        return self.rs1 if insn_format(self.kind) in ("R", "I", "S", "B") else 0

    def rs2_or_zero(self) -> int:
        return self.rs2 if insn_format(self.kind) in ("R", "S", "B") else 0

    @property
    def name(self) -> str:
        return InsnKind.NAMES.get(self.kind, "?")


def encode_rv32(kind: int, rs1: int, rs2: int, rd: int, imm: int) -> Instruction:
    return Instruction(kind, rs1, rs2, rd, imm, 0)


def _sext(v: int, bits: int) -> int:
    m = 1 << (bits - 1)
    return (v & (m - 1)) - (v & m)


def decode_instruction(word: int, pc: int) -> Instruction:
    """Decode a raw RV32IM word; LUI/AUIPC become wide-imm ADDI
    (disassemble/mod.rs LUI: imm=U-imm; AUIPC: imm=pc+U-imm)."""
    opcode = word & 0x7F
    rd = (word >> 7) & 0x1F
    funct3 = (word >> 12) & 0x7
    rs1 = (word >> 15) & 0x1F
    rs2 = (word >> 20) & 0x1F
    funct7 = (word >> 25) & 0x7F

    imm_i = _sext(word >> 20, 12)
    imm_s = _sext(((word >> 25) << 5) | rd, 12)
    imm_b = _sext(
        (((word >> 31) & 1) << 12)
        | (((word >> 7) & 1) << 11)
        | (((word >> 25) & 0x3F) << 5)
        | (((word >> 8) & 0xF) << 1),
        13,
    )
    imm_u = word & 0xFFFFF000
    imm_j = _sext(
        (((word >> 31) & 1) << 20)
        | (((word >> 12) & 0xFF) << 12)
        | (((word >> 20) & 1) << 11)
        | (((word >> 21) & 0x3FF) << 1),
        21,
    )

    def ins(kind, rs1=0, rs2=0, rd=0, imm=0):
        return Instruction(kind, rs1, rs2, rd, imm, word)

    if opcode == 0x33:  # R-type
        table = {
            (0, 0x00): K.ADD, (0, 0x20): K.SUB, (4, 0x00): K.XOR,
            (6, 0x00): K.OR, (7, 0x00): K.AND, (1, 0x00): K.SLL,
            (5, 0x00): K.SRL, (5, 0x20): K.SRA, (2, 0x00): K.SLT,
            (3, 0x00): K.SLTU,
            (0, 0x01): K.MUL, (1, 0x01): K.MULH, (2, 0x01): K.MULHSU,
            (3, 0x01): K.MULHU, (4, 0x01): K.DIV, (5, 0x01): K.DIVU,
            (6, 0x01): K.REM, (7, 0x01): K.REMU,
        }
        kind = table.get((funct3, funct7), K.INVALID)
        return ins(kind, rs1, rs2, rd)
    if opcode == 0x13:  # I-type arith
        table = {0: K.ADDI, 4: K.XORI, 6: K.ORI, 7: K.ANDI, 2: K.SLTI, 3: K.SLTIU}
        if funct3 in table:
            return ins(table[funct3], rs1, 0, rd, imm_i)
        if funct3 == 1 and funct7 == 0x00:
            return ins(K.SLLI, rs1, 0, rd, rs2)
        if funct3 == 5 and funct7 == 0x00:
            return ins(K.SRLI, rs1, 0, rd, rs2)
        if funct3 == 5 and funct7 == 0x20:
            return ins(K.SRAI, rs1, 0, rd, rs2)
        return ins(K.INVALID)
    if opcode == 0x03:  # loads
        table = {0: K.LB, 1: K.LH, 2: K.LW, 4: K.LBU, 5: K.LHU}
        return ins(table.get(funct3, K.INVALID), rs1, 0, rd, imm_i)
    if opcode == 0x23:  # stores
        table = {0: K.SB, 1: K.SH, 2: K.SW}
        return ins(table.get(funct3, K.INVALID), rs1, rs2, 0, imm_s)
    if opcode == 0x63:  # branches
        table = {0: K.BEQ, 1: K.BNE, 4: K.BLT, 5: K.BGE, 6: K.BLTU, 7: K.BGEU}
        return ins(table.get(funct3, K.INVALID), rs1, rs2, 0, imm_b)
    if opcode == 0x6F:  # JAL
        return ins(K.JAL, 0, 0, rd, imm_j)
    if opcode == 0x67 and funct3 == 0:  # JALR
        return ins(K.JALR, rs1, 0, rd, imm_i)
    if opcode == 0x37:  # LUI -> ADDI x0 + imm
        return ins(K.ADDI, 0, 0, rd, _sext(imm_u, 32))
    if opcode == 0x17:  # AUIPC -> ADDI x0 + (pc + imm)
        return ins(K.ADDI, 0, 0, rd, _sext((pc + imm_u) & 0xFFFFFFFF, 32))
    if opcode == 0x73 and word in (0x00000073,):  # ECALL
        return ins(K.ECALL, 0, 0, 0, 0)
    return ins(K.INVALID)
