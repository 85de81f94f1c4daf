"""Whole-VM witness invariants (assert_satisfied_full analog): logup and
r/w multiset balance over a full assigned witness, exact big-int math.

Gated behind CENO_E2E (compiles the record-inference kernels for every
registered circuit: slow cold, and contends with any concurrent TPU user)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("CENO_E2E"), reason="set CENO_E2E=1 for whole-VM checks"
)

from ceno_tpu.emul import CENO_PLATFORM, Program, encode_rv32
from ceno_tpu.emul.insn import InsnKind as K
from ceno_tpu.zkvm.debug import assert_satisfied_full, check_lookup_values
from ceno_tpu.zkvm.e2e import emulate_program
from ceno_tpu.zkvm.riscv.config import MemLayout, Rv32imConfig


def test_full_invariants_mixed_ops():
    insns = [
        encode_rv32(K.ADDI, 0, 0, 1, 7),
        encode_rv32(K.SLLI, 1, 0, 2, 4),
        encode_rv32(K.ADD, 2, 1, 3, 0),
        encode_rv32(K.SLT, 1, 2, 4, 0),
        encode_rv32(K.ADD, 3, 4, 10, 0),
        encode_rv32(K.ECALL, 0, 0, 0, 0),
    ]
    program = Program.from_instructions(CENO_PLATFORM.pc_base(), insns)
    kinds = (K.ADD, K.ADDI, K.SLLI, K.SLT, K.ECALL)
    vm, steps, pv = emulate_program(program, CENO_PLATFORM, 64)
    # no load/store kinds -> no memory tables; layout not needed
    config = Rv32imConfig.construct(8, kinds=kinds)
    wit, ni, st = config.assign_witnesses(steps, program, vm)
    fx = config.generate_fixed_traces(program, np.zeros(64, dtype=np.uint64))
    check_lookup_values(config, wit, ni, st, fx)
    assert_satisfied_full(config, wit, ni, st, pv, fx)
