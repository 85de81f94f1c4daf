"""End-to-end minimum slice: emulate a straight-line ADD/SUB program, assign
all circuits (opcode + register/program/U16 tables), prove the whole VM, and
verify including the cross-circuit product/logup invariants (mirrors the
reference's riscv_add bench config + scheme/tests.rs e2e tests)."""

import os

import jax
import numpy as np
import pytest

# The full-VM slice proves 5 circuits incl. the 2^16 range table: ~400
# distinct jit kernels on first run (slow cold, fine warm).  Run explicitly
# with CENO_E2E=1; the quick suite covers each layer separately.
pytestmark = pytest.mark.skipif(
    not os.environ.get("CENO_E2E"), reason="set CENO_E2E=1 for the full-VM slice"
)

from ceno_tpu.emul import CENO_PLATFORM, Program, VMState, encode_rv32, InsnKind as K
from ceno_tpu.pcs import Basefold, RSSpec
from ceno_tpu.transcript import basic as tr
from ceno_tpu.zkvm.riscv.config import Rv32imConfig
from ceno_tpu.emul.insn import InsnKind
from ceno_tpu.zkvm.riscv.tables import REG_COUNT_POW2
from ceno_tpu.zkvm import vm as zkvm
from ceno_tpu.emul.tracer import SUBCYCLES_PER_INSN

SPEC = RSSpec(num_queries=9, rate_log=1, basecode_msg_size_log=7)


def build_and_run(num_steps=6):
    # straight-line adds/subs over pre-initialized registers
    insns = []
    for i in range(num_steps):
        if i % 3 == 2:
            insns.append(encode_rv32(K.SUB, 2, 1, 3 + (i % 4), 0))
        else:
            insns.append(encode_rv32(K.ADD, 1, 2, 3 + (i % 4), 0))
    program = Program.from_instructions(CENO_PLATFORM.pc_base(), insns)
    vm = VMState(CENO_PLATFORM, program)
    reg_init = np.zeros(REG_COUNT_POW2, dtype=np.uint64)
    reg_init[1] = 0x1234
    reg_init[2] = 0xABCD5678
    for idx in (1, 2):
        vm.init_register_unsafe(idx, int(reg_init[idx]))
    vm._reg_init = reg_init

    steps = []
    it = vm.iter_until_halt(max_steps=num_steps)
    for s in it:
        steps.append(s)
        if len(steps) == num_steps:
            break
    return program, vm, steps, reg_init


def test_e2e_add_slice():
    num_steps = 6
    program, vm, steps, reg_init = build_and_run(num_steps)

    config = Rv32imConfig.construct(program_size=8, kinds=(InsnKind.ADD, InsnKind.SUB))
    pcs = Basefold(SPEC, max_num_vars=17)
    fixed = config.generate_fixed_traces(program, reg_init)
    pk = config.zkvm_cs.key_gen(pcs, fixed)

    witnesses, num_instances, structural = config.assign_witnesses(steps, program, vm)

    pv = zkvm.PublicValues(
        exit_code=0,
        init_pc=program.entry,
        init_cycle=SUBCYCLES_PER_INSN,
        end_pc=vm.pc,
        end_cycle=vm.tracer.cycle(),
        public_io=(),
    )

    t = tr.Transcript(b"riscv")
    proof = zkvm.create_proof(pk, witnesses, structural, num_instances, pv, t)

    tv = tr.Transcript(b"riscv")
    ok = zkvm.verify_proof(pk, proof, tv)
    assert bool(jax.device_get(ok)), "e2e proof verification failed"


def test_e2e_rejects_wrong_public_values():
    num_steps = 6
    program, vm, steps, reg_init = build_and_run(num_steps)
    config = Rv32imConfig.construct(program_size=8, kinds=(InsnKind.ADD, InsnKind.SUB))
    pcs = Basefold(SPEC, max_num_vars=17)
    fixed = config.generate_fixed_traces(program, reg_init)
    pk = config.zkvm_cs.key_gen(pcs, fixed)
    witnesses, num_instances, structural = config.assign_witnesses(steps, program, vm)
    pv = zkvm.PublicValues(
        exit_code=0, init_pc=program.entry, init_cycle=SUBCYCLES_PER_INSN,
        end_pc=vm.pc, end_cycle=vm.tracer.cycle(), public_io=(),
    )
    t = tr.Transcript(b"riscv")
    proof = zkvm.create_proof(pk, witnesses, structural, num_instances, pv, t)
    # tamper: claim a different end_pc -> global product invariant must fail
    proof.raw_pi[zkvm.PV_END_PC] = [(vm.pc + 4) & 0xFFFFFFFF]
    tv = tr.Transcript(b"riscv")
    ok = zkvm.verify_proof(pk, proof, tv)
    assert not bool(jax.device_get(ok))
