"""Synthesized guest fixtures (ceno_host/tests/test_elf.rs analog, minus the
Rust toolchain): emulation-only checks of the fibonacci and memory guests."""

import os

import pytest

from ceno_tpu.emul import CENO_PLATFORM, VMState
from ceno_tpu.emul.programs import fib, fibonacci_program, memory_workout_program


@pytest.mark.parametrize("n", [0, 1, 2, 17, 90])
def test_fibonacci_guest(n):
    vm = VMState(CENO_PLATFORM, fibonacci_program(n))
    steps = list(vm.iter_until_halt(max_steps=1 << 16))
    assert vm.halted
    assert vm.exit_code == fib(n)
    # 6 instructions per loop iteration + 6 of prologue/exit-check/epilogue
    assert len(steps) == 6 * n + 6


def test_memory_guest():
    vm = VMState(CENO_PLATFORM, memory_workout_program())
    list(vm.iter_until_halt(max_steps=1000))
    assert vm.halted
    assert vm.exit_code == 0x146


def test_fibonacci_e2e_prove():
    """Full prove+verify of the fibonacci guest (CENO_E2E-gated: slow cold)."""
    if not os.environ.get("CENO_E2E"):
        pytest.skip("set CENO_E2E=1 for the full fibonacci prove")
    import jax

    from ceno_tpu.pcs import RSSpec
    from ceno_tpu.zkvm.e2e import Checkpoint, run_e2e_with_checkpoint
    from ceno_tpu.emul.insn import InsnKind as K

    program = fibonacci_program(8)
    res = run_e2e_with_checkpoint(
        program, max_steps=1 << 12, checkpoint=Checkpoint.COMPLETE,
        spec=RSSpec(num_queries=9, rate_log=1, basecode_msg_size_log=7),
        kinds=(K.ADD, K.ADDI, K.BEQ, K.JAL, K.ECALL),
    )
    assert res.exit_code == fib(8)
    assert res.verified is True
