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


# --- round 2: fixture breadth (examples-builder/build.rs:11-23 list) -------

def test_sorting_guest():
    from ceno_tpu.emul.programs import sorting_program, sorting_expected
    from ceno_tpu.host import run

    vm, steps, _ = run(CENO_PLATFORM, sorting_program(16))
    assert vm.halted and vm.exit_code == sorting_expected(16)
    # fill + bubble sort exercise MUL/SLLI/LW/SW/BGEU/SUB heavily
    assert len(steps) > 1000


def test_median_guest_reads_hints():
    import random
    import struct

    from ceno_tpu.emul.programs import median_program
    from ceno_tpu.host import CenoStdin, run

    n = 15
    vals = list(range(100, 100 + n * 7, 7))
    random.seed(3)
    random.shuffle(vals)
    hints = CenoStdin().write(struct.pack("<%dI" % n, *vals))
    vm, _, _ = run(CENO_PLATFORM, median_program(n), hints=hints)
    assert vm.halted and vm.exit_code == sorted(vals)[n // 2]


def test_keccak_guest():
    from ceno_tpu.emul.programs import keccak_program, keccak_expected
    from ceno_tpu.host import run

    vm, _, _ = run(CENO_PLATFORM, keccak_program(2))
    assert vm.halted and vm.exit_code == keccak_expected(2)


def test_alloc_mini_panic_guests():
    from ceno_tpu.emul.programs import alloc_program, mini_program, panic_program
    from ceno_tpu.host import run

    vm, _, _ = run(CENO_PLATFORM, alloc_program(8))
    assert vm.halted and vm.exit_code == sum(range(8))
    vm, _, _ = run(CENO_PLATFORM, mini_program())
    assert vm.halted and vm.exit_code == 0
    vm, _, _ = run(CENO_PLATFORM, panic_program())
    assert vm.halted and vm.exit_code == 1


def test_io_msg_guest():
    from ceno_tpu.emul.programs import io_msg_program
    from ceno_tpu.host import run

    vm, _, msgs = run(CENO_PLATFORM, io_msg_program(b"hello world"))
    assert vm.halted and msgs == [b"hello world"]


@pytest.mark.skipif(not os.environ.get("CENO_E2E"),
                    reason="set CENO_E2E=1 for full prove+verify round trips")
def test_sorting_e2e_prove(monkeypatch):
    """Prove+verify the sorting guest — covers MUL, SUB, SLLI, BGEU, LW/SW
    in one real control-flow-heavy trace.  MOCK_PROVING=1 exercises the
    e2e.rs:455 env-gated mock-prover pass on the same witness."""
    from ceno_tpu.emul.insn import InsnKind as K
    from ceno_tpu.emul.programs import sorting_program, sorting_expected
    from ceno_tpu.pcs import RSSpec
    from ceno_tpu.zkvm.e2e import Checkpoint, run_e2e_with_checkpoint

    monkeypatch.setenv("MOCK_PROVING", "1")
    res = run_e2e_with_checkpoint(
        sorting_program(8), max_steps=1 << 12, checkpoint=Checkpoint.COMPLETE,
        spec=RSSpec(num_queries=9, rate_log=1, basecode_msg_size_log=7),
        kinds=(K.ADD, K.SUB, K.ADDI, K.SLLI, K.MUL, K.BEQ, K.BGEU, K.JAL,
               K.LW, K.SW, K.ECALL),
    )
    assert res.exit_code == sorting_expected(8)
    assert res.verified is True
