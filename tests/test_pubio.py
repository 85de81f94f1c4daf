"""Public-IO table + truncated-segment (does_halt) semantics.

Mirrors the reference's PubIOCircuit (tables/ram.rs:97-113,
ram_impl.rs:190-300) and verify_proof_halt (verifier.rs:46-75): the guest's
public input is bound by instance vectors the verifier evaluates itself; a
max_steps-truncated trace carries no ECALL-HALT instance and must be
verified with does_halt=False.

Value-level (mock) checks run in the default suite; the full prove+verify
round trips live in test_e2e_slice-style CENO_E2E-gated tests.
"""

import os

import numpy as np
import pytest

from ceno_tpu.emul.insn import InsnKind as K
from ceno_tpu.emul.platform import setup_platform
from ceno_tpu.emul.programs import fibonacci_program, pubio_sum_program
from ceno_tpu.zkvm import vm as zkvm
from ceno_tpu.zkvm.debug import assert_satisfied_full, check_lookup_values
from ceno_tpu.zkvm.e2e import Checkpoint, emulate_program, run_e2e_with_checkpoint
from ceno_tpu.zkvm.riscv.config import MemLayout, Rv32imConfig
from ceno_tpu.zkvm.structs import ZKVMProof

PUBIO_KINDS = (K.ADD, K.ADDI, K.LW, K.ECALL)


def _pubio_setup(io_words=(40, 2)):
    program = pubio_sum_program()
    platform = setup_platform("ceno", program, stack_size=64, heap_size=64,
                              pub_io_size=16)
    layout = MemLayout.from_platform(program, platform)
    config = Rv32imConfig.construct(8, kinds=PUBIO_KINDS, mem_layout=layout)
    vm, steps, pv = emulate_program(program, platform, 64, public_io=io_words)
    return program, platform, config, vm, steps, pv


def test_pubio_guest_reads_public_input():
    program, platform, config, vm, steps, pv = _pubio_setup((40, 2))
    assert vm.halted and vm.exit_code == 42
    io_len = (platform.public_io[1] - platform.public_io[0]) // 4
    assert len(pv.public_io) == io_len
    assert pv.public_io[:2] == (40, 2)
    # raw_pi exposes the io words as two 16-bit limb vectors
    raw = pv.to_vec()
    assert raw[zkvm.PV_PUBLIC_IO_LO][:2] == [40, 2]
    assert raw[zkvm.PV_PUBLIC_IO_HI][:2] == [0, 0]


def test_pubio_witness_invariants():
    """Whole-VM value-level multiset/logup balance incl. the PubIO table."""
    program, platform, config, vm, steps, pv = _pubio_setup((1000, 65536 + 7))
    assert vm.exit_code == (1000 + 65536 + 7) & 0xFFFFFFFF
    wit, ni, st = config.assign_witnesses(steps, program, vm)
    assert "PUBIO_MEM" in wit
    fx = config.generate_fixed_traces(program, np.zeros(64, dtype=np.uint64))
    check_lookup_values(config, wit, ni, st, fx)
    assert_satisfied_full(config, wit, ni, st, pv, fx)


def test_pubio_tamper_breaks_invariants():
    """Changing a public-io word after the run must break the r/w multiset
    balance (the table's records take values from the instance vectors)."""
    program, platform, config, vm, steps, pv = _pubio_setup((40, 2))
    wit, ni, st = config.assign_witnesses(steps, program, vm)
    fx = config.generate_fixed_traces(program, np.zeros(64, dtype=np.uint64))
    bad_io = (41,) + pv.public_io[1:]
    bad_pv = pv._replace(public_io=bad_io)
    with pytest.raises(AssertionError):
        assert_satisfied_full(config, wit, ni, st, bad_pv, fx)


def test_truncated_segment_publics():
    """A run stopped at max_steps is a valid non-halting segment: end_pc /
    end_cycle reflect the stop point, exit code defaults to 0."""
    program = fibonacci_program(1 << 10)
    platform = setup_platform("ceno", program, stack_size=64, heap_size=64)
    vm, steps, pv = emulate_program(program, platform, max_steps=100)
    assert not vm.halted
    assert len(steps) == 100
    assert pv.exit_code == 0
    assert pv.end_pc == vm.pc
    raw = pv.to_vec()
    assert raw[zkvm.PV_END_PC] == [vm.pc]


def test_verify_proof_halt_instance_count():
    """verifier.rs:55-75: the ECALL-HALT instance count must equal
    does_halt before any cryptographic verification happens."""
    from ceno_tpu.transcript import basic as tr

    class FakeHaltProof:
        num_instances = 1

    empty = ZKVMProof([[0]], {})
    t = tr.Transcript(b"riscv")
    # truncated proof checked as halting -> structural reject
    assert not bool(zkvm.verify_proof_halt(None, empty, t, does_halt=True))
    halting = ZKVMProof([[0]], {})
    halting.opcode_proofs[zkvm.HALT_CIRCUIT_NAME] = (0, FakeHaltProof())
    # halting proof checked as truncated -> structural reject
    assert not bool(zkvm.verify_proof_halt(None, halting, t, does_halt=False))


@pytest.mark.skipif(not os.environ.get("CENO_E2E"),
                    reason="set CENO_E2E=1 for full prove+verify round trips")
def test_pubio_e2e_prove_and_tamper():
    from ceno_tpu.pcs import RSSpec

    program = pubio_sum_program()
    res = run_e2e_with_checkpoint(
        program, max_steps=64, kinds=PUBIO_KINDS,
        spec=RSSpec(num_queries=9, rate_log=1, basecode_msg_size_log=7),
        max_num_vars=17, public_io=(40, 2),
        stack_size=64, heap_size=64, pub_io_size=16,
    )
    assert res.exit_code == 42
    assert res.verified is True

    # tamper any io word -> proof must die
    import jax

    from ceno_tpu.transcript import basic as tr

    proof = res.proof
    proof.raw_pi[zkvm.PV_PUBLIC_IO_LO][0] = 41
    # (re-verification needs a fresh pk; rebuild via the pipeline pieces)
    platform = setup_platform("ceno", program, 64, 64, 16)
    layout = MemLayout.from_platform(program, platform)
    config = Rv32imConfig.construct(8, kinds=PUBIO_KINDS, mem_layout=layout)
    from ceno_tpu.pcs import Basefold, RSSpec as RS

    pcs = Basefold(RS(num_queries=9, rate_log=1, basecode_msg_size_log=7),
                   max_num_vars=17)
    fixed = config.generate_fixed_traces(program, np.zeros(64, dtype=np.uint64))
    pk = config.zkvm_cs.key_gen(pcs, fixed)
    tv = tr.Transcript(b"riscv")
    assert not bool(jax.device_get(zkvm.verify_proof_halt(pk, proof, tv)))


@pytest.mark.skipif(not os.environ.get("CENO_E2E"),
                    reason="set CENO_E2E=1 for full prove+verify round trips")
def test_truncated_segment_e2e_prove():
    """The headline workload shape: a non-halting max_steps segment proves
    and verifies with does_halt=False (and fails with does_halt=True)."""
    from ceno_tpu.pcs import RSSpec

    program = fibonacci_program(1 << 10)
    res = run_e2e_with_checkpoint(
        program, max_steps=128, kinds=(K.ADD, K.ADDI, K.BEQ, K.JAL, K.ECALL),
        spec=RSSpec(num_queries=9, rate_log=1, basecode_msg_size_log=7),
        max_num_vars=17, stack_size=64, heap_size=64,
    )
    assert res.halted is False
    assert res.verified is True  # pipeline used does_halt=False
