"""Aux subsystems: stats reports, profiler, mock prover."""

import json

import numpy as np

from ceno_tpu.emul.insn import InsnKind
from ceno_tpu.utils.profiling import profile
from ceno_tpu.zkvm.riscv.config import Rv32imConfig
from ceno_tpu.zkvm.stats import StaticReport, TraceReport


def test_static_report():
    config = Rv32imConfig.construct(program_size=8)
    rep = StaticReport.build(config.zkvm_cs)
    assert "ADD" in rep.opcodes and "PROGRAM" in rep.tables
    add = rep.opcodes["ADD"]
    # state_in + rs1 pair + rs2 pair + rd-prev read = 4 reads
    assert add.reads == 4 and add.writes == 4
    # fetch + 2 rd-limb U16 + 6 lt-diff U16 = 9 lookups
    assert add.lookups == 9
    data = json.loads(rep.to_json())
    assert data["opcodes"]["SLTU"]["witnesses"] > 0

    tr = TraceReport(rep, {"ADD": 100})
    assert tr.total_witness_cells() == add.witnesses * 100


def test_profiler():
    import time

    with profile(max_level=2) as p:
        with p.span("outer", 1):
            with p.span("inner", 2):
                time.sleep(0.01)
            with p.span("too_deep", 3):
                pass
    rep = p.report()
    assert "outer" in rep and "inner" in rep and "too_deep" not in rep


def test_custom_instance_padding():
    """InstancePaddingStrategy::Custom (witness.rs:45-49): callable padding
    fills pad rows per column from (row_indices, col)."""
    from ceno_tpu.zkvm.witness import WitnessMatrix

    wm = WitnessMatrix(2, 3, padding=lambda rows, col: rows * 10 + col)
    wm.set(0, np.array([1, 2, 3], dtype=np.uint64))
    wm.set(1, np.array([4, 5, 6], dtype=np.uint64))
    wm.finalize()
    assert wm.padded == 4
    assert wm.data[0].tolist() == [1, 2, 3, 30]
    assert wm.data[1].tolist() == [4, 5, 6, 31]


def test_lookup_value_diagnostics_name_rom_and_circuit():
    """mock_prover.rs:163-296 error quality: a broken lookup reports WHICH
    value is missing from WHICH ROM table, naming the offending circuit and
    the namespaced lk_record."""
    import jax
    import pytest

    from ceno_tpu.emul import CENO_PLATFORM, Program, encode_rv32
    from ceno_tpu.field import gl
    from ceno_tpu.zkvm.debug import check_lookup_values
    from ceno_tpu.zkvm.e2e import emulate_program

    K = InsnKind
    insns = [
        encode_rv32(K.ADDI, 0, 0, 1, 7),
        encode_rv32(K.ADDI, 1, 0, 2, 35),
        encode_rv32(K.ECALL, 0, 0, 0, 0),
    ]
    program = Program.from_instructions(CENO_PLATFORM.pc_base(), insns)
    vm, steps, pv = emulate_program(program, CENO_PLATFORM, 16)
    config = Rv32imConfig.construct(4, kinds=(K.ADDI, K.ECALL))
    wit, ni, st = config.assign_witnesses(steps, program, vm)
    fx = config.generate_fixed_traces(program, np.zeros(64, dtype=np.uint64))
    check_lookup_values(config, wit, ni, st, fx)  # healthy witness passes

    # zero out one used multiplicity row of the U16 range table: the
    # opcode-side lookups of that value are now "not in table"
    mlts = np.asarray(jax.device_get(gl.to_u64(wit["RANGE_U16"][0])))
    idx = int(np.flatnonzero(mlts)[0])
    mlts_bad = mlts.copy()
    mlts_bad[idx] = 0
    wit_bad = dict(wit)
    wit_bad["RANGE_U16"] = [gl.from_u64(mlts_bad)]
    with pytest.raises(AssertionError) as ei:
        check_lookup_values(config, wit_bad, ni, st, fx)
    msg = str(ei.value)
    assert f"value [{idx}] not in U16 table" in msg
    assert "circuit '" in msg and "record '" in msg


def test_mock_prover_catches_bad_witness():
    """MockProver accepts a genuinely-assigned ADD witness and flags a
    corrupted carry bit (mock_prover.rs assert_satisfied_raw analog)."""
    import pytest

    from ceno_tpu.emul import CENO_PLATFORM, Program, VMState, encode_rv32
    from ceno_tpu.field import gl
    from ceno_tpu.zkvm.mock_prover import MockProverError, assert_satisfied
    from ceno_tpu.zkvm.riscv.arith import assign_add_sub, construct_add_sub
    from ceno_tpu.zkvm.witness import LkMultiplicity

    insns = [encode_rv32(InsnKind.ADD, 1, 2, 3, 0) for _ in range(4)]
    program = Program.from_instructions(CENO_PLATFORM.pc_base(), insns)
    vm = VMState(CENO_PLATFORM, program)
    vm.init_register_unsafe(1, 0xFFFF1234)
    vm.init_register_unsafe(2, 0x0000F00D)
    steps = []
    for s in vm.iter_until_halt(max_steps=4):
        steps.append(s)
        if len(steps) == 4:
            break

    cfg = construct_add_sub(InsnKind.ADD, "ADD")
    wm = assign_add_sub(cfg, steps, LkMultiplicity())
    wits = wm.to_columns()
    assert_satisfied(cfg.cs, wits, len(steps))
    # corrupt a carry to a non-bit value
    bad = list(wits)
    bad[cfg.carries[0].id] = gl.full(bad[cfg.carries[0].id].lo.shape, 2)
    with pytest.raises(MockProverError):
        assert_satisfied(cfg.cs, bad, len(steps))
