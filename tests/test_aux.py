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


def test_mock_prover_catches_bad_witness():
    """MockProver flags a violated carry-bit constraint."""
    import jax
    import pytest

    from ceno_tpu.field import gl
    from ceno_tpu.zkvm.mock_prover import MockProverError, assert_satisfied
    from ceno_tpu.zkvm.riscv.arith import construct_add_sub

    cfg = construct_add_sub(InsnKind.ADD, "ADD")
    n = 4
    wits = [gl.zeros((n,)) for _ in range(cfg.cs.num_witin)]
    # all-zero witness satisfies carry bits and linear asserts trivially
    assert_satisfied(cfg.cs, wits, n)
    # corrupt a carry to a non-bit value
    bad = list(wits)
    bad[cfg.carries[0].id] = gl.full((n,), 2)
    with pytest.raises(MockProverError):
        assert_satisfied(cfg.cs, bad, n)
