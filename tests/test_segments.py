"""Segmentation at MAX_NUM_VARIABLES (SURVEY §5, scheme/constants.rs:8).

Opcode buckets larger than 2^seg_cap_log2 instances split into chunk
entries proved independently under the shared chip challenges; the
verifier's global product/logup accumulation chains them (boundary
global-state records cancel across chunks exactly as inside one proof).

The ungated tests cover the splitter's padding/naming/ordering semantics;
the full prove+verify round trip (with tamper rejection) is CENO_E2E-gated
like the other whole-VM tests.
"""

import os

import numpy as np
import pytest

from ceno_tpu.field import gl
from ceno_tpu.zkvm.vm import _split_entries


class _CS:
    def __init__(self, table):
        self.r_table_expressions = [1] if table else []
        self.w_table_expressions = []
        self.lk_table_expressions = []


class _CPK:
    def __init__(self, table):
        self.cs = _CS(table)


class _PK:
    def __init__(self, names, tables=()):
        self.circuit_pks = {n: _CPK(n in tables) for n in names}

    def sorted_names(self):
        return sorted(self.circuit_pks)


def _cols(n_padded, base=0):
    return [gl.from_u64(np.arange(base, base + n_padded, dtype=np.uint64))]


def test_split_noop_below_cap():
    pk = _PK(["ADD"])
    by, wits, n = _split_entries(pk, {"ADD": _cols(8)}, {"ADD": 7}, 3)
    assert by == {"ADD": ["ADD"]} and n == {"ADD": 7}


def test_split_exact_chunks():
    pk = _PK(["ADD"])
    by, wits, n = _split_entries(pk, {"ADD": _cols(16)}, {"ADD": 16}, 2)
    assert by["ADD"] == ["ADD", "ADD@001", "ADD@002", "ADD@003"]
    assert all(n[e] == 4 for e in by["ADD"])
    # chunk j gets rows [4j, 4j+4)
    got = [int(x) for x in gl.to_u64(wits["ADD@002"][0])]
    assert got == [8, 9, 10, 11]


def test_split_ragged_tail_uses_matrix_padding():
    # 9 instances, cap 2^3: chunks of 8 and 1; the tail chunk is padded to
    # the min-2 instance floor using the already-padded matrix rows
    pk = _PK(["ADD"])
    by, wits, n = _split_entries(pk, {"ADD": _cols(16)}, {"ADD": 9}, 3)
    assert by["ADD"] == ["ADD", "ADD@001"]
    assert n["ADD"] == 8 and n["ADD@001"] == 1
    assert wits["ADD@001"][0].lo.shape[-1] == 2  # next_pow2_instance_padding(1)
    got = [int(x) for x in gl.to_u64(wits["ADD@001"][0])]
    assert got == [8, 9]


def test_split_tables_never_segment():
    pk = _PK(["REG"], tables=("REG",))
    with pytest.raises(AssertionError):
        _split_entries(pk, {"REG": _cols(16)}, {"REG": 16}, 2)


def test_entry_order_is_lexicographic():
    pk = _PK(["ADD", "ADDI"])
    by, _, _ = _split_entries(
        pk, {"ADD": _cols(8), "ADDI": _cols(4)}, {"ADD": 8, "ADDI": 4}, 2
    )
    entries = [e for nm in pk.sorted_names() for e in by[nm]]
    assert entries == sorted(entries) == ["ADD", "ADD@001", "ADDI"]


@pytest.mark.skipif(not os.environ.get("CENO_E2E"),
                    reason="set CENO_E2E=1 for full prove+verify round trips")
def test_segmented_prove_verify_roundtrip():
    """fib guest forced into >=2 ADD-bucket segments; verifies, and removing
    a segment (breaking the global-state chain) is rejected."""
    import jax

    from ceno_tpu.emul.insn import InsnKind as K
    from ceno_tpu.emul.programs import fibonacci_program
    from ceno_tpu.pcs import RSSpec
    from ceno_tpu.transcript import basic as tr
    from ceno_tpu.zkvm import vm as zkvm
    from ceno_tpu.zkvm.e2e import run_e2e_with_checkpoint, Checkpoint

    program = fibonacci_program(24)
    kinds = (K.ADD, K.ADDI, K.BEQ, K.JAL, K.ECALL)
    spec = RSSpec(num_queries=9, rate_log=1, basecode_msg_size_log=1)

    # run once unsegmented to fetch pieces, then prove segmented by hand
    from ceno_tpu.emul import CENO_PLATFORM
    from ceno_tpu.emul.platform import setup_platform
    from ceno_tpu.pcs import Basefold
    from ceno_tpu.zkvm.e2e import emulate_program
    from ceno_tpu.zkvm.riscv.config import MemLayout, Rv32imConfig
    from ceno_tpu.zkvm.riscv.tables import REG_COUNT_POW2

    platform = setup_platform("ceno", program, 4096, 4096, 16)
    mem_layout = MemLayout.from_platform(program, platform)
    config = Rv32imConfig.construct(16, kinds=kinds, mem_layout=mem_layout)
    pcs = Basefold(spec, max_num_vars=16)
    init = np.zeros(REG_COUNT_POW2, dtype=np.uint64)
    fixed = config.generate_fixed_traces(program, init)
    pk = config.zkvm_cs.key_gen(pcs, fixed)
    vm_state, steps, pv = emulate_program(program, platform, 4096, init)
    wit, ni, st = config.assign_witnesses(steps, program, vm_state)
    assert ni["ADD"] > 8, "need a bucket big enough to segment"

    t = tr.Transcript(b"riscv")
    proof = zkvm.create_proof(pk, wit, st, ni, pv, t, seg_cap_log2=3)
    segs = [k for k in proof.opcode_proofs if k.startswith("ADD")]
    assert len(segs) >= 2, segs

    tv = tr.Transcript(b"riscv")
    assert bool(jax.device_get(
        zkvm.verify_proof_halt(pk, proof, tv, does_halt=True)))

    # chain tamper: drop the middle ADD segment -> global product unbalanced
    import copy

    bad = copy.copy(proof)
    bad.opcode_proofs = dict(proof.opcode_proofs)
    del bad.opcode_proofs[segs[1]]
    tv2 = tr.Transcript(b"riscv")
    assert not bool(jax.device_get(
        zkvm.verify_proof_halt(pk, bad, tv2, does_halt=True)))
