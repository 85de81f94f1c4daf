"""Opcode-circuit prove -> verify round trip over a synthetic test circuit
(mirrors /root/reference/ceno_zkvm/src/scheme/tests.rs
test_rw_lk_expression_combination)."""

import jax
import numpy as np
import pytest

from ceno_tpu.field import gl, gl2
from ceno_tpu.pcs import Basefold, RSSpec
from ceno_tpu.transcript import basic as tr
from ceno_tpu.zkvm.circuit_builder import ConstraintSystem, ROMType
from ceno_tpu.zkvm.scheme.prover import create_opcode_proof
from ceno_tpu.zkvm.scheme.verifier import verify_opcode_proof

P = gl.P
SPEC = RSSpec(num_queries=9, rate_log=1, basecode_msg_size_log=1)


def build_test_cs(rw: int, lk: int, with_zerocheck: bool = False):
    cs = ConstraintSystem("TEST")
    reg_id = cs.create_witin("reg_id")
    for _ in range(rw):
        cs.read_record([1, reg_id])
        cs.write_record([1, reg_id])
    for _ in range(lk):
        cs.lk_record(ROMType.U16, [reg_id])
    if with_zerocheck:
        cs.require_zero(reg_id * reg_id - reg_id, "bool")
    return cs, reg_id


def run_roundtrip(rw, lk, num_instances, with_zerocheck=False, tamper=None):
    cs, _ = build_test_cs(rw, lk, with_zerocheck)
    pcs = Basefold(SPEC, max_num_vars=8)

    from ceno_tpu.zkvm.scheme.utils import next_pow2_instance_padding

    N = next_pow2_instance_padding(num_instances)
    witnesses = [gl.ones((N,))]

    t = tr.Transcript(b"test")
    cww = pcs.commit(witnesses)
    Basefold.write_commitment(cww.to_commitment(), t)
    challenges = [t.read_challenge(), t.read_challenge()]

    proof = create_opcode_proof(
        "TEST", pcs, cs, witnesses, cww, [], num_instances, t, challenges
    )
    if tamper is not None:
        proof = tamper(proof)

    tv = tr.Transcript(b"test")
    Basefold.write_commitment(proof.wits_commit, tv)
    v_challenges = [tv.read_challenge(), tv.read_challenge()]
    out = verify_opcode_proof("TEST", pcs, cs, proof, [], tv, v_challenges)
    return bool(jax.device_get(out.ok))


def test_opcode_roundtrip():
    assert run_roundtrip(2, 3, num_instances=8)


def test_opcode_non_pow2_instances():
    """Selector splicing beyond num_instances."""
    assert run_roundtrip(2, 3, num_instances=6)


def test_opcode_with_zerocheck():
    assert run_roundtrip(2, 3, num_instances=8, with_zerocheck=True)


def test_opcode_tampered_record_eval_rejected():
    def tamper(proof):
        bad = list(proof.r_records_in_evals)
        bad[0] = gl2.add(bad[0], gl2.ones(()))
        return proof._replace(r_records_in_evals=bad)

    assert not run_roundtrip(2, 3, num_instances=8, tamper=tamper)
