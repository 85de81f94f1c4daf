"""Canonical proof serialization: deterministic bytes + exact round trip
(scheme.rs:119 `ZKVMProof: Serialize` / benches/fibonacci.rs:55-63 bincode
length analog)."""

import jax
import numpy as np

from ceno_tpu.field import gl, gl2
from ceno_tpu.pcs import Basefold, RSSpec
from ceno_tpu.transcript import basic as tr
from ceno_tpu.zkvm.circuit_builder import ConstraintSystem, ROMType
from ceno_tpu.zkvm.scheme.prover import create_opcode_proof
from ceno_tpu.zkvm.scheme.verifier import verify_opcode_proof
from ceno_tpu.zkvm.serialize import (
    deserialize_proof,
    proof_size_bytes,
    serialize_proof,
)
from ceno_tpu.zkvm.structs import ZKVMProof

SPEC = RSSpec(num_queries=9, rate_log=1, basecode_msg_size_log=1)


def _small_opcode_proof():
    cs = ConstraintSystem("TEST")
    reg_id = cs.create_witin("reg_id")
    cs.read_record([1, reg_id])
    cs.write_record([1, reg_id])
    cs.lk_record(ROMType.U16, [reg_id])
    pcs = Basefold(SPEC, max_num_vars=8)
    witnesses = [gl.ones((8,))]
    t = tr.Transcript(b"test")
    cww = pcs.commit(witnesses)
    Basefold.write_commitment(cww.to_commitment(), t)
    challenges = [t.read_challenge(), t.read_challenge()]
    proof = create_opcode_proof(
        "TEST", pcs, cs, witnesses, cww, [], 8, t, challenges
    )
    return cs, pcs, proof


def _eq(a, b):
    from ceno_tpu.field.gl import Gl
    from ceno_tpu.field.gl2 import Gl2

    if isinstance(a, Gl):
        return isinstance(b, Gl) and np.array_equal(
            np.asarray(jax.device_get(gl.to_u64(a))),
            np.asarray(jax.device_get(gl.to_u64(b))),
        )
    if isinstance(a, Gl2):
        return isinstance(b, Gl2) and _eq(a.c0, b.c0) and _eq(a.c1, b.c1)
    if isinstance(a, (list, tuple)):
        return type(a) is type(b) and len(a) == len(b) and all(
            _eq(x, y) for x, y in zip(a, b)
        )
    if isinstance(a, dict):
        return set(a) == set(b) and all(_eq(a[k], b[k]) for k in a)
    if hasattr(type(a), "_fields"):
        return type(a) is type(b) and all(
            _eq(x, y) for x, y in zip(a, b)
        )
    return a == b


def test_roundtrip_and_determinism():
    cs, pcs, p = _small_opcode_proof()
    proof = ZKVMProof([[0], [1], [2]], {0: gl2.const(0)})
    proof.opcode_proofs["TEST"] = (0, p)

    blob = serialize_proof(proof)
    assert blob[:4] == b"CTP1"
    assert serialize_proof(proof) == blob  # deterministic
    assert proof_size_bytes(proof) == len(blob)

    back = deserialize_proof(blob)
    assert _eq(back.raw_pi, proof.raw_pi)
    assert set(back.opcode_proofs) == {"TEST"}
    i, p2 = back.opcode_proofs["TEST"]
    assert i == 0 and _eq(p2, p)
    # re-serialization of the decoded proof is byte-identical
    assert serialize_proof(back) == blob


def test_deserialized_proof_verifies():
    cs, pcs, p = _small_opcode_proof()
    proof = ZKVMProof([[0]], {})
    proof.opcode_proofs["TEST"] = (0, p)
    back = deserialize_proof(serialize_proof(proof))
    _, p2 = back.opcode_proofs["TEST"]

    tv = tr.Transcript(b"test")
    Basefold.write_commitment(p2.wits_commit, tv)
    chals = [tv.read_challenge(), tv.read_challenge()]
    out = verify_opcode_proof("TEST", pcs, cs, p2, [], tv, chals)
    assert bool(jax.device_get(out.ok))


def test_canonical_field_encoding():
    """Unreduced vs reduced limb representations of the same element encode
    to the same bytes (to_u64 canonicalizes)."""
    a = gl.from_u64(np.asarray([5], dtype=np.uint64))
    b = gl.add(a, gl.from_u64(np.asarray([gl.P - 5], dtype=np.uint64)))
    z = gl.from_u64(np.asarray([0], dtype=np.uint64))
    pa = ZKVMProof([[0]], {0: gl2.Gl2(b, z.reshape(1))})
    pb = ZKVMProof([[0]], {0: gl2.Gl2(z.reshape(1), z.reshape(1))})
    assert serialize_proof(pa) == serialize_proof(pb)
