"""Basefold PCS commit->open->verify round trips against MLE ground truth
(mirrors the reference's basefold.rs bottom tests).  Small spec (rate 1/2,
basecode 2^1, 17 queries) keeps test sizes tractable; the protocol shape is
identical to the default (200 queries, basecode 2^7)."""

import jax
import numpy as np
import pytest

from ceno_tpu.field import fops, gl, gl2
from ceno_tpu.mle import mle as mle_mod
from ceno_tpu.pcs import Basefold, RSSpec
from ceno_tpu.pcs.basefold import check
from ceno_tpu.transcript import basic as tr

P = gl.P
SPEC = RSSpec(num_queries=9, rate_log=1, basecode_msg_size_log=1)


def rand_gl(rng, n):
    return gl.from_u64(rng.integers(0, P, size=n, dtype=np.uint64))


def rand_point(rng, n):
    return [
        gl2.from_u64(
            rng.integers(0, P, dtype=np.uint64), rng.integers(0, P, dtype=np.uint64)
        )
        for _ in range(n)
    ]


def open_and_verify(pcs, polys, num_vars, seed, tamper=None):
    rng = np.random.default_rng(seed)
    cww = pcs.commit(polys)
    comm = cww.to_commitment()

    point = rand_point(rng, num_vars)
    evals = [mle_mod.evaluate(fops.to_ext(p), point) for p in polys]

    t = tr.Transcript(b"basefold")
    Basefold.write_commitment(comm, t)
    proof = pcs.simple_batch_open(cww, point, evals, t)

    if tamper is not None:
        proof = tamper(proof)

    tv = tr.Transcript(b"basefold")
    Basefold.write_commitment(comm, tv)
    ok = pcs.simple_batch_verify(comm, point, evals, proof, tv)
    check(ok)


@pytest.mark.parametrize("num_vars", [4, 6])
def test_single_poly_roundtrip(num_vars):
    rng = np.random.default_rng(31 + num_vars)
    pcs = Basefold(SPEC, max_num_vars=8)
    polys = [rand_gl(rng, 1 << num_vars)]
    open_and_verify(pcs, polys, num_vars, seed=num_vars)


def test_batch_roundtrip():
    rng = np.random.default_rng(37)
    pcs = Basefold(SPEC, max_num_vars=8)
    polys = [rand_gl(rng, 1 << 5) for _ in range(3)]
    open_and_verify(pcs, polys, 5, seed=1)


def test_trivial_commitment():
    """Polys at/below the basecode size ship in the clear."""
    rng = np.random.default_rng(41)
    pcs = Basefold(RSSpec(num_queries=5, rate_log=1, basecode_msg_size_log=3),
                   max_num_vars=8)
    polys = [rand_gl(rng, 1 << 2) for _ in range(2)]
    open_and_verify(pcs, polys, 2, seed=2)


def test_tampered_final_message_rejected():
    rng = np.random.default_rng(43)
    pcs = Basefold(SPEC, max_num_vars=8)
    polys = [rand_gl(rng, 1 << 4)]

    def tamper(proof):
        bad = gl2.add(proof.final_message, gl2.ones(proof.final_message.shape))
        return proof._replace(final_message=bad)

    with pytest.raises(ValueError):
        open_and_verify(pcs, polys, 4, seed=3, tamper=tamper)


def test_wrong_eval_rejected():
    rng = np.random.default_rng(47)
    pcs = Basefold(SPEC, max_num_vars=8)
    polys = [rand_gl(rng, 1 << 4)]
    cww = pcs.commit(polys)
    comm = cww.to_commitment()
    point = rand_point(rng, 4)
    evals = [mle_mod.evaluate(fops.to_ext(polys[0]), point)]
    t = tr.Transcript(b"bf")
    proof = pcs.simple_batch_open(cww, point, evals, t)
    bad_evals = [gl2.add(evals[0], gl2.ones(()))]
    tv = tr.Transcript(b"bf")
    ok = pcs.simple_batch_verify(comm, point, bad_evals, proof, tv)
    with pytest.raises(ValueError):
        check(ok)


# -- Basecode-in-Basefold (left-right code integration) ----------------------


def test_basecode_roundtrip():
    """Basefold over the Basecode foldable code (BasefoldBasecodeParams
    analog, basefold/structure.rs:247-259): commit/open/verify round trip
    plus tamper rejection, exercising the left-right message-fold gates in
    _encode_poly and the verifier re-encode (basefold.rs:130,
    query_phase.rs:162)."""
    from ceno_tpu.pcs.basecode import BasecodeSpec

    rng = np.random.default_rng(47)
    spec = BasecodeSpec(num_queries=9, rate_log=1, basecode_msg_size_log=1)
    pcs = Basefold(spec, max_num_vars=8)
    polys = [rand_gl(rng, 1 << 5) for _ in range(2)]
    open_and_verify(pcs, polys, 5, seed=3)


def test_basecode_tamper_rejected():
    from ceno_tpu.pcs.basecode import BasecodeSpec

    rng = np.random.default_rng(53)
    spec = BasecodeSpec(num_queries=9, rate_log=1, basecode_msg_size_log=1)
    pcs = Basefold(spec, max_num_vars=8)
    polys = [rand_gl(rng, 1 << 4)]

    def tamper(proof):
        fm = proof.final_message
        bumped = gl2.add(fm, gl2.ones(fm.c0.lo.shape))
        return proof._replace(final_message=bumped)

    with pytest.raises(ValueError):
        open_and_verify(pcs, polys, 4, seed=4, tamper=tamper)
