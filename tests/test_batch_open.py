"""PCS full surface: open / batch_open / batch_verify.

Mirrors the reference's multi-point multi-commitment opening path
(/root/reference/mpcs/src/basefold.rs:467-1072, commit_phase.rs:179
batch_commit_phase, query_phase.rs:67): polynomials of different num_vars,
committed separately, opened at several points, reduced to one point by a
sumcheck and one batched FRI argument.  Cross-checked against MLE ground
truth with tamper rejection.
"""

import numpy as np
import pytest

from ceno_tpu.field import gl, gl2
from ceno_tpu.mle import mle as mle_mod
from ceno_tpu.pcs import Basefold, RSSpec
from ceno_tpu.pcs.basefold import Evaluation, check
from ceno_tpu.transcript import basic as tr

SPEC = RSSpec(num_queries=9, rate_log=1, basecode_msg_size_log=2)
MAXV = 8


def _rand_poly(rng, nv):
    return gl.from_u64(
        rng.integers(0, gl.P, size=1 << nv, dtype=np.uint64)
    )


def _rand_point(rng, nv):
    return [
        gl2.const(int(a), int(b))
        for a, b in rng.integers(0, gl.P, size=(nv, 2), dtype=np.uint64)
    ]


def _setup(rng, nvs, point_assignments):
    """nvs: poly sizes; point_assignments: list of (poly, point) index pairs
    with point num_vars implied by the poly."""
    pcs = Basefold(SPEC, max_num_vars=MAXV)
    polys = [_rand_poly(rng, nv) for nv in nvs]
    cwws = [pcs.commit([p]) for p in polys]
    n_points = max(pt for _, pt in point_assignments) + 1
    points = [None] * n_points
    for pi, pt in point_assignments:
        if points[pt] is None:
            points[pt] = _rand_point(rng, nvs[pi])
        else:
            assert len(points[pt]) == nvs[pi]
    evals = [
        Evaluation(pi, pt, mle_mod.evaluate(polys[pi], points[pt]))
        for pi, pt in point_assignments
    ]
    return pcs, polys, cwws, points, evals


def test_single_open_verify():
    rng = np.random.default_rng(7)
    pcs = Basefold(SPEC, max_num_vars=MAXV)
    poly = _rand_poly(rng, 6)
    point = _rand_point(rng, 6)
    val = mle_mod.evaluate(poly, point)
    cww = pcs.commit([poly])
    t = tr.Transcript(b"open")
    proof = pcs.open(cww, point, val, t)
    tv = tr.Transcript(b"open")
    check(pcs.verify(cww.to_commitment(), point, val, proof, tv))


def test_batch_open_mixed_sizes():
    """3 polys of sizes 6/5/4 vars, opened at 3 points; two polys share no
    point, the largest is opened twice (two different points)."""
    rng = np.random.default_rng(11)
    pcs, polys, cwws, points, evals = _setup(
        rng, [6, 5, 4], [(0, 0), (1, 1), (2, 2), (0, 3)] ,
    )
    # point 3 is a second point for poly 0
    t = tr.Transcript(b"batch")
    proof = pcs.batch_open(cwws, points, evals, t)
    tv = tr.Transcript(b"batch")
    comms = [c.to_commitment() for c in cwws]
    check(pcs.batch_verify(comms, points, evals, proof, tv))


def test_batch_open_shared_point():
    """Two same-size polys opened at the SAME point plus one smaller poly."""
    rng = np.random.default_rng(13)
    pcs = Basefold(SPEC, max_num_vars=MAXV)
    polys = [_rand_poly(rng, 5), _rand_poly(rng, 5), _rand_poly(rng, 3)]
    cwws = [pcs.commit([p]) for p in polys]
    pt_a = _rand_point(rng, 5)
    pt_b = _rand_point(rng, 3)
    points = [pt_a, pt_b]
    evals = [
        Evaluation(0, 0, mle_mod.evaluate(polys[0], pt_a)),
        Evaluation(1, 0, mle_mod.evaluate(polys[1], pt_a)),
        Evaluation(2, 1, mle_mod.evaluate(polys[2], pt_b)),
    ]
    t = tr.Transcript(b"batch")
    proof = pcs.batch_open(cwws, points, evals, t)
    tv = tr.Transcript(b"batch")
    check(pcs.batch_verify([c.to_commitment() for c in cwws], points, evals,
                           proof, tv))


def test_batch_verify_rejects_wrong_eval():
    rng = np.random.default_rng(17)
    pcs, polys, cwws, points, evals = _setup(rng, [5, 4], [(0, 0), (1, 1)])
    t = tr.Transcript(b"batch")
    proof = pcs.batch_open(cwws, points, evals, t)
    bad = list(evals)
    bad[1] = Evaluation(1, 1, gl2.add(evals[1].value, gl2.const(1)))
    tv = tr.Transcript(b"batch")
    with pytest.raises(ValueError):
        check(pcs.batch_verify([c.to_commitment() for c in cwws], points, bad,
                               proof, tv))


def test_batch_verify_rejects_tampered_final_message():
    rng = np.random.default_rng(19)
    pcs, polys, cwws, points, evals = _setup(rng, [5, 4], [(0, 0), (1, 1)])
    t = tr.Transcript(b"batch")
    proof = pcs.batch_open(cwws, points, evals, t)
    fm = proof.final_message
    bad_fm = gl2.add(fm, gl2.broadcast_to(gl2.const(1), fm.shape))
    bad = proof._replace(final_message=bad_fm)
    tv = tr.Transcript(b"batch")
    with pytest.raises(ValueError):
        check(pcs.batch_verify([c.to_commitment() for c in cwws], points,
                               evals, bad, tv))


def test_batch_verify_rejects_wrong_commitment():
    rng = np.random.default_rng(23)
    pcs, polys, cwws, points, evals = _setup(rng, [5, 4], [(0, 0), (1, 1)])
    t = tr.Transcript(b"batch")
    proof = pcs.batch_open(cwws, points, evals, t)
    other = pcs.commit([_rand_poly(rng, 4)])
    comms = [cwws[0].to_commitment(), other.to_commitment()]
    tv = tr.Transcript(b"batch")
    with pytest.raises(ValueError):
        check(pcs.batch_verify(comms, points, evals, proof, tv))
