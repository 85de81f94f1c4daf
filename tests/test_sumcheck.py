"""Sumcheck prove/verify round trips, mirroring the reference's test strategy
(/root/reference/sumcheck/src/test.rs): random virtual polys of degree <= 3,
prove, verify with the shard-oblivious verifier, and check the final subclaim
against ground-truth evaluation.  Shard-count invariance (T=1 vs T=4 giving
identical transcripts/proofs) is the reference's multi-thread oracle.

Host-sync discipline: device readbacks cost ~1s over the TPU tunnel, so each
test funnels every comparison into ONE readback via `all_equal`.
"""

import jax
import numpy as np
import pytest

from ceno_tpu.field import fops, gl, gl2
from ceno_tpu.sumcheck import VirtualPoly, check, prove, verify
from ceno_tpu.transcript import basic as tr


def rand_gl(rng, n):
    return gl.from_u64(rng.integers(0, gl.P, size=n, dtype=np.uint64))


def rand_gl2(rng, shape=()):
    return gl2.Gl2(rand_gl(rng, shape), rand_gl(rng, shape))


def all_equal(pairs) -> bool:
    """One fused device computation + one host sync for many comparisons."""
    import jax.numpy as jnp

    acc = jnp.asarray(True)
    for a, b in pairs:
        acc = acc & jnp.all(fops.eq(fops.to_ext(a), fops.to_ext(b)))
    return bool(jax.device_get(acc))


def make_poly(rng, num_vars, shapes):
    """shapes: list of (degree, mle_num_vars) per term."""
    vp = VirtualPoly(num_vars)
    for deg, k in shapes:
        mles = [rand_gl(rng, 1 << k) for _ in range(deg)]
        vp.add_mle_list(mles, coeff=int(rng.integers(1, gl.P, dtype=np.uint64)))
    return vp


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_prove_verify_roundtrip(degree):
    rng = np.random.default_rng(42 + degree)
    n = 5
    vp = make_poly(rng, n, [(degree, n), (degree, n)])
    claimed = vp.sum_over_hypercube()

    proof, final_evals, _ = prove(vp, tr.new(b"test"))
    assert len(final_evals) == len(vp.mles)

    subclaim, _ = verify(claimed, proof, n, vp.max_degree, tr.new(b"test"))
    check(subclaim)
    want = vp.evaluate(subclaim.point)
    assert all_equal([(want, subclaim.expected_evaluation)])


def test_shard_invariance():
    """Proof bytes must be identical for T=1 and T=4 (same-protocol check:
    the reference absorbs total vars, and round evals are summed across
    shards — SURVEY.md section 2.9 invariant)."""
    rng = np.random.default_rng(7)
    n = 6
    vp1 = make_poly(rng, n, [(2, n), (3, n)])
    ts = tr.new(b"shards")
    proof1, evals1, _ = prove(vp1, ts, num_shards=1)
    proof4, evals4, _ = prove(vp1, ts, num_shards=4)

    pairs = (
        list(zip(proof1.round_evals, proof4.round_evals))
        + list(zip(proof1.point, proof4.point))
        + list(zip(evals1, evals4))
    )
    assert all_equal(pairs)


def test_heterogeneous_num_vars():
    """Terms with fewer variables are scaled by 2^(missing vars)."""
    rng = np.random.default_rng(11)
    n = 5
    vp = make_poly(rng, n, [(2, n), (2, 3), (1, 2)])
    claimed = vp.sum_over_hypercube()
    proof, _, _ = prove(vp, tr.new(b"het"))
    subclaim, _ = verify(claimed, proof, n, vp.max_degree, tr.new(b"het"))
    check(subclaim)
    want = vp.evaluate(subclaim.point)
    assert all_equal([(want, subclaim.expected_evaluation)])


def test_bad_claim_rejected():
    rng = np.random.default_rng(13)
    n = 4
    vp = make_poly(rng, n, [(2, n)])
    claimed = gl2.add(vp.sum_over_hypercube(), gl2.ones(()))
    proof, _, _ = prove(vp, tr.new(b"bad"))
    subclaim, _ = verify(claimed, proof, n, vp.max_degree, tr.new(b"bad"))
    with pytest.raises(ValueError):
        check(subclaim)


def test_ext_mles():
    """Extension-field MLEs (as in tower layers beyond the first)."""
    rng = np.random.default_rng(17)
    n = 4
    vp = VirtualPoly(n)
    m1 = rand_gl2(rng, (1 << n,))
    m2 = rand_gl2(rng, (1 << n,))
    vp.add_mle_list([m1, m2], coeff=3)
    claimed = vp.sum_over_hypercube()
    proof, _, _ = prove(vp, tr.new(b"ext"))
    subclaim, _ = verify(claimed, proof, n, 2, tr.new(b"ext"))
    check(subclaim)
    want = vp.evaluate(subclaim.point)
    assert all_equal([(want, subclaim.expected_evaluation)])


def test_fused_phase_matches_per_round(monkeypatch):
    """The whole-phase fused kernel (CENO_SUMCHECK_FUSE_MIN) must emit the
    exact same proof bytes/challenges as the per-round path, including with
    a shard (phase-2) tail and heterogeneous num_vars."""
    rng = np.random.default_rng(23)
    n = 5
    vp = make_poly(rng, n, [(3, n), (2, 3)])
    proof_ref, evals_ref, _ = prove(vp, tr.new(b"fuse"), num_shards=2)

    monkeypatch.setenv("CENO_SUMCHECK_FUSE_MIN", "1")
    proof_fused, evals_fused, _ = prove(vp, tr.new(b"fuse"), num_shards=2)

    pairs = (
        list(zip(proof_ref.round_evals, proof_fused.round_evals))
        + list(zip(proof_ref.point, proof_fused.point))
        + list(zip(evals_ref, evals_fused))
    )
    assert all_equal(pairs)

    # chunked fusion (two kernels) must agree too
    monkeypatch.setenv("CENO_SUMCHECK_FUSE", "2")
    proof_chunk, evals_chunk, _ = prove(vp, tr.new(b"fuse"), num_shards=2)
    pairs = list(zip(proof_ref.round_evals, proof_chunk.round_evals)) + list(
        zip(evals_ref, evals_chunk)
    )
    assert all_equal(pairs)


def test_scan_fused_prover_matches_per_round(monkeypatch):
    """The all-scan whole-prove program (sumcheck/fused.py) must emit the
    exact same round evals / challenges / final evals / transcript state as
    the per-round path, including shards (phase 2) and mixed-degree terms.

    XLA:CPU compiles the scan program pathologically slowly (~80 s), so on
    CPU-only boxes this runs one small config; with a TPU attached it is
    seconds after the first compile (persistent cache)."""
    on_cpu = jax.default_backend() == "cpu"
    rng = np.random.default_rng(31)
    monkeypatch.setenv("CENO_SUMCHECK_FUSED_MIN_VARS", "4")

    configs = [(6, 2)] if on_cpu else [(6, 2), (8, 4)]
    for n, T in configs:
        vp = VirtualPoly(n)
        m = [rand_gl(rng, 1 << n) for _ in range(3)]
        vp.add_mle_list(m, coeff=7)
        vp.add_mle_list(m[:2], coeff=13)

        monkeypatch.setenv("CENO_SUMCHECK_FUSED", "0")
        proof_ref, evals_ref, ts_ref = prove(vp, tr.new(b"scanf"), num_shards=T)
        monkeypatch.setenv("CENO_SUMCHECK_FUSED", "1")
        proof_f, evals_f, ts_f = prove(vp, tr.new(b"scanf"), num_shards=T)

        pairs = (
            list(zip(proof_ref.round_evals, proof_f.round_evals))
            + list(zip(proof_ref.point, proof_f.point))
            + list(zip(evals_ref, evals_f))
        )
        assert all_equal(pairs)
        assert (gl.to_u64(ts_ref.state) == gl.to_u64(ts_f.state)).all()

        claimed = vp.sum_over_hypercube()
        subclaim, _ = verify(claimed, proof_f, n, 3, tr.new(b"scanf"))
        check(subclaim)
