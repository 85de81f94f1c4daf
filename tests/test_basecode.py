"""Basecode encoding (the reference's alternative Basefold code).

Mirrors the reference's own test strategy
(/root/reference/mpcs/src/basefold/encoding.rs:204-262 test_codeword_folding,
basecode.rs:434-447 prover_verifier_consistency) plus an independent
big-int oracle for the encoder itself.
"""

import numpy as np
import pytest

from ceno_tpu.field import gl, gl2
from ceno_tpu.pcs import ntt
from ceno_tpu.pcs.basecode import Basecode, BasecodeSpec, fold_message_lr
from ceno_tpu.pcs.basefold import _interp2

P = gl.P
SPEC = BasecodeSpec(num_queries=9, rate_log=2, basecode_msg_size_log=3)


def _rand_ext(n, seed):
    rng = np.random.default_rng(seed)
    return gl2.from_u64(
        rng.integers(0, P, size=n, dtype=np.uint64),
        rng.integers(0, P, size=n, dtype=np.uint64),
    )


def _oracle_encode(code: Basecode, msg_u64):
    """Independent big-int reimplementation of the construction
    (basecode.rs:226-312): chunked Horner RS over {1..m*rate}, then
    per-level (a + t*b, a - t*b) expansion with the natural-order tables."""
    spec = code.spec
    k = len(msg_u64).bit_length() - 1
    msg_log = min(spec.basecode_msg_size_log, k)
    m, rate = 1 << msg_log, 1 << spec.rate_log
    cws = []
    for c in range(len(msg_u64) // m):
        chunk = [int(x) for x in msg_u64[c * m : (c + 1) * m]]
        cws.append(
            [sum(cj * pow(d, j, P) for j, cj in enumerate(chunk)) % P
             for d in range(1, m * rate + 1)]
        )
    for i in range(msg_log, k):
        t = [int(x) for x in code._flat[1 << (i + spec.rate_log):
                                        1 << (i + spec.rate_log + 1)]]
        nxt = []
        for a, b in zip(cws[0::2], cws[1::2]):
            rhs = [bj * tj % P for bj, tj in zip(b, t)]
            nxt.append([(aj + r) % P for aj, r in zip(a, rhs)]
                       + [(aj - r) % P for aj, r in zip(a, rhs)])
        cws = nxt
    assert len(cws) == 1
    return np.asarray(cws[0], dtype=np.uint64)


def test_encode_matches_bigint_oracle():
    code = Basecode(SPEC, full_msg_log=6)
    rng = np.random.default_rng(3)
    msg = rng.integers(0, P, size=1 << 6, dtype=np.uint64)
    got = gl.to_u64(code.encode(gl.from_u64(msg), use_jit=False))
    np.testing.assert_array_equal(got, _oracle_encode(code, msg))


def test_table_regeneration_deterministic():
    """Verifier analog of basecode.rs prover_verifier_consistency: the
    fold coefficients regenerate identically from the seed alone."""
    a = Basecode(SPEC, full_msg_log=6)
    b = Basecode(SPEC, full_msg_log=6)
    for level in range(6 + SPEC.rate_log):
        xa, wa = a.fold_table(level)
        xb, wb = b.fold_table(level)
        np.testing.assert_array_equal(gl.to_u64(xa), gl.to_u64(xb))
        np.testing.assert_array_equal(gl.to_u64(wa), gl.to_u64(wb))
        # w really is -1/(2 x0)
        x = gl.to_u64(xa).astype(object)
        w = gl.to_u64(wa).astype(object)
        for xi, wi in zip(x.ravel(), w.ravel()):
            assert (P - pow(2 * int(xi) % P, P - 2, P)) == int(wi)


def _fold_bitrev_codeword(code, cw, challenge):
    """encoding.rs:66-100 fold_bitreversed_codeword."""
    n = cw.c0.lo.shape[-1]
    level = n.bit_length() - 2
    y0, y1 = gl2.deinterleave(cw)
    x0, w = code.fold_table(level)
    return _interp2(y0, y1, x0, w, challenge)


@pytest.mark.parametrize("num_vars", [6])
def test_codeword_folding(num_vars):
    """fold(bitrev(code(m))) == bitrev(code(fold_lr(m))), iterated down to
    the base message (encoding.rs:204-262)."""
    code = Basecode(SPEC, full_msg_log=num_vars)
    msg = _rand_ext(1 << num_vars, seed=11)
    challenge = gl2.const(1234567, 7654321)

    folded_cw = _fold_bitrev_codeword(
        code, ntt.bitrev(code.encode(msg, use_jit=False)), challenge
    )
    msg = fold_message_lr(msg, challenge)
    # fold exactly down TO the base message: the naive-RS base code is
    # not itself foldable, so (like the reference test) stop there
    for rnd in range(num_vars - SPEC.basecode_msg_size_log):
        expect = ntt.bitrev(code.encode(msg, use_jit=False))
        np.testing.assert_array_equal(
            gl2.to_u64(folded_cw), gl2.to_u64(expect),
            err_msg=f"round {rnd}",
        )
        folded_cw = _fold_bitrev_codeword(code, folded_cw, challenge)
        msg = fold_message_lr(msg, challenge)


def test_encode_small_is_whole_message_rs():
    code = Basecode(SPEC, full_msg_log=6)
    rng = np.random.default_rng(5)
    msg = rng.integers(0, P, size=1 << 3, dtype=np.uint64)
    got = gl.to_u64(code.encode_small(gl.from_u64(msg)))
    chunk = [int(x) for x in msg]
    expect = [sum(cj * pow(d, j, P) for j, cj in enumerate(chunk)) % P
              for d in range(1, len(msg) * (1 << SPEC.rate_log) + 1)]
    np.testing.assert_array_equal(got, np.asarray(expect, dtype=np.uint64))
