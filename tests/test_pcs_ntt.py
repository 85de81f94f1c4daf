"""NTT / hypercube-interpolation tests against big-int oracles (mirrors the
reference's naive_fft cross-check, rs.rs:526-600)."""

import numpy as np

from ceno_tpu.field import gl, gl2
from ceno_tpu.pcs import ntt

P = gl.P
rng = np.random.default_rng(21)


def naive_eval_poly(coeffs, x):
    """Horner, big-int."""
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % P
    return acc


def test_fft_matches_naive():
    lg_n = 4
    n = 1 << lg_n
    coeffs = [int(v) for v in rng.integers(0, P, n, dtype=np.uint64)]
    got = gl.to_u64(ntt.fft(gl.from_u64(np.asarray(coeffs, dtype=np.uint64)), lg_n))
    w = ntt.root_of_unity(lg_n)
    want = [naive_eval_poly(coeffs, pow(w, i, P)) for i in range(n)]
    assert [int(x) for x in got] == want


def test_coset_fft_with_zero_tail():
    """rate-2 RS encode: message 2^3, domain 2^4, shift = generator."""
    lg_msg, r = 3, 1
    lg_n = lg_msg + r
    msg = [int(v) for v in rng.integers(0, P, 1 << lg_msg, dtype=np.uint64)]
    shift = ntt.GENERATOR
    got = gl.to_u64(
        ntt.fft(gl.from_u64(np.asarray(msg, dtype=np.uint64)), lg_n, r=r, shift=shift)
    )
    w = ntt.root_of_unity(lg_n)
    want = [naive_eval_poly(msg, shift * pow(w, i, P) % P) for i in range(1 << lg_n)]
    assert [int(x) for x in got] == want


def test_fft_ext_values():
    lg_n = 3
    n = 1 << lg_n
    c0 = rng.integers(0, P, n, dtype=np.uint64)
    c1 = rng.integers(0, P, n, dtype=np.uint64)
    got = gl2.to_u64(ntt.fft(gl2.from_u64(c0, c1), lg_n))
    w = ntt.root_of_unity(lg_n)
    want0 = [naive_eval_poly([int(v) for v in c0], pow(w, i, P)) for i in range(n)]
    want1 = [naive_eval_poly([int(v) for v in c1], pow(w, i, P)) for i in range(n)]
    assert [int(x) for x in got[:, 0]] == want0
    assert [int(x) for x in got[:, 1]] == want1


def test_interpolate_over_hypercube():
    """coeffs from evals: eval at hypercube point b must equal
    sum_i c_i * prod_{j in bits(i)} b_j."""
    lg_n = 3
    n = 1 << lg_n
    evals = [int(v) for v in rng.integers(0, P, n, dtype=np.uint64)]
    coeffs = gl.to_u64(
        ntt.interpolate_jit(gl.from_u64(np.asarray(evals, dtype=np.uint64)))
    )
    for b in range(n):
        acc = 0
        for i in range(n):
            if i & ~b == 0:  # all monomial vars set in b
                acc = (acc + int(coeffs[i])) % P
        assert acc == evals[b], b


def test_bitrev_involution():
    x = gl.from_u64(rng.integers(0, P, 16, dtype=np.uint64))
    y = ntt.bitrev(ntt.bitrev(x))
    assert np.array_equal(gl.to_u64(x), gl.to_u64(y))
