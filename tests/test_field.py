"""Field arithmetic tests against a pure-Python big-int oracle."""

import jax
import numpy as np

from ceno_tpu.field import gl, gl2

P = gl.P
W = gl2.W

rng = np.random.default_rng(0)

_jit_mul = jax.jit(gl.mul)
_jit_add = jax.jit(gl.add)
_jit_sub = jax.jit(gl.sub)
_jit_inv = jax.jit(gl.inv)

EDGE = np.array(
    [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, 0xFFFFFFFF00000000, 2**63, P - 0xFFFFFFFF],
    dtype=np.uint64,
)


def rand_u64(n):
    return rng.integers(0, P, size=n, dtype=np.uint64)


def _pairs(edge):
    a, b = np.meshgrid(edge, edge)
    return a.ravel(), b.ravel()


def test_roundtrip():
    x = rand_u64(1000)
    assert np.array_equal(gl.to_u64(gl.from_u64(x)), x)


def test_add_sub_oracle():
    a = np.concatenate([rand_u64(1000), _pairs(EDGE)[0]])
    b = np.concatenate([rand_u64(1000), _pairs(EDGE)[1]])
    got = gl.to_u64(_jit_add(gl.from_u64(a), gl.from_u64(b)))
    want = (a.astype(object) + b.astype(object)) % P
    assert np.array_equal(got.astype(object), want)
    got = gl.to_u64(_jit_sub(gl.from_u64(a), gl.from_u64(b)))
    want = (a.astype(object) - b.astype(object)) % P
    assert np.array_equal(got.astype(object), want)


def test_mul_oracle():
    a = np.concatenate([rand_u64(1000), _pairs(EDGE)[0]])
    b = np.concatenate([rand_u64(1000), _pairs(EDGE)[1]])
    got = gl.to_u64(_jit_mul(gl.from_u64(a), gl.from_u64(b)))
    want = np.array([(int(x) * int(y)) % P for x, y in zip(a, b)], dtype=object)
    assert np.array_equal(got.astype(object), want)


def test_mul_small():
    a = rand_u64(100)
    for c in [0, 1, 7, 41, 0xFFFF, 0xFFFFFFFF]:
        got = gl.to_u64(jax.jit(gl.mul_small, static_argnums=1)(gl.from_u64(a), c))
        want = np.array([(int(x) * c) % P for x in a], dtype=object)
        assert np.array_equal(got.astype(object), want), c


def test_inv():
    a = np.concatenate([rand_u64(200), EDGE[EDGE != 0]])
    inv = gl.to_u64(_jit_inv(gl.from_u64(a)))
    prod = gl.to_u64(_jit_mul(gl.from_u64(a), gl.from_u64(inv)))
    assert np.all(prod == 1)


def test_pow():
    a = rand_u64(50)
    got = gl.to_u64(jax.jit(lambda x: gl.pow_const(x, 7))(gl.from_u64(a)))
    want = np.array([pow(int(x), 7, P) for x in a], dtype=object)
    assert np.array_equal(got.astype(object), want)


def test_sum_reduce():
    a = rand_u64(1537)  # non-power-of-two
    got = int(gl.to_u64(jax.jit(gl.sum_reduce)(gl.from_u64(a))))
    want = sum(int(x) for x in a) % P
    assert got == want


def test_sum_reduce_axis():
    a = rand_u64(64).reshape(8, 8)
    got = gl.to_u64(jax.jit(lambda x: gl.sum_reduce(x, axis=0))(gl.from_u64(a)))
    want = np.array([sum(int(x) for x in a[:, j]) % P for j in range(8)], dtype=object)
    assert np.array_equal(got.astype(object), want)


# --- extension field ---


def ext_mul_oracle(a, b):
    a0, a1, b0, b1 = int(a[0]), int(a[1]), int(b[0]), int(b[1])
    return ((a0 * b0 + W * a1 * b1) % P, (a0 * b1 + a1 * b0) % P)


def test_ext_mul():
    a = rand_u64(200).reshape(100, 2)
    b = rand_u64(200).reshape(100, 2)
    ga = gl2.from_u64(a[:, 0], a[:, 1])
    gb = gl2.from_u64(b[:, 0], b[:, 1])
    got = gl2.to_u64(jax.jit(gl2.mul)(ga, gb))
    for i in range(100):
        want = ext_mul_oracle(a[i], b[i])
        assert (int(got[i, 0]), int(got[i, 1])) == want


def test_ext_inv():
    a = rand_u64(200).reshape(100, 2)
    ga = gl2.from_u64(a[:, 0], a[:, 1])
    prod = gl2.to_u64(jax.jit(lambda x: gl2.mul(x, gl2.inv(x)))(ga))
    assert np.all(prod[:, 0] == 1) and np.all(prod[:, 1] == 0)


def test_ext_base_ops():
    a = rand_u64(20).reshape(10, 2)
    b = rand_u64(10)
    ga = gl2.from_u64(a[:, 0], a[:, 1])
    gb = gl.from_u64(b)
    got = gl2.to_u64(jax.jit(gl2.mul_base)(ga, gb))
    for i in range(10):
        assert int(got[i, 0]) == int(a[i, 0]) * int(b[i]) % P
        assert int(got[i, 1]) == int(a[i, 1]) * int(b[i]) % P
