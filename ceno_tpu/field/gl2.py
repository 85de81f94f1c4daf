"""Degree-2 extension of Goldilocks: F[X]/(X^2 - 7).

Matches the reference's `GoldilocksExt2` (plonky2-compatible quadratic
extension with W = 7; semantics pinned by /root/reference/ff_ext/src/lib.rs:43-70:
an element is the coefficient pair [c0, c1], `from_bases`/`as_bases` expose it
in that order, and `to_canonical_u64_vec` yields [c0, c1] canonical u64s).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import gl
from .gl import Gl

W = 7  # X^2 = 7


class Gl2(NamedTuple):
    c0: Gl
    c1: Gl

    @property
    def shape(self):
        return jnp.shape(self.c0.lo)

    def __add__(self, other):
        return add(self, other)

    def __sub__(self, other):
        return sub(self, other)

    def __mul__(self, other):
        return mul(self, other)

    def __neg__(self):
        return neg(self)

    def reshape(self, *shape) -> "Gl2":
        return Gl2(self.c0.reshape(*shape), self.c1.reshape(*shape))

    def __getitem__(self, idx) -> "Gl2":
        return Gl2(self.c0[idx], self.c1[idx])


def add(a: Gl2, b: Gl2) -> Gl2:
    return Gl2(gl.add(a.c0, b.c0), gl.add(a.c1, b.c1))


def sub(a: Gl2, b: Gl2) -> Gl2:
    return Gl2(gl.sub(a.c0, b.c0), gl.sub(a.c1, b.c1))


def neg(a: Gl2) -> Gl2:
    return Gl2(gl.neg(a.c0), gl.neg(a.c1))


def mul(a: Gl2, b: Gl2) -> Gl2:
    # (a0 + a1 X)(b0 + b1 X) = a0b0 + W a1b1 + (a0b1 + a1b0) X
    a0b0 = gl.mul(a.c0, b.c0)
    a1b1 = gl.mul(a.c1, b.c1)
    a0b1 = gl.mul(a.c0, b.c1)
    a1b0 = gl.mul(a.c1, b.c0)
    return Gl2(gl.add(a0b0, gl.mul_small(a1b1, W)), gl.add(a0b1, a1b0))


def mul_base(a: Gl2, b: Gl) -> Gl2:
    return Gl2(gl.mul(a.c0, b), gl.mul(a.c1, b))


def add_base(a: Gl2, b: Gl) -> Gl2:
    return Gl2(gl.add(a.c0, b), a.c1)


def sub_base(a: Gl2, b: Gl) -> Gl2:
    return Gl2(gl.sub(a.c0, b), a.c1)


def sqr(a: Gl2) -> Gl2:
    return mul(a, a)


def inv(a: Gl2) -> Gl2:
    # norm = c0^2 - W * c1^2 in the base field; inv = (c0 - c1 X) / norm
    norm = gl.sub(gl.sqr(a.c0), gl.mul_small(gl.sqr(a.c1), W))
    n_inv = gl.inv(norm)
    return Gl2(gl.mul(a.c0, n_inv), gl.neg(gl.mul(a.c1, n_inv)))


def pow_const(a: Gl2, e: int) -> Gl2:
    if e == 0:
        return ones(a.shape)
    if e < 32:
        result = None
        base = a
        while e > 0:
            if e & 1:
                result = base if result is None else mul(result, base)
            e >>= 1
            if e:
                base = sqr(base)
        return result
    import jax

    nbits = e.bit_length()
    bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], dtype=jnp.uint32)

    def body(carry, bit):
        acc, base = carry
        acc2 = select(bit == 1, mul(acc, base), acc)
        return (acc2, sqr(base)), None

    (acc, _), _ = jax.lax.scan(body, (ones(a.shape), a), bits)
    return acc


def select(mask, a: Gl2, b: Gl2) -> Gl2:
    return Gl2(gl.select(mask, a.c0, b.c0), gl.select(mask, a.c1, b.c1))


def eq(a: Gl2, b: Gl2):
    return gl.eq(a.c0, b.c0) & gl.eq(a.c1, b.c1)


def is_zero(a: Gl2):
    return gl.is_zero(a.c0) & gl.is_zero(a.c1)


def zeros(shape=()) -> Gl2:
    return Gl2(gl.zeros(shape), gl.zeros(shape))


def ones(shape=()) -> Gl2:
    return Gl2(gl.ones(shape), gl.zeros(shape))


def from_base(b: Gl) -> Gl2:
    return Gl2(b, gl.zeros(jnp.shape(b.lo)))


def const(c0: int, c1: int = 0) -> Gl2:
    return Gl2(gl.const(c0), gl.const(c1))


def full(shape, c0: int, c1: int = 0) -> Gl2:
    return Gl2(gl.full(shape, c0), gl.full(shape, c1))


def from_u64(c0, c1) -> Gl2:
    return Gl2(gl.from_u64(c0), gl.from_u64(c1))


def to_u64(a: Gl2) -> np.ndarray:
    """Host-side: shape (..., 2) canonical u64 [c0, c1]."""
    return np.stack([gl.to_u64(a.c0), gl.to_u64(a.c1)], axis=-1)


def concat(parts, axis=0) -> Gl2:
    return Gl2(
        gl.concat([p.c0 for p in parts], axis=axis),
        gl.concat([p.c1 for p in parts], axis=axis),
    )


def stack(parts, axis=0) -> Gl2:
    return Gl2(
        gl.stack([p.c0 for p in parts], axis=axis),
        gl.stack([p.c1 for p in parts], axis=axis),
    )


def broadcast_to(a: Gl2, shape) -> Gl2:
    return Gl2(gl.broadcast_to(a.c0, shape), gl.broadcast_to(a.c1, shape))


def take(a: Gl2, idx, axis=0) -> Gl2:
    return Gl2(gl.take(a.c0, idx, axis=axis), gl.take(a.c1, idx, axis=axis))


def sum_reduce(a: Gl2, axis=None) -> Gl2:
    return Gl2(gl.sum_reduce(a.c0, axis=axis), gl.sum_reduce(a.c1, axis=axis))


def deinterleave(a: Gl2):
    """(even, odd) adjacent pairs along the last axis (see gl.deinterleave)."""
    e0, o0 = gl.deinterleave(a.c0)
    e1, o1 = gl.deinterleave(a.c1)
    return Gl2(e0, e1), Gl2(o0, o1)
