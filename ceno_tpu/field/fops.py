"""Field-generic dispatch: operate uniformly on base (Gl) or extension (Gl2)
arrays.  Mirrors the reference's base-vs-ext monomorphization macros
(/root/reference/multilinear_extensions/src/mle.rs:998-1163) as runtime type
dispatch — under jit this is resolved at trace time, so there is no overhead.
"""

from __future__ import annotations

from . import gl, gl2
from .gl import Gl
from .gl2 import Gl2


def is_ext(x) -> bool:
    return isinstance(x, Gl2)


def _mod(x):
    return gl2 if isinstance(x, Gl2) else gl


def add(a, b):
    if isinstance(a, Gl2) and isinstance(b, Gl):
        return gl2.add_base(a, b)
    if isinstance(a, Gl) and isinstance(b, Gl2):
        return gl2.add_base(b, a)
    return _mod(a).add(a, b)


def sub(a, b):
    if isinstance(a, Gl2) and isinstance(b, Gl):
        return gl2.sub_base(a, b)
    if isinstance(a, Gl) and isinstance(b, Gl2):
        return gl2.neg(gl2.sub_base(b, a))
    return _mod(a).sub(a, b)


def mul(a, b):
    if isinstance(a, Gl2) and isinstance(b, Gl):
        return gl2.mul_base(a, b)
    if isinstance(a, Gl) and isinstance(b, Gl2):
        return gl2.mul_base(b, a)
    return _mod(a).mul(a, b)


def neg(a):
    return _mod(a).neg(a)


def inv(a):
    return _mod(a).inv(a)


def select(mask, a, b):
    if isinstance(a, Gl) and isinstance(b, Gl2):
        a = gl2.from_base(a)
    if isinstance(b, Gl) and isinstance(a, Gl2):
        b = gl2.from_base(b)
    return _mod(a).select(mask, a, b)


def eq(a, b):
    return _mod(a).eq(a, b)


def to_ext(a):
    return a if isinstance(a, Gl2) else gl2.from_base(a)


def zeros_like(a, shape=None):
    shape = a.shape if shape is None else shape
    return _mod(a).zeros(shape)


def ones_like(a, shape=None):
    shape = a.shape if shape is None else shape
    return _mod(a).ones(shape)


def concat(parts, axis=0):
    parts = list(parts)
    if any(isinstance(p, Gl2) for p in parts):
        parts = [to_ext(p) for p in parts]
        return gl2.concat(parts, axis=axis)
    return gl.concat(parts, axis=axis)


def stack(parts, axis=0):
    parts = list(parts)
    if any(isinstance(p, Gl2) for p in parts):
        parts = [to_ext(p) for p in parts]
        return gl2.stack(parts, axis=axis)
    return gl.stack(parts, axis=axis)


def take(a, idx, axis=0):
    return _mod(a).take(a, idx, axis=axis)


def sum_reduce(a, axis=None):
    return _mod(a).sum_reduce(a, axis=axis)


def reshape(a, *shape):
    return a.reshape(*shape)


def to_u64(a):
    return _mod(a).to_u64(a)


def deinterleave(a):
    """(even, odd) adjacent pairs along the last axis (TPU-fast layout)."""
    return _mod(a).deinterleave(a)
