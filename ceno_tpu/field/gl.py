"""Goldilocks base field (p = 2^64 - 2^32 + 1) as vectorized TPU-native ops.

TPUs have no native 64-bit integer datapath, so a field element is a pair of
uint32 limbs ``(lo, hi)`` with ``value = lo + 2^32 * hi`` kept in canonical
form (< p) at all times.  All operations are elementwise over arbitrary-shape
arrays and are pure jnp (VPU-friendly); the hot fused loops (sumcheck rounds,
NTT butterflies, Poseidon) build on these same primitives.

Semantics pinned by the reference zkVM's field crate (see
``/root/reference/ff_ext/src/lib.rs:43-70`` and the reduction algorithm shape
in ``/root/reference/poseidon/src/poseidon_goldilocks.rs`` reduce96/reduce128):

* 2^64 ≡ EPSILON (mod p) with EPSILON = 2^32 - 1
* 2^96 ≡ -1 (mod p)
* canonical u64 values round-trip exactly.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

# Field modulus p = 2^64 - 2^32 + 1.
P = 0xFFFFFFFF00000001
# 2^64 mod p.
EPSILON = 0xFFFFFFFF

_U32 = jnp.uint32


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


class Gl(NamedTuple):
    """A (possibly batched) Goldilocks element: value = lo + 2^32*hi, < p."""

    lo: jnp.ndarray  # uint32
    hi: jnp.ndarray  # uint32

    @property
    def shape(self):
        return jnp.shape(self.lo)

    @property
    def ndim(self):
        return jnp.ndim(self.lo)

    def __add__(self, other: "Gl") -> "Gl":
        return add(self, other)

    def __sub__(self, other: "Gl") -> "Gl":
        return sub(self, other)

    def __mul__(self, other: "Gl") -> "Gl":
        return mul(self, other)

    def __neg__(self) -> "Gl":
        return neg(self)

    def reshape(self, *shape) -> "Gl":
        return Gl(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def __getitem__(self, idx) -> "Gl":
        return Gl(self.lo[idx], self.hi[idx])


# ---------------------------------------------------------------------------
# u32 helpers
# ---------------------------------------------------------------------------


def _addc(a, b):
    """uint32 add with carry-out: returns (sum mod 2^32, carry in {0,1})."""
    s = a + b
    return s, (s < a).astype(jnp.uint32)


def _subb(a, b):
    """uint32 subtract with borrow-out: returns (diff mod 2^32, borrow)."""
    d = a - b
    return d, (a < b).astype(jnp.uint32)


def _mul32w(a, b):
    """32x32 -> 64-bit multiply via 16-bit halves: returns (lo, hi) uint32."""
    a0 = a & _U32(0xFFFF)
    a1 = a >> 16
    b0 = b & _U32(0xFFFF)
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid, c_mid = _addc(lh, hl)
    lo, c_lo = _addc(ll, mid << 16)
    hi = hh + (mid >> 16) + (c_mid << 16) + c_lo
    return lo, hi


def _add64(alo, ahi, blo, bhi):
    """64-bit add: returns (lo, hi, carry)."""
    lo, c0 = _addc(alo, blo)
    hi1, c1 = _addc(ahi, bhi)
    hi, c2 = _addc(hi1, c0)
    return lo, hi, c1 + c2


def _sub64(alo, ahi, blo, bhi):
    """64-bit subtract: returns (lo, hi, borrow)."""
    lo, b0 = _subb(alo, blo)
    hi1, b1 = _subb(ahi, bhi)
    hi, b2 = _subb(hi1, b0)
    return lo, hi, b1 + b2


def _cond_sub_p(lo, hi):
    """One conditional subtraction of p; input < 2^64, output canonical if
    input < 2p.

    Uses bitmask selection instead of jnp.where: deep compositions of
    select ops trigger a pathological XLA:CPU optimization pass (70s+ compile
    for a single Poseidon round); the bitwise form compiles in milliseconds
    and is branch-free on the VPU anyway."""
    # p = (lo=1, hi=0xFFFFFFFF)
    slo, shi, borrow = _sub64(lo, hi, _U32(1), _U32(0xFFFFFFFF))
    keep = borrow * _U32(0xFFFFFFFF)  # all-ones if input < p (keep original)
    return slo ^ ((slo ^ lo) & keep), shi ^ ((shi ^ hi) & keep)


def _fold_carry(lo, hi, carry):
    """Fold a 2^64 carry back using 2^64 ≡ EPSILON.  Safe when the folded
    value cannot re-overflow (guaranteed for all call sites here)."""
    add_lo = carry * _U32(EPSILON)
    lo2, c = _addc(lo, add_lo)
    return lo2, hi + c


# ---------------------------------------------------------------------------
# Field ops
# ---------------------------------------------------------------------------


def add(a: Gl, b: Gl) -> Gl:
    lo, hi, carry = _add64(a.lo, a.hi, b.lo, b.hi)
    lo, hi = _fold_carry(lo, hi, carry)
    return Gl(*_cond_sub_p(lo, hi))


def sub(a: Gl, b: Gl) -> Gl:
    lo, hi, borrow = _sub64(a.lo, a.hi, b.lo, b.hi)
    # On borrow the wrapped diff d satisfies value = d - EPSILON (mod p),
    # and d - EPSILON never underflows (d >= 2^64 - (p-1) > EPSILON).
    sub_lo = borrow * _U32(EPSILON)
    lo2, b2 = _subb(lo, sub_lo)
    return Gl(lo2, hi - b2)


def neg(a: Gl) -> Gl:
    return sub(zeros(jnp.shape(a.lo)), a)


def reduce128(w0, w1, w2, w3) -> Gl:
    """Reduce a 128-bit value given as four uint32 words (little-endian).

    x = x_lo + 2^64*x_hi_lo + 2^96*x_hi_hi ≡ x_lo + EPSILON*x_hi_lo - x_hi_hi.
    """
    # t0 = x_lo - x_hi_hi  (borrow: subtract EPSILON more, cannot underflow)
    t0lo, t0hi, borrow = _sub64(w0, w1, w3, _U32(0))
    blo, b2 = _subb(t0lo, borrow * _U32(EPSILON))
    t0lo, t0hi = blo, t0hi - b2
    # t1 = x_hi_lo * EPSILON = (x_hi_lo << 32) - x_hi_lo
    nz = (w2 != 0).astype(jnp.uint32)
    t1lo = _U32(0) - w2
    t1hi = w2 - nz
    # t2 = t0 + t1, folding the carry via 2^64 ≡ EPSILON
    lo, hi, carry = _add64(t0lo, t0hi, t1lo, t1hi)
    lo, hi = _fold_carry(lo, hi, carry)
    return Gl(*_cond_sub_p(lo, hi))


def mul(a: Gl, b: Gl) -> Gl:
    ll_lo, ll_hi = _mul32w(a.lo, b.lo)
    lh_lo, lh_hi = _mul32w(a.lo, b.hi)
    hl_lo, hl_hi = _mul32w(a.hi, b.lo)
    hh_lo, hh_hi = _mul32w(a.hi, b.hi)
    # column 1: ll_hi + lh_lo + hl_lo
    w1, c1a = _addc(ll_hi, lh_lo)
    w1, c1b = _addc(w1, hl_lo)
    # column 2: lh_hi + hl_hi + hh_lo + carries
    w2, c2a = _addc(lh_hi, hl_hi)
    w2, c2b = _addc(w2, hh_lo)
    w2, c2c = _addc(w2, c1a + c1b)
    # column 3: hh_hi + carries (cannot overflow: product < 2^128)
    w3 = hh_hi + c2a + c2b + c2c
    return reduce128(ll_lo, w1, w2, w3)


def mul_small(a: Gl, c: int) -> Gl:
    """Multiply by a small constant c < 2^32 (e.g. MDS coefficients)."""
    cc = _U32(c)
    p0, p1 = _mul32w(a.lo, cc)
    q0, q1 = _mul32w(a.hi, cc)
    w1, c1 = _addc(p1, q0)
    return reduce128(p0, w1, q1 + c1, jnp.zeros_like(q1))


def sqr(a: Gl) -> Gl:
    """a^2 with 3 widening multiplies instead of mul()'s 4:
    (lo + hi*2^32)^2 = lo^2 + 2*lo*hi*2^32 + hi^2*2^64."""
    ll_lo, ll_hi = _mul32w(a.lo, a.lo)
    lh_lo, lh_hi = _mul32w(a.lo, a.hi)
    hh_lo, hh_hi = _mul32w(a.hi, a.hi)
    # double the cross term across its 64 bits
    lh2_lo = lh_lo << 1
    lh2_hi = (lh_hi << 1) | (lh_lo >> 31)
    lh2_c = lh_hi >> 31  # carry into column 3
    w1, c1 = _addc(ll_hi, lh2_lo)
    w2, c2a = _addc(lh2_hi, hh_lo)
    w2, c2b = _addc(w2, c1)
    w3 = hh_hi + lh2_c + c2a + c2b
    return reduce128(ll_lo, w1, w2, w3)


def pow_const(a: Gl, e: int) -> Gl:
    """a^e for a static non-negative integer exponent (square & multiply).

    Small exponents unroll inline; large ones use a lax.scan over the bits so
    the compiled graph stays compact (an unrolled 64-bit chain blows up XLA
    compile time)."""
    if e == 0:
        return ones(jnp.shape(a.lo))
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
    nbits = e.bit_length()
    bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], dtype=jnp.uint32)

    def body(carry, bit):
        acc, base = carry
        acc2 = select(bit == 1, mul(acc, base), acc)
        return (acc2, sqr(base)), None

    (acc, _), _ = jax.lax.scan(body, (ones(jnp.shape(a.lo)), a), bits)
    return acc


def inv(a: Gl) -> Gl:
    """Multiplicative inverse via Fermat: a^(p-2).  inv(0) = 0."""
    return pow_const(a, P - 2)


def select(mask, a: Gl, b: Gl) -> Gl:
    """Elementwise: mask ? a : b (mask is a boolean array).

    Bitmask form — see _cond_sub_p for why jnp.where is avoided."""
    m = jnp.asarray(mask).astype(jnp.uint32) * _U32(0xFFFFFFFF)
    return Gl(b.lo ^ ((b.lo ^ a.lo) & m), b.hi ^ ((b.hi ^ a.hi) & m))


def is_zero(a: Gl):
    return (a.lo == 0) & (a.hi == 0)


def eq(a: Gl, b: Gl):
    return (a.lo == b.lo) & (a.hi == b.hi)


# ---------------------------------------------------------------------------
# Construction / conversion
# ---------------------------------------------------------------------------


def zeros(shape=()) -> Gl:
    z = jnp.zeros(shape, dtype=jnp.uint32)
    return Gl(z, z)


def ones(shape=()) -> Gl:
    return Gl(jnp.ones(shape, dtype=jnp.uint32), jnp.zeros(shape, dtype=jnp.uint32))


def full(shape, value: int) -> Gl:
    value = int(value) % P
    return Gl(
        jnp.full(shape, value & 0xFFFFFFFF, dtype=jnp.uint32),
        jnp.full(shape, value >> 32, dtype=jnp.uint32),
    )


def const(value: int) -> Gl:
    return full((), value)


def from_u32(x) -> Gl:
    """Lift uint32 values (already < 2^32 <= p) into the field."""
    x = _u32(x)
    return Gl(x, jnp.zeros_like(x))


def from_u64(x: Union[np.ndarray, int]) -> Gl:
    """Host-side: lift numpy uint64 (any value; reduced mod p) into Gl."""
    x = np.asarray(x, dtype=np.uint64)
    x = x % np.uint64(P)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    return Gl(jnp.asarray(lo), jnp.asarray(hi))


def to_u64(a: Gl) -> np.ndarray:
    """Host-side: canonical u64 values as numpy."""
    lo = np.asarray(jax.device_get(a.lo), dtype=np.uint64)
    hi = np.asarray(jax.device_get(a.hi), dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def concat(parts, axis=0) -> Gl:
    return Gl(
        jnp.concatenate([p.lo for p in parts], axis=axis),
        jnp.concatenate([p.hi for p in parts], axis=axis),
    )


def stack(parts, axis=0) -> Gl:
    return Gl(
        jnp.stack([p.lo for p in parts], axis=axis),
        jnp.stack([p.hi for p in parts], axis=axis),
    )


def broadcast_to(a: Gl, shape) -> Gl:
    return Gl(jnp.broadcast_to(a.lo, shape), jnp.broadcast_to(a.hi, shape))


def take(a: Gl, idx, axis=0) -> Gl:
    return Gl(jnp.take(a.lo, idx, axis=axis), jnp.take(a.hi, idx, axis=axis))


def sum_reduce(a: Gl, axis=None) -> Gl:
    """Exact mod-p sum along ``axis`` (all axes when None).

    TPU-native: limbs are split into 16-bit columns (< 2^16) and blocks of
    up to 2^15 elements are summed by XLA's *native* u32 reduction (exact:
    2^15 * (2^16-1) < 2^31); each block's column quad is recombined via
    reduce128.  Recursion depth is O(log_{2^15} n) — two native reductions
    for anything up to 2^30 elements.  This replaces an earlier pairwise
    add-tree, which emitted O(log2 n) strided-slice stages (~60 ms at 2^20
    on TPU vs ~0.3 ms for the native reduction)."""
    if axis is None:
        lo, hi = a.lo.reshape(-1), a.hi.reshape(-1)
    else:
        lo = jnp.moveaxis(a.lo, axis, -1)
        hi = jnp.moveaxis(a.hi, axis, -1)
    return _col_sum_last(lo, hi)


_SUM_BLK = 1 << 15


def _from_cols16(c0, c1, c2, c3) -> Gl:
    """Canonical Gl from S = c0 + c1*2^16 + c2*2^32 + c3*2^48, c_i < 2^31."""
    a_lo, ca = _addc(c0, c1 << 16)
    a_hi = (c1 >> 16) + ca  # < 2^16
    b_lo, cb = _addc(c2, c3 << 16)
    b_hi = (c3 >> 16) + cb
    w1, cw = _addc(a_hi, b_lo)
    w2 = b_hi + cw
    return reduce128(a_lo, w1, w2, jnp.zeros_like(w2))


def _col_sum_last(lo, hi) -> Gl:
    mask16 = _U32(0xFFFF)
    n = lo.shape[-1]
    while n > 1:
        blk = min(n, _SUM_BLK)
        if n % blk:
            pad = blk - (n % blk)
            widths = [(0, 0)] * (lo.ndim - 1) + [(0, pad)]
            lo = jnp.pad(lo, widths)
            hi = jnp.pad(hi, widths)
            n += pad
        shape = lo.shape[:-1] + (n // blk, blk)
        c0 = jnp.sum((lo & mask16).reshape(shape), axis=-1, dtype=jnp.uint32)
        c1 = jnp.sum((lo >> 16).reshape(shape), axis=-1, dtype=jnp.uint32)
        c2 = jnp.sum((hi & mask16).reshape(shape), axis=-1, dtype=jnp.uint32)
        c3 = jnp.sum((hi >> 16).reshape(shape), axis=-1, dtype=jnp.uint32)
        g = _from_cols16(c0, c1, c2, c3)
        lo, hi = g.lo, g.hi
        n = lo.shape[-1]
    return Gl(lo[..., 0], hi[..., 0])


def deinterleave(a: Gl) -> Tuple["Gl", "Gl"]:
    """(even, odd) adjacent pairs along the last axis.

    Strided slices on purpose: the tempting reshape(..., n/2, 2) +
    unit-index form is faster when it fuses, but if XLA materializes the
    intermediate, the trailing 2-wide axis is tiled out to 128 lanes — a
    64x allocation blowup (observed as a 23.6 GB OOM).  Hot loops that need
    cheap pair access restructure the layout instead (sumcheck/fused.py
    keeps the pair axis on sublanes with a 128-lane minor axis)."""
    n = a.lo.shape[-1]
    return (
        Gl(a.lo[..., 0:n:2], a.hi[..., 0:n:2]),
        Gl(a.lo[..., 1:n:2], a.hi[..., 1:n:2]),
    )
