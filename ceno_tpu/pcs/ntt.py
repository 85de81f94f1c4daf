"""Goldilocks NTT (radix-2 DIT) for Reed-Solomon encoding, TPU-native.

Semantics match the plonky2-adapted FFT in the reference
(/root/reference/mpcs/src/basefold/encoding/rs.rs:31-200): decimation in time
with an initial bit-reversal permutation, stage ``lg_m`` using the first half
of the powers of the 2^lg_m-th root of unity; ``fft(values, r, ...)``'s
zero-tail optimization (last 1-1/2^r entries zero) becomes a bit-reversed
gather of the short message followed by a 2^r-fold repeat; ``coset_fft``
pre-multiplies by shift powers.

TPU-native design: each butterfly stage is one reshape + fused elementwise
mul/add/sub over the whole array (lg_n stages total); the bit-reversal is a
single static-index gather.  Root tables and shift-power vectors are computed
once per size with host big-int math (they are protocol constants) and cached
as device arrays.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Union

import jax
import numpy as np

from ..field import fops, gl
from ..field.gl import Gl
from ..field.gl2 import Gl2

P = gl.P
# Multiplicative generator of the Goldilocks field (same as the reference's
# MULTIPLICATIVE_GENERATOR) and its 2-adicity.
GENERATOR = 7
TWO_ADICITY = 32
# ROOT_OF_UNITY = g^((p-1) / 2^32): the canonical order-2^32 root.
ROOT_OF_UNITY = pow(GENERATOR, (P - 1) >> TWO_ADICITY, P)


def root_of_unity(lg_n: int) -> int:
    """Canonical 2^lg_n-th root of unity (host int)."""
    assert lg_n <= TWO_ADICITY
    return pow(ROOT_OF_UNITY, 1 << (TWO_ADICITY - lg_n), P)


@lru_cache(maxsize=None)
def _powers_np(base: int, n: int) -> np.ndarray:
    """[base^0, ..., base^(n-1)] mod P as uint64 (host, by repeated doubling)."""
    out = np.empty(n, dtype=np.uint64)
    out[0] = 1
    m = 1
    b = base % P
    while m < n:
        k = min(m, n - m)
        # out[m:m+k] = out[0:k] * b  (python-int exact mul mod P, vectorized
        # via object dtype is slow; do it with splitting into 32-bit halves)
        lo = out[:k] & np.uint64(0xFFFFFFFF)
        hi = out[:k] >> np.uint64(32)
        blo = b & 0xFFFFFFFF
        bhi = b >> 32
        # 128-bit product via python ints on the (rare) host path sizes we
        # need (<= 2^24): fall back to object math only for correctness.
        prod = (
            lo.astype(object) * blo
            + ((lo.astype(object) * bhi + hi.astype(object) * blo) << 32)
            + ((hi.astype(object) * bhi) << 64)
        ) % P
        out[m : m + k] = np.asarray(prod, dtype=np.uint64)
        b = b * b % P
        m *= 2
    return out


@lru_cache(maxsize=None)
def _bitrev_perm(lg_n: int) -> np.ndarray:
    n = 1 << lg_n
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(lg_n):
        rev |= ((idx >> b) & 1) << (lg_n - 1 - b)
    return rev


def bitrev(values, lg_n: int = None):
    """Bit-reversal permutation along the last axis (static gather)."""
    n = values.lo.shape[-1] if isinstance(values, Gl) else values.c0.lo.shape[-1]
    lg = n.bit_length() - 1
    perm = _bitrev_perm(lg)
    return values[..., perm]


@lru_cache(maxsize=None)
def _root_row_np(lg_m: int, lg_n_domain: int = None) -> np.ndarray:
    """Stage lg_m root row: first 2^(lg_m-1) powers of the 2^lg_m-th root
    (matches fft_root_table rows, rs.rs:31-63)."""
    half_m = 1 << (lg_m - 1)
    base = root_of_unity(lg_m)
    return _powers_np(base, max(half_m, 2))[:half_m] if half_m > 1 else np.asarray(
        [1], dtype=np.uint64
    )


def _root_row_gl(lg_m: int):
    # no lru_cache here: constructing device arrays inside a jit trace would
    # cache tracers; the np table is cached, the Gl wrap is trace-safe
    return gl.from_u64(_root_row_np(lg_m))


_FFT_KERNELS = {}


def _fft_stages(values, lg_n: int, r: int):
    """Butterfly stages r+1 .. lg_n (1-indexed lg_m) over the last axis."""
    for lg_m in range(r + 1, lg_n + 1):
        m = 1 << lg_m
        half = m // 2
        lead = values.lo.shape[:-1] if isinstance(values, Gl) else values.c0.lo.shape[:-1]
        v = values.reshape(lead + (-1, m))
        lo = v[..., :half]
        hi = v[..., half:]
        om = _root_row_gl(lg_m)
        t = fops.mul(hi, om)
        new_lo = fops.add(lo, t)
        new_hi = fops.sub(lo, t)
        values = fops.concat([new_lo, new_hi], axis=-1).reshape(lead + (-1,))
    return values


def fft_impl(coeffs, lg_n: int, r: int, shift: int):
    """coset_fft of ``coeffs`` zero-padded to 2^lg_n (coeffs has 2^(lg_n-r)
    entries), evaluated over shift * H, |H| = 2^lg_n.

    Matches rs.rs coset_fft/fft: multiply by shift powers, bit-reverse
    (realized as short-bitrev + repeat for the zero tail), butterflies.
    """
    n_msg = coeffs.lo.shape[-1] if isinstance(coeffs, Gl) else coeffs.c0.lo.shape[-1]
    assert n_msg == 1 << (lg_n - r)
    if shift != 1:
        shift_pows = gl.from_u64(_powers_np(shift, n_msg))
        coeffs = fops.mul(coeffs, shift_pows)
    # bit-reverse the padded vector: nonzeros land at multiples of 2^r in
    # blocks; equivalent to bitrev of the short message then 2^r-repeat
    # (rs.rs:150-170 copy loop).
    values = bitrev(coeffs)
    if r > 0:
        reps = 1 << r
        if isinstance(values, Gl):
            values = Gl(
                _repeat_last(values.lo, reps),
                _repeat_last(values.hi, reps),
            )
        else:
            values = Gl2(
                Gl(_repeat_last(values.c0.lo, reps), _repeat_last(values.c0.hi, reps)),
                Gl(_repeat_last(values.c1.lo, reps), _repeat_last(values.c1.hi, reps)),
            )
    return _fft_stages(values, lg_n, r)


def _repeat_last(a, reps: int):
    import jax.numpy as jnp

    return jnp.repeat(a, reps, axis=-1)


def fft(coeffs, lg_n: int, r: int = 0, shift: int = 1, use_jit: bool = True):
    """Jitted coset FFT; cache keyed by (type, shape, lg_n, r, shift)."""
    if not use_jit:
        return fft_impl(coeffs, lg_n, r, shift)
    key = (
        isinstance(coeffs, Gl2),
        coeffs.lo.shape if isinstance(coeffs, Gl) else coeffs.c0.lo.shape,
        lg_n,
        r,
        shift,
    )
    if key not in _FFT_KERNELS:
        _FFT_KERNELS[key] = jax.jit(lambda c: fft_impl(c, lg_n, r, shift))
    return _FFT_KERNELS[key](coeffs)


def interpolate_over_hypercube(evals):
    """Multilinear evals -> coefficients, in the reference's stage order
    (/root/reference/mpcs/src/util/arithmetic/hypercube.rs:16-36):
    for stage i = 1..n, within each 2^i block subtract the first half from
    the second half."""
    n = evals.lo.shape[-1] if isinstance(evals, Gl) else evals.c0.lo.shape[-1]
    lg_n = n.bit_length() - 1
    lead = evals.lo.shape[:-1] if isinstance(evals, Gl) else evals.c0.lo.shape[:-1]
    for i in range(1, lg_n + 1):
        size = 1 << i
        half = size // 2
        v = evals.reshape(lead + (-1, size))
        lo = v[..., :half]
        hi = v[..., half:]
        evals = fops.concat([lo, fops.sub(hi, lo)], axis=-1).reshape(lead + (-1,))
    return evals


_INTERP_KERNELS = {}


def interpolate_jit(evals):
    key = (
        isinstance(evals, Gl2),
        evals.lo.shape if isinstance(evals, Gl) else evals.c0.lo.shape,
    )
    if key not in _INTERP_KERNELS:
        _INTERP_KERNELS[key] = jax.jit(interpolate_over_hypercube)
    return _INTERP_KERNELS[key](evals)
