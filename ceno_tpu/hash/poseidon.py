"""Batched Poseidon permutation over Goldilocks (plonky2-compatible).

Width 12, rate 8, capacity 4, x^7 s-box, 8 full + 22 partial rounds, with the
standard public plonky2 round constants and circulant+diagonal MDS matrix
(same parameters as the reference: /root/reference/poseidon/src/poseidon.rs:7-90
and constants.rs).  We implement the *naive* round schedule — constant layer,
s-box (all lanes on full rounds, lane 0 on partial rounds), full MDS every
round — which is mathematically identical to plonky2's precomputed
fast-partial-round path.

TPU-native design notes:
* States are laid out ``(12, batch)``: the batch rides the TPU lane dimension
  so every round is a fully vectorized VPU op over all states at once.
* The MDS matrix has tiny entries (< 2^6), so the matrix-vector product is
  done exactly in uint32 over 16-bit limbs (max column sum < 2^26) and then
  recombined + reduced once per lane — no per-entry field multiplications.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import gl
from ..field.gl import Gl, _addc
from .poseidon_constants import (
    ALL_ROUND_CONSTANTS,
    DIGEST_WIDTH,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    N_ROUNDS,
    SPONGE_RATE,
    SPONGE_WIDTH,
)

# MDS matrix: out[r] = sum_j M[r][j] * v[j], M[r][j] = circ[(j-r) mod 12] + diag on r==j
_MDS_NP = np.zeros((SPONGE_WIDTH, SPONGE_WIDTH), dtype=np.uint32)
for _r in range(SPONGE_WIDTH):
    for _j in range(SPONGE_WIDTH):
        _MDS_NP[_r, _j] = MDS_MATRIX_CIRC[(_j - _r) % SPONGE_WIDTH]
    _MDS_NP[_r, _r] += MDS_MATRIX_DIAG[_r]

# Round constants as (N_ROUNDS, 12) lo/hi uint32.
_RC = np.asarray(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(N_ROUNDS, SPONGE_WIDTH)
_RC_LO = (_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32)
_RC_HI = (_RC >> np.uint64(32)).astype(np.uint32)


def _rc(round_ctr: int, extra_dims: int) -> Gl:
    shape = (SPONGE_WIDTH,) + (1,) * extra_dims
    return Gl(
        jnp.asarray(_RC_LO[round_ctr]).reshape(shape),
        jnp.asarray(_RC_HI[round_ctr]).reshape(shape),
    )


def _sbox(x: Gl) -> Gl:
    # x^7 in 2 squarings + 2 multiplications (gl.sqr is 3 widening muls)
    x2 = gl.sqr(x)
    x3 = gl.mul(x2, x)
    x4 = gl.sqr(x2)
    return gl.mul(x3, x4)


def _mds(state: Gl) -> Gl:
    """Exact MDS multiply over 16-bit limbs.  state: (12, ...).

    Expressed as a dot_general so XLA keeps it a single contraction (a
    broadcast-multiply-reduce gets duplicated into consumers by CPU fusion,
    exploding LLVM compile time).  Operands are cast to uint16 — both sides
    genuinely fit (limbs < 2^16, matrix entries < 2^6) and the u16 integer
    dot path measures ~2.5x the u32 one on TPU v5e (444 vs 179 M MDS/s at
    batch 2^18); accumulation is exact in the uint32 result type
    (column sums < 13*41*2^16 < 2^26)."""
    import jax

    mask = jnp.uint32(0xFFFF)
    # limbs: (12, 4, ...) each < 2^16
    limbs = jnp.stack(
        [state.lo & mask, state.lo >> 16, state.hi & mask, state.hi >> 16], axis=1
    )
    flat = limbs.reshape(SPONGE_WIDTH, -1).astype(jnp.uint16)
    # out[r, k...] = sum_j M[r, j] * limbs[j, k...]
    out = jax.lax.dot_general(
        jnp.asarray(_MDS_NP.astype(np.uint16)),
        flat,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.uint32,
    ).reshape(limbs.shape)
    l0, l1, l2, l3 = out[:, 0], out[:, 1], out[:, 2], out[:, 3]
    # recombine value = l0 + l1*2^16 + l2*2^32 + l3*2^48  (< 2^74)
    w0, c0 = _addc(l0, l1 << 16)
    w1 = (l1 >> 16) + l2  # < 2^27, no overflow
    w1, c1 = _addc(w1, l3 << 16)
    w1b, c2 = _addc(w1, c0)
    w2 = (l3 >> 16) + c1 + c2
    return gl.reduce128(w0, w1b, w2, jnp.zeros_like(w2))


def _set_lane0(state: Gl, value: Gl) -> Gl:
    return Gl(state.lo.at[0].set(value.lo), state.hi.at[0].set(value.hi))


def _scan_rounds(state: Gl, lo_rc, hi_rc, full: bool) -> Gl:
    """lax.scan a block of rounds (keeps the XLA graph compact: one round
    body compiled once per block instead of 30 unrolled copies)."""
    import jax

    extra = state.lo.ndim - 1
    rc_shape = (-1, SPONGE_WIDTH) + (1,) * extra

    def body(st, rc):
        rc_lo, rc_hi = rc
        st = gl.add(st, Gl(rc_lo, rc_hi))
        if full:
            st = _sbox(st)
        else:
            st = _set_lane0(st, _sbox(st[0]))
        return _mds(st), None

    xs = (
        jnp.asarray(lo_rc).reshape(rc_shape),
        jnp.asarray(hi_rc).reshape(rc_shape),
    )
    state, _ = jax.lax.scan(body, state, xs)
    return state


def _permute_impl(state: Gl) -> Gl:
    """Poseidon permutation; state shape (12, ...) — any trailing batch dims."""
    assert state.lo.shape[0] == SPONGE_WIDTH
    h = HALF_N_FULL_ROUNDS
    p = N_PARTIAL_ROUNDS
    state = _scan_rounds(state, _RC_LO[:h], _RC_HI[:h], full=True)
    state = _scan_rounds(state, _RC_LO[h : h + p], _RC_HI[h : h + p], full=False)
    state = _scan_rounds(state, _RC_LO[h + p :], _RC_HI[h + p :], full=True)
    return state


# Public jitted entry point (shape-keyed compile cache); safe to call both
# eagerly and from inside other traced functions.
import jax as _jax

permute = _jax.jit(_permute_impl)


# ---------------------------------------------------------------------------
# Sponge hashing (overwrite mode), batched over trailing dims
# ---------------------------------------------------------------------------


def hash_n_to_m_no_pad(inputs: Gl, num_outputs: int) -> Gl:
    """Sponge hash: inputs (n, ...) -> outputs (num_outputs, ...).

    Overwrite-mode absorption in rate-8 chunks, zero-initialised state;
    matches the reference sponge (poseidon_hash.rs hash_n_to_m_no_pad).
    """
    n = inputs.lo.shape[0]
    batch = inputs.lo.shape[1:]
    state = gl.zeros((SPONGE_WIDTH,) + batch)
    for start in range(0, n, SPONGE_RATE):
        chunk = inputs[start : min(start + SPONGE_RATE, n)]
        k = chunk.lo.shape[0]
        state = Gl(
            jnp.concatenate([chunk.lo, state.lo[k:]], axis=0),
            jnp.concatenate([chunk.hi, state.hi[k:]], axis=0),
        )
        state = permute(state)
    outs = [state[: min(SPONGE_RATE, num_outputs)]]
    produced = min(SPONGE_RATE, num_outputs)
    while produced < num_outputs:
        state = permute(state)
        take = min(SPONGE_RATE, num_outputs - produced)
        outs.append(state[:take])
        produced += take
    return gl.concat(outs, axis=0) if len(outs) > 1 else outs[0]


def two_to_one(left: Gl, right: Gl) -> Gl:
    """Merkle node compression: (4, ...) x (4, ...) -> (4, ...)."""
    batch = left.lo.shape[1:]
    pad = gl.zeros((SPONGE_WIDTH - 2 * DIGEST_WIDTH,) + batch)
    state = gl.concat([left, right, pad], axis=0)
    return permute(state)[:DIGEST_WIDTH]


def hash_or_noop(inputs: Gl) -> Gl:
    """<=4 inputs: identity zero-padded to a digest; else sponge hash."""
    n = inputs.lo.shape[0]
    if n <= DIGEST_WIDTH:
        batch = inputs.lo.shape[1:]
        pad = gl.zeros((DIGEST_WIDTH - n,) + batch)
        return gl.concat([inputs, pad], axis=0)
    return hash_n_to_m_no_pad(inputs, DIGEST_WIDTH)
