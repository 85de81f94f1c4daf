"""Independent pure-Python (big-int) Poseidon oracle for cross-checking the
vectorized JAX implementation.  Same public plonky2 algorithm/constants,
written against the spec (naive rounds) with plain integers."""

from ceno_tpu.hash.poseidon_constants import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    SPONGE_RATE,
    SPONGE_WIDTH,
    DIGEST_WIDTH,
)

P = 0xFFFFFFFF00000001


def _sbox(x):
    return pow(x, 7, P)


def _mds(state):
    out = []
    for r in range(SPONGE_WIDTH):
        acc = MDS_MATRIX_DIAG[r] * state[r]
        for i in range(SPONGE_WIDTH):
            acc += MDS_MATRIX_CIRC[i] * state[(i + r) % SPONGE_WIDTH]
        out.append(acc % P)
    return out


def _add_rc(state, round_ctr):
    return [
        (state[i] + ALL_ROUND_CONSTANTS[round_ctr * SPONGE_WIDTH + i]) % P
        for i in range(SPONGE_WIDTH)
    ]


def permute(state):
    state = [s % P for s in state]
    rc = 0
    for _ in range(HALF_N_FULL_ROUNDS):
        state = _mds([_sbox(x) for x in _add_rc(state, rc)])
        rc += 1
    for _ in range(N_PARTIAL_ROUNDS):
        state = _add_rc(state, rc)
        state[0] = _sbox(state[0])
        state = _mds(state)
        rc += 1
    for _ in range(HALF_N_FULL_ROUNDS):
        state = _mds([_sbox(x) for x in _add_rc(state, rc)])
        rc += 1
    return state


def hash_n_to_m_no_pad(inputs, num_outputs):
    state = [0] * SPONGE_WIDTH
    for start in range(0, len(inputs), SPONGE_RATE):
        chunk = inputs[start : start + SPONGE_RATE]
        state[: len(chunk)] = [c % P for c in chunk]
        state = permute(state)
    outputs = []
    while True:
        for x in state[:SPONGE_RATE]:
            outputs.append(x)
            if len(outputs) == num_outputs:
                return outputs
        state = permute(state)


def two_to_one(left, right):
    state = list(left) + list(right) + [0] * (SPONGE_WIDTH - 2 * DIGEST_WIDTH)
    return permute(state)[:DIGEST_WIDTH]
