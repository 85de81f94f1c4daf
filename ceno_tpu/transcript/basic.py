"""Poseidon Fiat-Shamir transcript.

Semantics match the reference transcript (/root/reference/transcript/src/
basic.rs, lib.rs): the entire transcript state is one Poseidon permutation
state; absorbing overwrites the first ``len`` lanes and permutes; a challenge
reads the first two squeezed lanes as a GoldilocksExt2 (no permute);
``get_and_append_challenge(label)`` absorbs the label then reads;
``fork(n)`` clones and absorbs the fork index.

TPU-native design: unlike the reference's ``&mut self`` object, the core API
here is *functional and traceable* — the state is a Gl pytree, every op
returns a new state — so an entire sumcheck/PCS prover loop (absorb round
evals -> sample challenge -> fold) can live inside one jitted ``lax.scan``
with zero host round trips.  A thin mutable wrapper is provided for
host-side orchestration code.

Byte packing: ``bytes_to_field_elements`` packs bytes into 8-byte
little-endian chunks (zero-padded), reduced mod p.  (The reference delegates
this to its field crate; this is the conventional packing.)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from ..field import gl, gl2
from ..field.gl import Gl
from ..field.gl2 import Gl2
from ..hash import poseidon
from ..hash.poseidon_constants import SPONGE_WIDTH


def bytes_to_field_elements(data: bytes) -> np.ndarray:
    """Pack bytes into u64 field elements (8-byte LE chunks, zero padded)."""
    if len(data) == 0:
        return np.zeros(1, dtype=np.uint64)
    padded = data + b"\x00" * ((-len(data)) % 8)
    return np.frombuffer(padded, dtype="<u8").astype(np.uint64) % np.uint64(gl.P)


class TranscriptState(NamedTuple):
    """Functional transcript: a (12,)-shaped Poseidon state."""

    state: Gl


def new(label: bytes) -> TranscriptState:
    state = gl.zeros((SPONGE_WIDTH,))
    return absorb_base(TranscriptState(state), gl.from_u64(bytes_to_field_elements(label)))


def absorb_base(ts: TranscriptState, elems: Gl) -> TranscriptState:
    """Overwrite lanes [0, n) with elems and permute.  n must be <= 12."""
    n = elems.lo.shape[0]
    assert n <= SPONGE_WIDTH, "absorb slice too long (reference panics too)"
    st = ts.state
    st = Gl(
        jnp.concatenate([elems.lo, st.lo[n:]]),
        jnp.concatenate([elems.hi, st.hi[n:]]),
    )
    return TranscriptState(poseidon.permute(st))


def absorb_ext(ts: TranscriptState, e: Gl2) -> TranscriptState:
    """Absorb an extension element as its two base coefficients."""
    return absorb_base(ts, gl.stack([e.c0, e.c1]))


def absorb_exts(ts: TranscriptState, es: Gl2) -> TranscriptState:
    """Absorb a (n,)-shaped vector of extension elements RATE-CHUNKED: the
    2n base coefficients [c0_0, c1_0, c0_1, c1_1, ...] overwrite up to
    SPONGE_RATE lanes per permute (PROTOCOL.md section 2).

    TPU protocol amendment (deviation #13): the reference permutes once per
    element (transcript/src/basic.rs append loop).  The scalar Poseidon
    permutation is a ~30-step sequential latency chain — on TPU it is the
    dominant fixed cost of every sumcheck round — so this build absorbs at
    the sponge's full rate: a degree-3 round's 4 evaluations cost ONE
    permute instead of four.  Standard duplex sponge; same data absorbed;
    prover and verifier share this helper so the Fiat-Shamir challenges
    stay consistent everywhere."""
    import jax

    from ..hash.poseidon_constants import SPONGE_RATE

    n = es.c0.lo.shape[0]
    if n == 1:
        return absorb_ext(ts, es[0])

    # interleave to (2n,) base coefficients: [c0_0, c1_0, c0_1, c1_1, ...]
    flat = Gl(
        jnp.stack([es.c0.lo, es.c1.lo], axis=1).reshape(-1),
        jnp.stack([es.c0.hi, es.c1.hi], axis=1).reshape(-1),
    )
    total = 2 * n
    full, rem = divmod(total, SPONGE_RATE)
    st = ts.state
    if full == 1:
        chunk = flat[:SPONGE_RATE]
        st = poseidon.permute(
            Gl(
                jnp.concatenate([chunk.lo, st.lo[SPONGE_RATE:]]),
                jnp.concatenate([chunk.hi, st.hi[SPONGE_RATE:]]),
            )
        )
    elif full > 1:

        def body(state: Gl, chunk):
            clo, chi = chunk
            s2 = Gl(
                jnp.concatenate([clo, state.lo[SPONGE_RATE:]]),
                jnp.concatenate([chi, state.hi[SPONGE_RATE:]]),
            )
            return poseidon._permute_impl(s2), None

        xs = (
            flat.lo[: full * SPONGE_RATE].reshape(full, SPONGE_RATE),
            flat.hi[: full * SPONGE_RATE].reshape(full, SPONGE_RATE),
        )
        st, _ = jax.lax.scan(body, st, xs)
    if rem:
        tail = flat[full * SPONGE_RATE :]
        st = poseidon.permute(
            Gl(
                jnp.concatenate([tail.lo, st.lo[rem:]]),
                jnp.concatenate([tail.hi, st.hi[rem:]]),
            )
        )
    return TranscriptState(st)


def absorb_message(ts: TranscriptState, msg: bytes) -> TranscriptState:
    return absorb_base(ts, gl.from_u64(bytes_to_field_elements(msg)))


def read_challenge(ts: TranscriptState) -> Gl2:
    """First two squeezed lanes as an extension element (no permute)."""
    return Gl2(ts.state[0], ts.state[1])


def get_and_append_challenge(ts: TranscriptState, label: bytes) -> Tuple[TranscriptState, Gl2]:
    ts = absorb_message(ts, label)
    return ts, read_challenge(ts)


def sample_vec(ts: TranscriptState, label: bytes, n: int) -> Tuple[TranscriptState, Gl2]:
    """n challenges, each via get_and_append_challenge; returns (n,)-Gl2."""
    out = []
    for _ in range(n):
        ts, c = get_and_append_challenge(ts, label)
        out.append(c)
    return ts, gl2.stack(out)


def fork(ts: TranscriptState, n: int):
    """n independent transcripts, fork i absorbs the base element i."""
    return [
        absorb_base(ts, gl.from_u64(np.asarray([i], dtype=np.uint64)))
        for i in range(n)
    ]


class Transcript:
    """Mutable host-side wrapper over the functional core."""

    def __init__(self, label: bytes = b"", _state: TranscriptState = None):
        self.ts = _state if _state is not None else new(label)
        self.field_appended_num = 0  # stat mirror (BasicTranscriptWithStat)

    def append_field_elements(self, elems: Gl):
        self.field_appended_num += int(elems.lo.shape[0])
        self.ts = absorb_base(self.ts, elems)

    def append_field_element_u64(self, v: int):
        self.append_field_elements(gl.from_u64(np.asarray([v], dtype=np.uint64)))

    def append_field_element_ext(self, e: Gl2):
        self.field_appended_num += 2
        self.ts = absorb_ext(self.ts, e)

    def append_field_element_exts(self, es: Gl2):
        """Rate-chunked vector absorb (see absorb_exts / PROTOCOL.md #13)."""
        n = es.c0.lo.shape[0]
        self.field_appended_num += 2 * n
        self.ts = absorb_exts(self.ts, es)

    def append_message(self, msg: bytes):
        elems = bytes_to_field_elements(msg)
        self.field_appended_num += len(elems)
        self.ts = absorb_message(self.ts, msg)

    def read_challenge(self) -> Gl2:
        return read_challenge(self.ts)

    def get_and_append_challenge(self, label: bytes) -> Gl2:
        self.append_message(label)
        return self.read_challenge()

    def fork(self, n: int):
        forks = []
        for i in range(n):
            t = Transcript.__new__(Transcript)
            t.ts = absorb_base(
                self.ts, gl.from_u64(np.asarray([i], dtype=np.uint64))
            )
            t.field_appended_num = self.field_appended_num + 1
            forks.append(t)
        return forks

    def copy(self) -> "Transcript":
        t = Transcript.__new__(Transcript)
        t.ts = self.ts
        t.field_appended_num = self.field_appended_num
        return t
