"""Basecode: the reference's alternative Basefold encoding — a random
foldable linear code (reference /root/reference/mpcs/src/basefold/encoding/
basecode.rs:29-52, 224-312).

Construction (behavioral parity with the reference):

* split the message (length 2^k) into chunks of 2^basecode_msg_size_log and
  encode each chunk with a naive Reed-Solomon code over the counting domain
  {1, 2, ..., msg*rate} (basecode.rs:226-250 ``get_basecode``: Horner
  evaluation of the chunk polynomial at each domain point);
* expand to the full foldable codeword level by level: adjacent codeword
  pairs (a, b) of size 2^l combine into (a + t*b, a - t*b) where t is the
  level-l random diagonal (basecode.rs:268-312
  ``evaluate_over_foldable_domain_generic_basecode``);
* folding coefficients at pair index i of the BIT-REVERSED codeword at
  ``level`` (= log2 of the folded codeword size): x0 = bitrev-indexed level
  element, x1 = -x0, w = 1/(x1-x0) = -1/(2 x0) (basecode.rs:196-223, 373-387).

Default spec: 766 queries, rate_log 3, basecode message 2^7
(basecode.rs:38-52, recorded in BASELINE.md).

Randomness (DOCUMENTED DEVIATION, see PROTOCOL.md): the reference draws the
level tables from AES-128-CTR keyed via ChaCha8(seed); this build draws
them from numpy's Philox counter PRNG keyed by the same 32-byte seed.  Both
are deterministic public coins shared by prover and verifier — only the
stream differs; there is no cross-implementation codeword compatibility to
preserve (the reference's own table depends on unvendored crate versions).
Verifier-side coefficients are REGENERATED from the seed, never trusted
from the proof (analog of basecode.rs:206-223 verifier_folding_coeffs).

TPU-native layout: the base RS encode runs as a Horner `lax.scan` over the
chunk axis (one fused mul+add per coefficient), and each foldable-domain
level is ONE fused elementwise butterfly over a (chunks, 2, half) view —
no per-element loops, no gathers.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import numpy as np

from ..field import gl
from ..field.gl import Gl
from ..field.gl2 import Gl2
from . import ntt

P = gl.P


class BasecodeSpec(NamedTuple):
    """basecode.rs:38-52 BasecodeDefaultSpec."""

    num_queries: int = 766
    rate_log: int = 3
    basecode_msg_size_log: int = 7


def _philox_field_elements(seed: bytes, n: int) -> np.ndarray:
    """n deterministic Goldilocks elements from a 32-byte seed.

    Counter-based PRNG (Philox) → uniform u64 → mod p.  The mod-p bias is
    2^-32-scale, below the scheme's soundness slack (the reference's
    byte-sampling has the same property).  Zeros are remapped to 1 so every
    table element is invertible (probability 2^-64 per element; the
    reference does not guard this at all)."""
    # SeedSequence hashes all 32 bytes injectively into the Philox key, so
    # distinct seeds produce distinct streams (no XOR-fold collisions)
    bitgen = np.random.Philox(np.random.SeedSequence(list(seed[:32].ljust(32, b"\0"))))
    raw = np.random.Generator(bitgen).integers(
        0, 2**64, size=n, dtype=np.uint64, endpoint=False
    )
    vals = raw % np.uint64(P)
    vals[vals == 0] = 1
    return vals


class Basecode:
    """Encoding-scheme instance for messages up to 2^full_msg_log.

    Duck-type-compatible with RSCode (encode / fold_table / fold_gather);
    ``Basefold(BasecodeSpec(...))`` selects this code (the reference's
    BasefoldBasecodeParams).  ``is_left_right`` tells Basefold the message
    folds pairs (m[i], m[i + len/2]) rather than even/odd
    (encoding.rs:54-61): Basefold then skips the coefficient bit-reversal
    at commit and the final-message bit-reversal at verify
    (basefold.rs:130, query_phase.rs:162); round-trip + tamper tests in
    tests/test_basefold.py::test_basecode_*."""

    is_left_right = True

    def __init__(self, spec: BasecodeSpec, full_msg_log: int,
                 seed: bytes = b"\0" * 32):
        self.spec = spec
        self.full_msg_log = full_msg_log
        self.full_codeword_log = full_msg_log + spec.rate_log
        self.seed = seed
        # flat random table, host-side u64; levels are device-cached lazily
        self._flat = _philox_field_elements(seed, 1 << self.full_codeword_log)
        self._levels: Dict[int, Gl] = {}
        self._fold_tables: Dict[int, Tuple[Gl, Gl]] = {}
        self._vandermonde: Dict[int, Gl] = {}

    # -- tables ------------------------------------------------------------

    def level(self, l: int) -> Gl:
        """Natural-order level-l diagonal: flat[2^l : 2^(l+1)] (l >= 1);
        level 0 is flat[1:2] (basecode.rs:374-387 get_table_aes layout).

        Built under ensure_compile_time_eval: encode() runs inside jit
        traces (Basefold.commit), and lazily caching a traced constant
        would leak a tracer into later traces."""
        import jax

        if l not in self._levels:
            lo, hi = (1, 2) if l == 0 else (1 << l, 1 << (l + 1))
            with jax.ensure_compile_time_eval():
                self._levels[l] = gl.from_u64(self._flat[lo:hi])
        return self._levels[l]

    def fold_table(self, level: int) -> Tuple[Gl, Gl]:
        """(x0, w) per pair index of the bit-reversed codeword; length
        2^level.  x0 is the BIT-REVERSED level table (basecode.rs:381-385),
        w = -1/(2 x0) computed once on device (batch inversion analog of
        basecode.rs:355-360)."""
        import jax

        if level not in self._fold_tables:
            with jax.ensure_compile_time_eval():
                x0 = self.level(level)
                if level > 0:
                    x0 = ntt.bitrev(x0)
                from ..field import fops

                denom = fops.neg(gl.add(x0, x0))  # -2 x0
                w = gl.inv(denom)
                self._fold_tables[level] = (x0, w)
        return self._fold_tables[level]

    def fold_gather(self, level: int, pair_indices: np.ndarray) -> Tuple[Gl, Gl]:
        """(x0, w) at specific pair indices (verifier query path)."""
        import jax.numpy as jnp

        x0, w = self.fold_table(level)
        idx = jnp.asarray(np.asarray(pair_indices, dtype=np.int64))
        return gl.take(x0, idx), gl.take(w, idx)

    def _vander(self, lg_m: int) -> Gl:
        """(2^lg_m * rate,) x (2^lg_m) is avoided: Horner needs only the
        domain row [1, 2, ..., m*rate] (basecode.rs:230 ``steps(F::ONE)``)."""
        import jax

        if lg_m not in self._vandermonde:
            m = 1 << (lg_m + self.spec.rate_log)
            with jax.ensure_compile_time_eval():
                self._vandermonde[lg_m] = gl.from_u64(
                    np.arange(1, m + 1, dtype=np.uint64)
                )
        return self._vandermonde[lg_m]

    # -- encode ------------------------------------------------------------

    def encode(self, coeffs, use_jit: bool = True):
        """Message (length 2^k evals/coeffs, natural order) → codeword of
        length 2^(k + rate_log), natural order.

        Matches basecode.rs:154-171 encode: chunked naive-RS base encode
        then the foldable-domain expansion.  use_jit=False returns the
        traceable computation directly (for callers already inside jit, and
        for tiny CPU-hosted tests where a fresh XLA:CPU compile costs ~76 s,
        see PERF.md)."""
        from ..utils import cached_jit

        n = _len(coeffs)
        k = n.bit_length() - 1
        assert k <= self.full_msg_log, "message too big for this setup"
        msg_log = min(self.spec.basecode_msg_size_log, k)
        msg = 1 << msg_log
        rate = 1 << self.spec.rate_log

        domain = self._vander(msg_log)  # (msg*rate,)
        levels = [
            self.level(i + self.spec.rate_log) for i in range(msg_log, k)
        ]

        def run(v):
            chunks = v.reshape(n // msg, msg)  # (C, msg)
            # Horner over the msg coefficients: res = res*D + c_j, highest
            # first.  A python loop of <=128 fused mul+adds traces small and
            # runs fused; the scan alternative saves nothing at this size.
            res = _zeros_like(v, (n // msg, msg * rate))
            for j in range(msg - 1, -1, -1):
                res = _add(_mul_gl(res, domain), _slice_col(chunks, j))
            # foldable-domain expansion (basecode.rs:268-312): at each
            # level the codeword count halves and the length doubles.
            cw = res
            for t in levels:
                C, L = _shape2(cw)
                a = _rows(cw, 0, 2)  # (C/2, L) even codeword of each pair
                b = _rows(cw, 1, 2)  # (C/2, L) odd codeword
                rhs = _mul_gl(b, t)
                cw = _hconcat(_add(a, rhs), _sub(a, rhs))  # (C/2, 2L)
            return _ravel(cw)

        if not use_jit:
            return run(coeffs)
        # key on stable identity, not id(self): (seed, spec, full_msg_log)
        # fully determine the closed-over tables, and ids are recycled by GC
        return cached_jit(
            ("basecode_encode", self.seed, self.spec, self.full_msg_log, k,
             isinstance(coeffs, Gl)),
            lambda: run,
        )(coeffs)

    def encode_small(self, coeffs):
        """Verifier-side final-message encode (basecode.rs:173-179): one
        naive-RS codeword over the whole (small) message."""
        n = _len(coeffs)
        k = n.bit_length() - 1
        domain = self._vander(k)

        def run(v):
            res = _zeros_like(v, (1, n * (1 << self.spec.rate_log)))
            chunks = v.reshape(1, n)
            for j in range(n - 1, -1, -1):
                res = _add(_mul_gl(res, domain), _slice_col(chunks, j))
            return _ravel(res)

        return run(coeffs)


# -- message folding (left-right codes) --------------------------------------


def fold_message_lr(msg, challenge: Gl2) -> Gl2:
    """One basefold message-fold round for a left-right code: pair
    (m[i], m[i + n/2]) → m[i] + challenge * m[i + n/2].

    Equivalent to the reference's bitrev → even-odd fold → bitrev dance
    (encoding.rs:183-220 + fold_message): bit-reversal maps left-right
    pairs to adjacent pairs; folding back-to-back reversals cancel."""
    from ..field import fops

    n = _len(msg)
    half = n // 2
    lo = msg[..., :half]
    hi = msg[..., half:]
    return fops.add(lo, fops.mul(hi, challenge))


# -- tiny Gl/Gl2-polymorphic helpers (same shapes both field types) ----------


def _len(p) -> int:
    return p.lo.shape[-1] if isinstance(p, Gl) else p.c0.lo.shape[-1]


def _shape2(p):
    s = p.lo.shape if isinstance(p, Gl) else p.c0.lo.shape
    return s[-2], s[-1]


def _map(f, p):
    if isinstance(p, Gl):
        return Gl(f(p.lo), f(p.hi))
    return Gl2(Gl(f(p.c0.lo), f(p.c0.hi)), Gl(f(p.c1.lo), f(p.c1.hi)))


def _zeros_like(p, shape):
    from ..field import gl2

    return gl.zeros(shape) if isinstance(p, Gl) else gl2.zeros(shape)


def _rows(p, start, step):
    return _map(lambda a: a[..., start::step, :], p)


def _slice_col(p, j):
    return _map(lambda a: a[..., j : j + 1], p)


def _ravel(p):
    return _map(lambda a: a.reshape(-1), p)


def _hconcat(a, b):
    import jax.numpy as jnp

    if isinstance(a, Gl):
        return Gl(
            jnp.concatenate([a.lo, b.lo], axis=-1),
            jnp.concatenate([a.hi, b.hi], axis=-1),
        )
    return Gl2(_hconcat(a.c0, b.c0), _hconcat(a.c1, b.c1))


def _add(a, b):
    from ..field import fops

    return fops.add(a, b)


def _sub(a, b):
    from ..field import fops

    return fops.sub(a, b)


def _mul_gl(a, t: Gl):
    """a (Gl or Gl2) times base-field t, broadcasting over rows."""
    from ..field import fops

    return fops.mul(a, t)
