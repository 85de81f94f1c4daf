"""Reed-Solomon encoding for Basefold (the reference's default spec).

Matches /root/reference/mpcs/src/basefold/encoding/rs.rs:
* codeword = coset_fft of the coefficient vector zero-padded by the rate,
  over the domain gamma^(2^(full_msg_log - lg_m)) * H  (gamma = 7, the
  Goldilocks multiplicative generator);
* defaults: 200 queries, rate_log = 1, basecode message size 2^7
  (rs.rs:193-216, soundness per ePrint 2024/1571 Thm 1 at lambda = 100);
* folding coefficients at ``level`` (log2 of the folded codeword size):
  x0 = gamma^(2^(full_codeword_log - level - 1)) * w^bitrev(i, level),
  x1 = -x0, weight w = 1/(x1 - x0) = -1/(2 x0)  (rs.rs:380-420).

TPU-native: folding coefficient tables are precomputed per level as device
vectors (built by log-step doubling, no device inversions — the weight is a
closed-form power product), so a whole-codeword fold is one fused elementwise
kernel and a verifier query-check is a static gather.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import numpy as np

from ..field import fops, gl
from ..field.gl import Gl
from . import ntt

P = gl.P
HALF = (P + 1) // 2  # 1/2 mod P


class RSSpec(NamedTuple):
    num_queries: int = 200
    rate_log: int = 1
    basecode_msg_size_log: int = 7


def _pow2_powers_device(base: int, lg_n: int) -> Gl:
    """[base^0 .. base^(2^lg_n - 1)] as a device vector by doubling."""
    out = gl.ones((1,))
    b = base % P
    for _ in range(lg_n):
        out = gl.concat([out, gl.mul(out, gl.full(out.shape, b))])
        b = b * b % P
    return out


class RSCode:
    """Trimmed RS parameters for messages up to 2^full_msg_log.

    Shared by prover and verifier (the verifier's smaller table in the
    reference is a memory optimization we don't need)."""

    def __init__(self, spec: RSSpec, full_msg_log: int):
        self.spec = spec
        self.full_msg_log = full_msg_log
        self.full_codeword_log = full_msg_log + spec.rate_log
        self._fold_tables: Dict[int, Tuple[Gl, Gl]] = {}

    def encode(self, coeffs, use_jit: bool = True):
        """Encode a coefficient vector (length 2^lg_m) to its codeword of
        length 2^(lg_m + rate_log), natural index order."""
        n = coeffs.lo.shape[-1] if isinstance(coeffs, Gl) else coeffs.c0.lo.shape[-1]
        lg_m = n.bit_length() - 1
        assert lg_m <= self.full_msg_log
        shift = pow(ntt.GENERATOR, 1 << (self.full_msg_log - lg_m), P)
        return ntt.fft(
            coeffs, lg_m + self.spec.rate_log, r=self.spec.rate_log, shift=shift,
            use_jit=use_jit,
        )

    def fold_table(self, level: int) -> Tuple[Gl, Gl]:
        """(x0, w) vectors of length 2^level, indexed by the pair index in
        the bit-reversed codeword (rs.rs prover_folding_coeffs)."""
        import jax

        if level not in self._fold_tables:
            # never cache a traced constant (callers may reach this from
            # inside a jit trace; a cached tracer would leak across traces)
            with jax.ensure_compile_time_eval():
                g_exp = 1 << (self.full_codeword_log - level - 1)
                gamma_pow = pow(ntt.GENERATOR, g_exp, P)
                gamma_pow_inv = pow(gamma_pow, P - 2, P)
                om = pow(ntt.root_of_unity(level + 1), 1, P)
                om_inv = pow(om, P - 2, P)
                pw = _pow2_powers_device(om, level)
                pw_inv = _pow2_powers_device(om_inv, level)
                pw = ntt.bitrev(pw) if level > 0 else pw
                pw_inv = ntt.bitrev(pw_inv) if level > 0 else pw_inv
                x0 = gl.mul(pw, gl.full(pw.shape, gamma_pow))
                # w = -1/2 * gamma^-(...) * om^-bitrev(i)
                w_const = (P - HALF) * gamma_pow_inv % P
                w = gl.mul(pw_inv, gl.full(pw_inv.shape, w_const))
                self._fold_tables[level] = (x0, w)
        return self._fold_tables[level]

    def fold_gather(self, level: int, pair_indices: np.ndarray) -> Tuple[Gl, Gl]:
        """(x0, w) at specific pair indices (verifier query path)."""
        x0, w = self.fold_table(level)
        import jax.numpy as jnp

        idx = jnp.asarray(np.asarray(pair_indices, dtype=np.int64))
        return gl.take(x0, idx), gl.take(w, idx)
