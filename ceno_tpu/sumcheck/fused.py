"""Whole-prove fused devirgo sumcheck: ONE jitted program per (num_vars,
term structure), built ENTIRELY from fixed-shape masked `lax.scan` stages.

Why this shape (measured on TPU v5e through the axon tunnel):

* per-program launch overhead is ~1 ms, and — critically — *top-level HLO
  ops cost ~0.5-5 ms each at runtime* on this backend, while ops inside a
  `lax.scan` body cost microseconds.  A fully unrolled 6-round prove
  (~3k top-level ops) measured 280+ SECONDS of device time; the same
  rounds as scan stages run in milliseconds.
* XLA compile time scales with traced graph size: a scan body is traced
  once, so a program of K stages compiles in ~K x 15 s instead of the ~19
  minutes an unrolled 20-round program took.

Structure: rounds run inside masked fixed-shape scans.  A stage covers S
rounds at one buffer shape; the live prefix halves every round and is
tracked by a mask (sums are exact — dead lanes are zeroed); between stages
the buffer is sliced down to the live prefix, bounding the masked overhead
by ~2x on each stage's traffic.  The round body is EVAL-FIRST: iteration j
computes the round-(j+1) evaluations from the current buffer, absorbs them,
samples the challenge, then folds — so no challenge threads across stage
boundaries and round 1 needs no special case.

Protocol/transcript layout is IDENTICAL to prover.prove (same absorbs, same
challenge schedule — see prover.py and PROTOCOL.md); tests assert equality
of the two paths.  Reference protocol shape:
/root/reference/sumcheck/src/prover_v2.rs:36-315.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fops, gl, gl2
from ..field.gl import Gl
from ..field.gl2 import Gl2
from ..transcript import basic as tr

# minimum num_vars to route through the fused program (smaller sumchecks
# reuse the shared per-round kernels in prover.py, which amortize compiles
# across the zkvm's many small tower layers)
FUSED_MIN_VARS = int(os.environ.get("CENO_SUMCHECK_FUSED_MIN_VARS", "10"))


def _length(m) -> int:
    return m.lo.shape[-1] if isinstance(m, Gl) else m.c0.lo.shape[-1]


def can_fuse(poly) -> bool:
    """Fused path handles the uniform hot case: every MLE full-length."""
    if not poly.terms or poly.max_degree < 1:
        return False
    full = 1 << poly.num_vars
    return all(_length(m) == full for m in poly.mles)


def _stage_plan(n_rounds: int) -> List[int]:
    """Stage lengths: short stages while the buffer is big (masked overhead
    is paid on the stage's full shape), longer ones as it shrinks."""
    plan: List[int] = []
    left = n_rounds
    for s in (2, 2, 4):
        if left <= 0:
            break
        t = min(s, left)
        plan.append(t)
        left -= t
    while left > 0:
        t = min(12, left)
        plan.append(t)
        left -= t
    return plan


def _fold(m: Gl2, r: Gl2) -> Gl2:
    lo, hi = fops.deinterleave(m)
    return fops.add(fops.mul(fops.sub(hi, lo), r), lo)


def _dup(m: Gl2) -> Gl2:
    """(T, H) -> (T, 2H) by duplication: keeps the scan buffer shape fixed;
    the live prefix is tracked by the caller's mask."""

    def d(a):
        return jnp.concatenate([a, a], axis=-1)

    return Gl2(Gl(d(m.c0.lo), d(m.c0.hi)), Gl(d(m.c1.lo), d(m.c1.hi)))


def _term_evals(factors, degree, max_degree, live_pairs) -> List[Gl2]:
    """Round evals of one product term, summing only the first `live_pairs`
    pairs (live_pairs: traced uint32 scalar; None = all live)."""
    from .prover import _lagrange_int_coeffs

    pairs = [fops.deinterleave(f) for f in factors]
    evens = [p[0] for p in pairs]
    odds = [p[1] for p in pairs]
    diffs = [gl2.sub(o, e) for o, e in zip(odds, evens)]

    h = _length(evens[0])
    if live_pairs is not None:
        idx = jax.lax.broadcasted_iota(jnp.uint32, (h, 1), 0)[:, 0]
        mask = idx < live_pairs  # broadcasts over the leading shard axis
    else:
        mask = None

    def point_sum(vals):
        prod = vals[0]
        for v in vals[1:]:
            prod = gl2.mul(prod, v)
        if mask is not None:
            prod = gl2.select(mask, prod, gl2.zeros(prod.shape))
        return gl2.sum_reduce(prod)

    evals = [point_sum(evens), point_sum(odds)]
    cur = odds
    for _t in range(2, degree + 1):
        cur = [gl2.add(c, d) for c, d in zip(cur, diffs)]
        evals.append(point_sum(cur))

    if degree < max_degree:
        base = list(evals)
        for at in range(degree + 1, max_degree + 1):
            coeffs = _lagrange_int_coeffs(degree + 1, at)
            acc = gl2.zeros(())
            for c, e in zip(coeffs, base):
                acc = gl2.add(acc, gl2.mul(e, gl2.const(c)))
            evals.append(acc)
    return evals


def _round_evals(mles, coeffs, factors, max_degree, live_pairs) -> Gl2:
    total: List[Optional[Gl2]] = [None] * (max_degree + 1)
    for coeff, fac in zip(coeffs, factors):
        fs = [mles[i] for i in fac]
        evals = _term_evals(fs, len(fac), max_degree, live_pairs)
        for t in range(max_degree + 1):
            v = gl2.mul(evals[t], coeff)
            total[t] = v if total[t] is None else gl2.add(total[t], v)
    return gl2.stack(total)


def _u64_elem(v: int) -> Gl:
    return gl.from_u64(np.asarray([v], dtype=np.uint64))


def _build_program(n, T, factors, max_degree, stage_plan):
    """Trace-time program builder.  Static: n, T, factors, degree, plan."""
    logT = T.bit_length() - 1
    n_local = n - logT

    def round_body(bufs, ts, coeffs, live_pairs):
        evals = _round_evals(bufs, coeffs, factors, max_degree, live_pairs)
        ts = tr.absorb_exts(ts, evals)
        ts, challenge = tr.get_and_append_challenge(ts, b"Internal round")
        bufs = [_dup(_fold(b, challenge)) for b in bufs]
        return bufs, ts, evals, challenge

    def run_stage(mles, ts, coeffs, live: int, s: int):
        """s rounds at fixed shape; live = live prefix at stage entry."""

        def body(carry, live_pairs):
            bufs, ts_c = carry
            bufs, ts2, evals, challenge = round_body(
                bufs, ts_c, coeffs, live_pairs
            )
            return (bufs, ts2), (evals, challenge)

        live_pairs = jnp.asarray(
            [live >> (j + 1) for j in range(s)], dtype=jnp.uint32
        )
        (mles, ts), (evs, chs) = jax.lax.scan(body, (mles, ts), live_pairs)
        # slice to the live prefix for the next stage
        keep = live >> s
        mles = [m[..., :keep] for m in mles]
        return mles, ts, evs, chs

    def prog(mles, coeffs, ts):
        # header (one length-1 scan: unrolled top-level ops are ~1000x more
        # expensive than the same ops inside a scan body on this backend)
        def hdr(ts_c, _):
            ts2 = tr.absorb_base(ts_c, _u64_elem(n))
            return tr.absorb_base(ts2, _u64_elem(max_degree)), None

        ts, _ = jax.lax.scan(hdr, ts, None, length=1)

        mles = [fops.to_ext(m) for m in mles]
        ev_parts, ch_parts = [], []

        live = 1 << n_local
        for s in stage_plan:
            mles, ts, evs, chs = run_stage(mles, ts, coeffs, live, s)
            ev_parts.append(evs)
            ch_parts.append(chs)
            live >>= s

        # phase 2: merge per-shard scalars into a logT-var poly
        # (merge_sumcheck_polys_v2, sumcheck/src/util.rs:224+)
        if logT:
            mles = [m[..., 0].reshape(1, T) for m in mles]
            mles, ts, evs, chs = run_stage(mles, ts, coeffs, T, logT)
            ev_parts.append(evs)
            ch_parts.append(chs)

        final_evals = gl2.stack([m[0, 0] for m in mles])
        msgs = gl2.concat(ev_parts, axis=0) if len(ev_parts) > 1 else ev_parts[0]
        chals = gl2.concat(ch_parts, axis=0) if len(ch_parts) > 1 else ch_parts[0]
        return msgs, chals, final_evals, ts

    return prog


class Rows:
    """Lazy sequence view over a stacked Gl2 (n, ...).

    Device-side row slicing costs ~1 ms per op on this backend; a prove must
    not pay for materializing per-round lists it may never read.  Slices run
    on first access (e.g. at verification) and are cached."""

    def __init__(self, stacked: Gl2, n: int):
        self._stacked = stacked
        self._n = n
        self._cache = {}

    def __len__(self):
        return self._n

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(self._n))]
        if i < 0:
            i += self._n
        if not 0 <= i < self._n:
            raise IndexError(i)
        if i not in self._cache:
            self._cache[i] = self._stacked[i]
        return self._cache[i]

    def __iter__(self):
        for i in range(self._n):
            yield self[i]

    @property
    def stacked(self) -> Gl2:
        return self._stacked


_PROGRAMS = {}


def fused_prove(poly, ts: tr.TranscriptState, num_shards: int = 1):
    """Drop-in for prover.prove on uniform full-length virtual polys.

    Returns (SumcheckProof, final_evals, ts) with a transcript byte-identical
    to the per-round path; proof.point / proof.round_evals are lazy Rows."""
    from .prover import SumcheckProof

    n = poly.num_vars
    T = num_shards
    assert T & (T - 1) == 0 and T >= 1
    logT = T.bit_length() - 1
    assert logT < n
    assert can_fuse(poly)

    factors = tuple(t.factors for t in poly.terms)
    max_degree = poly.max_degree
    dtypes = tuple(isinstance(m, Gl2) for m in poly.mles)
    plan = tuple(_stage_plan(n - logT))
    key = (n, T, factors, max_degree, dtypes, plan)
    if key not in _PROGRAMS:
        _PROGRAMS[key] = jax.jit(
            _build_program(n, T, factors, max_degree, plan)
        )

    mles = [m.reshape(T, _length(m) // T) for m in poly.mles]
    coeffs = [t.coeff for t in poly.terms]
    msgs, chals, final_stacked, ts = _PROGRAMS[key](mles, coeffs, ts)
    proof = SumcheckProof(Rows(chals, n), Rows(msgs, n))
    final_rows = Rows(final_stacked, len(poly.mles))
    return proof, list(final_rows), ts
