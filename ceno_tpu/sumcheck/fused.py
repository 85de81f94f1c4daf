"""Whole-prove fused devirgo sumcheck: ONE jitted program per (num_vars,
term structure), built ENTIRELY from fixed-shape masked `lax.scan` stages,
with the fold axis living on TPU sublanes.

Measured facts (TPU v5e through the axon tunnel) that shape this design:

* per-program launch is ~1 ms and *top-level* HLO ops cost ~0.5-5 ms each
  at runtime, while the same ops inside a `lax.scan` body cost
  microseconds: a fully unrolled 6-round prove measured 280+ s of device
  time; as scan stages it runs in milliseconds.  Everything, including the
  header absorbs, therefore lives inside scans.
* XLA compile time scales with traced graph size: scan bodies are traced
  once, so a program of K stage bodies compiles in ~K x 15 s instead of the
  ~19 minutes an unrolled 20-round program took.
* adjacent-pair access along the LANE (minor) axis is a relayout pass:
  lane-stride deinterleave of 12x4MB costs ~1.1 ms per round, the same
  split along the SUBLANE axis costs ~30 us (38x).  So the hypercube is
  stored TRANSPOSED — (T, S, 128) with the low log2(S) index bits on the
  sublane axis — one transpose at entry instead of a relayout per round.
  The last 7 variables (and the phase-2 shard merge) run in natural 1-D
  layout, where arrays are tiny and stride cost is irrelevant.

A stage covers s rounds at one buffer shape, ROUNDS_PER_BODY rounds per
scan iteration.  Inside one body the buffers shrink STATICALLY (each fold
halves the shape), so a multi-round body does ~half the dead work of R
single-round iterations while paying one While-iteration overhead instead
of R; the body's final fold is zero-padded back to the stage shape, so dead
rows are EXACTLY ZERO and round evaluations need no masking (zero factors
contribute zero products at every eval point, and zero rows fold to zero).
Between stages the buffer is sliced to the live prefix.  Each round is
EVAL-FIRST: compute the round's evaluations from the current buffer,
absorb them (rate-chunked: the d+1 <= 4 ext evals cost ONE permute,
PROTOCOL.md #13), sample the challenge, fold — the (even, odd) split is
shared between the evaluations and the fold, and all terms' eval points
are summed by ONE stacked reduction.

Protocol/transcript layout is IDENTICAL to prover.prove (same absorbs, same
challenge schedule — see prover.py and PROTOCOL.md); tests assert equality
of the two paths.  Reference protocol shape:
/root/reference/sumcheck/src/prover_v2.rs:36-315.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

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

# rounds per scan-loop iteration: a multi-round body amortizes the per-
# iteration While overhead AND does less dead work (shapes shrink statically
# inside the body); compile cost grows ~linearly with it
ROUNDS_PER_BODY = int(os.environ.get("CENO_SUMCHECK_ROUNDS_PER_BODY", "4"))

LANES = 128
LOG_LANES = 7


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


def _map4(f, m: Gl2):
    return Gl2(
        Gl(f(m.c0.lo), f(m.c0.hi)), Gl(f(m.c1.lo), f(m.c1.hi))
    )


def _deint_rows(m: Gl2) -> Tuple[Gl2, Gl2]:
    """(T, S, C) -> even/odd adjacent ROW pairs (T, S/2, C) — sublane axis,
    ~38x cheaper than the same split on the lane axis."""
    shp = m.c0.lo.shape

    def e(a):
        return a.reshape(shp[:-2] + (shp[-2] // 2, 2, shp[-1]))[..., 0, :]

    def o(a):
        return a.reshape(shp[:-2] + (shp[-2] // 2, 2, shp[-1]))[..., 1, :]

    return _map4(e, m), _map4(o, m)


def _deint_last(m: Gl2) -> Tuple[Gl2, Gl2]:
    lo, hi = gl2.deinterleave(m)
    return lo, hi


def _dup(m: Gl2, axis: int) -> Gl2:
    """Double along `axis` by duplication: keeps the scan buffer shape
    fixed; the live prefix is tracked by the caller's mask."""
    return _map4(lambda a: jnp.concatenate([a, a], axis=axis), m)


def _pad_zeros(m: Gl2, axis: int, factor: int) -> Gl2:
    """Grow `axis` by `factor` with a ZERO tail: keeps the scan buffer shape
    fixed while making dead rows exactly 0, so round evaluations need no
    masking (zero factors contribute zero products to every eval point and
    zero rows fold to zero)."""
    if factor == 1:
        return m

    def pad(a):
        shape = list(a.shape)
        shape[axis] = shape[axis] * (factor - 1)
        return jnp.concatenate([a, jnp.zeros(shape, a.dtype)], axis=axis)

    return _map4(pad, m)


def _stacked_round_evals(evens, odds, coeffs, factors, max_degree, mask):
    """(max_degree+1,) coefficient-weighted round evals.

    Every term's eval-point product is stacked into ONE array and reduced by
    ONE masked column-sum — reductions are the dominant fusion count in the
    round body, and this caps them at 8 u32 reduces per round regardless of
    the number of terms."""
    from .prover import _lagrange_int_coeffs

    prods = []
    spans = []  # (term index, degree) per stacked slot group
    for fac in factors:
        e_ = [evens[i] for i in fac]
        o_ = [odds[i] for i in fac]
        d_ = [gl2.sub(o, e) for o, e in zip(o_, e_)]
        deg = len(fac)

        def prod(vals):
            p = vals[0]
            for v in vals[1:]:
                p = gl2.mul(p, v)
            return p

        pts = [prod(e_), prod(o_)]
        cur = o_
        for _t in range(2, deg + 1):
            cur = [gl2.add(c, d) for c, d in zip(cur, d_)]
            pts.append(prod(cur))
        spans.append(deg)
        prods.extend(pts)

    stacked = gl2.stack(prods)  # (K, ...)
    if mask is not None:
        stacked = gl2.select(mask, stacked, gl2.zeros(stacked.shape))
    # ONE base-field column reduce over (2K, ...) — c0 rows then c1 rows —
    # instead of separate c0/c1 reduces (reduction fusions dominate the
    # round body's runtime; measured ~30% cheaper consolidated)
    k = stacked.c0.lo.shape[0]
    both = gl.concat([stacked.c0, stacked.c1], axis=0)
    ssum = gl.sum_reduce(both.reshape(2 * k, -1), axis=1)  # (2K,)
    sums = Gl2(ssum[:k], ssum[k:])

    total: List[Optional[Gl2]] = [None] * (max_degree + 1)
    at = 0
    for coeff, deg in zip(coeffs, spans):
        evals = [sums[at + t] for t in range(deg + 1)]
        at += deg + 1
        if deg < max_degree:
            base = list(evals)
            for a in range(deg + 1, max_degree + 1):
                cs = _lagrange_int_coeffs(deg + 1, a)
                acc = gl2.zeros(())
                for c, e in zip(cs, base):
                    acc = gl2.add(acc, gl2.mul(e, gl2.const(c)))
                evals.append(acc)
        for t in range(max_degree + 1):
            v = gl2.mul(evals[t], coeff)
            total[t] = v if total[t] is None else gl2.add(total[t], v)
    return gl2.stack(total)


def _u64_elem(v: int) -> Gl:
    return gl.from_u64(np.asarray([v], dtype=np.uint64))


def _build_program(n, T, factors, max_degree, plan_2d, plan_1d):
    """Trace-time program builder.  Static: n, T, factors, degree, plans."""
    logT = T.bit_length() - 1
    n_local = n - logT
    n_2d = sum(plan_2d)

    def absorb_round(ts, evals):
        # rate-chunked absorb (PROTOCOL.md #13): (d+1) <= 4 ext evals =
        # <= 8 base coefficients fit ONE rate block -> ONE permute instead
        # of d+1 (the scalar Poseidon chain is the round's dominant fixed
        # cost); must stay byte-identical to tr.absorb_exts
        ts = tr.absorb_exts(ts, evals)
        return tr.get_and_append_challenge(ts, b"Internal round")

    def run_stage(mles, ts, coeffs, live: int, s: int, rows: bool):
        """s rounds at a fixed shape, R rounds per scan iteration.

        rows=True: pairs on the sublane axis of (T, S, C) buffers;
        rows=False: pairs on the last axis of (T, L) buffers.

        Dead rows are kept EXACTLY ZERO (the fold output is zero-padded
        back to the stage shape), so evaluations need no masking; and the
        buffers shrink *statically* across the R rounds inside one body, so
        a multi-round body does ~half the dead work of R single-round
        iterations while paying one scan-iteration overhead instead of R."""
        axis = -2 if rows else -1

        def rounds_chain(bufs, ts_c, r: int):
            """r rounds, shapes halving statically; returns bufs at 1/2^r."""
            evs, chs = [], []
            for _ in range(r):
                pairs = [
                    (_deint_rows(b) if rows else _deint_last(b)) for b in bufs
                ]
                evens = [p[0] for p in pairs]
                odds = [p[1] for p in pairs]
                evals = _stacked_round_evals(
                    evens, odds, coeffs, factors, max_degree, None
                )
                ts_c, ch = absorb_round(ts_c, evals)
                bufs = [
                    gl2.add(e, gl2.mul(gl2.sub(o, e), ch))
                    for e, o in zip(evens, odds)
                ]
                evs.append(evals)
                chs.append(ch)
            return bufs, ts_c, gl2.stack(evs), gl2.stack(chs)

        def body_of(r: int):
            def body(carry, _):
                bufs, ts_c = carry
                bufs, ts_c, evs, chs = rounds_chain(bufs, ts_c, r)
                bufs = [_pad_zeros(b, axis, 1 << r) for b in bufs]
                return (bufs, ts_c), (evs, chs)

            return body

        n_bodies, r_tail = divmod(s, ROUNDS_PER_BODY)
        ev_parts, ch_parts = [], []
        if n_bodies:
            (mles, ts), (evs, chs) = jax.lax.scan(
                body_of(ROUNDS_PER_BODY), (mles, ts), None, length=n_bodies
            )
            # (bodies, R, d+1) -> (bodies*R, d+1), round order preserved
            ev_parts.append(
                _map4(lambda a: a.reshape((-1,) + a.shape[2:]), evs)
            )
            ch_parts.append(
                _map4(lambda a: a.reshape((-1,) + a.shape[2:]), chs)
            )
        if r_tail:
            # remainder rounds as one length-1 scan (keeps ops on-device)
            (mles, ts), (evs, chs) = jax.lax.scan(
                body_of(r_tail), (mles, ts), None, length=1
            )
            ev_parts.append(_map4(lambda a: a[0], evs))
            ch_parts.append(_map4(lambda a: a[0], chs))
        evs = gl2.concat(ev_parts, axis=0) if len(ev_parts) > 1 else ev_parts[0]
        chs = gl2.concat(ch_parts, axis=0) if len(ch_parts) > 1 else ch_parts[0]
        keep = live >> s
        if rows:
            mles = [_map4(lambda a: a[..., :keep, :], m) for m in mles]
        else:
            mles = [m[..., :keep] for m in mles]
        return mles, ts, evs, chs

    def prog(mles, coeffs, ts):
        # header (one length-1 scan: unrolled top-level ops are ~1000x more
        # expensive than the same ops inside a scan body on this backend)
        def hdr(ts_c, _):
            ts2 = tr.absorb_base(ts_c, _u64_elem(n))
            return tr.absorb_base(ts2, _u64_elem(max_degree)), None

        ts, _ = jax.lax.scan(hdr, ts, None, length=1)

        def entry_transform(*ms):
            out = [fops.to_ext(m) for m in ms]
            if plan_2d:
                S = 1 << (n_local - LOG_LANES)
                # (T, L) -> (T, C, S): i = c*S + s, then swap to (T, S, C)
                out = [
                    _map4(
                        lambda a: jnp.swapaxes(a.reshape(T, LANES, S), -1, -2),
                        m,
                    )
                    for m in out
                ]
            return tuple(out)

        # run the entry relayout inside a length-1 scan: measured ~3.6x
        # cheaper than the same transposes at program top level
        def entry_body(c, _):
            return c, entry_transform(*c)

        _, ys = jax.lax.scan(entry_body, tuple(mles), None, length=1)
        mles = [jax.tree_util.tree_map(lambda a: a[0], m) for m in ys]
        ev_parts, ch_parts = [], []

        # ---- 2-D rounds: low index bits on the sublane axis --------------
        if plan_2d:
            live = 1 << (n_local - LOG_LANES)
            for s in plan_2d:
                mles, ts, evs, chs = run_stage(
                    mles, ts, coeffs, live, s, rows=True
                )
                ev_parts.append(evs)
                ch_parts.append(chs)
                live >>= s
            # collapse (T, 1, C) -> natural (T, C) for the lane tail
            mles = [_map4(lambda a: a[..., 0, :], m) for m in mles]

        # ---- 1-D tail: last LOG_LANES (or all, when n_local small) -------
        live = 1 << (n_local - n_2d)
        for s in plan_1d:
            mles, ts, evs, chs = run_stage(
                mles, ts, coeffs, live, s, rows=False
            )
            ev_parts.append(evs)
            ch_parts.append(chs)
            live >>= s

        # ---- phase 2: merge per-shard scalars into a logT-var poly -------
        # (merge_sumcheck_polys_v2, sumcheck/src/util.rs:224+)
        if logT:
            mles = [m[..., 0].reshape(1, T) for m in mles]
            mles, ts, evs, chs = run_stage(
                mles, ts, coeffs, T, logT, rows=False
            )
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

    n_local = n - logT
    n_2d = max(n_local - LOG_LANES, 0)
    plan_2d = tuple(_stage_plan(n_2d)) if n_2d else ()
    plan_1d = tuple(_stage_plan(n_local - n_2d))

    factors = tuple(t.factors for t in poly.terms)
    max_degree = poly.max_degree
    dtypes = tuple(isinstance(m, Gl2) for m in poly.mles)
    key = (n, T, factors, max_degree, dtypes, plan_2d, plan_1d, ROUNDS_PER_BODY)
    if key not in _PROGRAMS:
        _PROGRAMS[key] = jax.jit(
            _build_program(n, T, factors, max_degree, plan_2d, plan_1d)
        )

    mles = [m.reshape(T, _length(m) // T) for m in poly.mles]
    coeffs = [t.coeff for t in poly.terms]
    msgs, chals, final_stacked, ts = _PROGRAMS[key](mles, coeffs, ts)
    proof = SumcheckProof(Rows(chals, n), Rows(msgs, n))
    final_rows = Rows(final_stacked, len(poly.mles))
    return proof, list(final_rows), ts
