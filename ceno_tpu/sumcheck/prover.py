"""Devirgo two-phase sumcheck prover, TPU-native.

Protocol structure and transcript schedule follow the reference one-to-one
(/root/reference/sumcheck/src/prover_v2.rs:36-315); bit-level Fiat-Shamir
identity with the Rust build is NOT claimed — see PROTOCOL.md:

* absorb ``num_total_vars`` then ``max_degree`` (as u64 messages);
* phase 1: ``n - log2(T)`` rounds; each round the d+1 univariate evaluations
  are *summed across all T shards* before being absorbed (so the transcript —
  hence the proof — is independent of how the work is laid out), then the
  challenge is ``get_and_append_challenge(b"Internal round")``;
* phase 2: merge per-shard final values into a log2(T)-var poly and run the
  remaining rounds (/root/reference/sumcheck/src/prover_v2.rs:257-298).

TPU-native design: the reference fans out OS threads and syncs them through
crossbeam channels (TranscriptSyncronized).  Here a "thread" is a leading
shard axis on every MLE array: phase-1 rounds are batched elementwise ops of
shape (T, L) and the cross-shard sum is one reduction — ``jnp.sum`` on a
single chip, ``psum`` over the device mesh under ``shard_map``
(see ceno_tpu/parallel/).

Compilation model: one fused jitted kernel per *phase* — every round's
fold + d+1 evaluations + transcript absorb + challenge squeeze are unrolled
into a single XLA program (shapes halve per round, so the loop is traced
unrolled; each round is a handful of fused elementwise VPU ops plus one
Poseidon permutation).  The whole prove is 1-2 device dispatches instead of
2 per round, which removes the launch-overhead floor that dominated the
per-round design (~40 dispatches for nv=20).  Kernels are cached by
(term structure, shapes, round count); set CENO_SUMCHECK_FUSE=<N> to cap
rounds per kernel (smaller programs, more dispatches) when compile time
matters more than throughput.

Round-evaluation kernels mirror prover_v2.rs:431-533: a degree-d product
contributes evals at t=0..d via prod_i(even_i + t*(odd_i - even_i)); factors
shorter than the max num_vars are scaled by 2^(missing vars)
(prover_v2.rs:425-430, passed in as a dynamic per-term scale so the kernel
is shape-keyed only); lower-degree products are extrapolated to
max_degree+1 points by exact Lagrange interpolation at integer nodes
(same field values as the reference's barycentric path, util.rs:105-145).
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import numpy as np

from ..field import fops, gl, gl2
from ..field.gl import Gl
from ..field.gl2 import Gl2
from ..transcript import basic as tr
from .virtual_poly import VirtualPoly

P = gl.P


class SumcheckProof(NamedTuple):
    point: List[Gl2]  # n challenges (phase1 + phase2)
    round_evals: List[Gl2]  # per round: (max_degree+1,) ext elements


def _length(m) -> int:
    return m.lo.shape[-1] if isinstance(m, Gl) else m.c0.lo.shape[-1]


def _fold_last(m, r: Gl2):
    """Fold the lowest variable (last-axis pairs) at ext point r."""
    lo, hi = fops.deinterleave(m)
    return fops.add(fops.mul(fops.sub(hi, lo), r), fops.to_ext(lo))


def _lagrange_int_coeffs(num_points: int, at: int) -> List[int]:
    """c_i = prod_{j!=i}(at-j)/(i-j) mod P for points 0..num_points-1."""
    coeffs = []
    for i in range(num_points):
        num, den = 1, 1
        for j in range(num_points):
            if j != i:
                num = num * (at - j) % P
                den = den * (i - j) % P
        coeffs.append(num * pow(den, P - 2, P) % P)
    return coeffs


def _term_round_evals(factors, degree: int, max_degree: int) -> List[Gl2]:
    """Evals of one product term's round polynomial at t = 0..max_degree.

    factors: equal-length arrays with the hypercube on the last axis; all
    leading axes (the shard axis) are summed into the result.
    Returns max_degree+1 ext scalars (extrapolated beyond degree).
    """
    L = _length(factors[0])
    if L == 1:
        prod = factors[0][..., 0]
        for f in factors[1:]:
            prod = fops.mul(prod, f[..., 0])
        v = fops.to_ext(fops.sum_reduce(prod)) if prod.shape else fops.to_ext(prod)
        return [v] * (max_degree + 1)

    pairs = [fops.deinterleave(f) for f in factors]
    evens = [p[0] for p in pairs]
    odds = [p[1] for p in pairs]
    diffs = [fops.sub(o, e) for o, e in zip(odds, evens)]

    def point_sum(vals):
        prod = vals[0]
        for v in vals[1:]:
            prod = fops.mul(prod, v)
        return fops.to_ext(fops.sum_reduce(prod))

    evals = [point_sum(evens), point_sum(odds)]
    cur = odds
    for _t in range(2, degree + 1):
        cur = [fops.add(c, d) for c, d in zip(cur, diffs)]
        evals.append(point_sum(cur))

    if degree < max_degree:
        # exact Lagrange extrapolation at integer nodes (matches the
        # reference's barycentric extrapolate, sumcheck/src/util.rs:105-145)
        base = list(evals)
        for at in range(degree + 1, max_degree + 1):
            coeffs = _lagrange_int_coeffs(degree + 1, at)
            acc = gl2.zeros(())
            for c, e in zip(coeffs, base):
                acc = gl2.add(acc, gl2.mul(e, gl2.const(c)))
            evals.append(acc)
    return evals


# ---------------------------------------------------------------------------
# Shape-keyed jitted kernels
# ---------------------------------------------------------------------------

_KERNELS = {}


def _sig(mles, factors, max_degree, has_challenge):
    return (
        tuple(factors),
        tuple((isinstance(m, Gl2), m.shape) for m in mles),
        max_degree,
        has_challenge,
    )


def _round_kernel(mles, scales, challenge, factors, max_degree):
    """Fold challenge (if given) into every MLE, then compute round evals.

    scales: per-term Gl2 scalar = coeff * 2^(num-var deficit) for this round.
    Returns (new_mles, (max_degree+1,) Gl2 evals).
    """
    if challenge is not None:
        mles = [
            _fold_last(m, challenge) if _length(m) > 1 else fops.to_ext(m)
            for m in mles
        ]
    total: List[Optional[Gl2]] = [None] * (max_degree + 1)
    for scale, fac in zip(scales, factors):
        fs = [mles[i] for i in fac]
        evals = _term_round_evals(fs, len(fac), max_degree)
        for t in range(max_degree + 1):
            v = gl2.mul(evals[t], scale)
            total[t] = v if total[t] is None else gl2.add(total[t], v)
    return mles, gl2.stack(total)


def _run_round(mles, scales, challenge, factors, max_degree):
    key = _sig(mles, factors, max_degree, challenge is not None)
    if key not in _KERNELS:
        fn = partial(_round_kernel, factors=tuple(factors), max_degree=max_degree)
        _KERNELS[key] = jax.jit(
            (lambda m, s, c: fn(m, s, c))
            if challenge is not None
            else (lambda m, s: fn(m, s, None))
        )
    if challenge is not None:
        return _KERNELS[key](mles, scales, challenge)
    return _KERNELS[key](mles, scales)


_PHASE_KERNELS = {}


def _phase_body(mles, ts, scales, challenge, factors, max_degree, final_fold):
    """Unrolled chain of len(scales) rounds: per round fold the pending
    challenge, evaluate, absorb into the transcript, squeeze the next
    challenge.  Optionally fold the last challenge into the returned MLEs."""
    msgs, chals = [], []
    for rnd_scales in scales:
        mles, evals = _round_kernel(mles, rnd_scales, challenge, factors, max_degree)
        ts2 = tr.absorb_exts(ts, evals)
        ts, challenge = tr.get_and_append_challenge(ts2, b"Internal round")
        msgs.append(evals)
        chals.append(challenge)
    if final_fold:
        mles = [
            _fold_last(m, challenge) if _length(m) > 1 else fops.to_ext(m)
            for m in mles
        ]
    return mles, msgs, chals, ts, challenge


def _run_phase(mles, ts, scales, challenge, factors, max_degree, final_fold):
    """Run len(scales) rounds as ONE jitted program (see module docstring)."""
    key = (
        _sig(mles, factors, max_degree, challenge is not None),
        len(scales),
        final_fold,
    )
    if key not in _PHASE_KERNELS:
        fn = partial(
            _phase_body,
            factors=tuple(factors),
            max_degree=max_degree,
            final_fold=final_fold,
        )
        _PHASE_KERNELS[key] = jax.jit(
            (lambda m, t, s, c: fn(m, t, s, c))
            if challenge is not None
            else (lambda m, t, s: fn(m, t, s, None))
        )
    if challenge is not None:
        return _PHASE_KERNELS[key](mles, ts, scales, challenge)
    return _PHASE_KERNELS[key](mles, ts, scales)


_FOLD_KERNELS = {}


def _run_final_fold(mles, challenge):
    key = tuple((isinstance(m, Gl2), m.shape) for m in mles)
    if key not in _FOLD_KERNELS:
        _FOLD_KERNELS[key] = jax.jit(
            lambda ms, c: [
                _fold_last(m, c) if _length(m) > 1 else fops.to_ext(m) for m in ms
            ]
        )
    return _FOLD_KERNELS[key](mles, challenge)


_ABSORB_KERNELS = {}


def _absorb_round(ts, evals: Gl2):
    """Absorb the round evals and sample the round challenge (jitted)."""
    k = evals.c0.lo.shape[0]
    if k not in _ABSORB_KERNELS:

        def go(ts_state, ev):
            ts2 = tr.absorb_exts(ts_state, ev)
            return tr.get_and_append_challenge(ts2, b"Internal round")

        _ABSORB_KERNELS[k] = jax.jit(go)
    return _ABSORB_KERNELS[k](ts, evals)


_SCALE_KERNEL = None


def _term_scale(coeff: Gl2, mult: int) -> Gl2:
    global _SCALE_KERNEL
    if mult == 0:
        return coeff
    if _SCALE_KERNEL is None:
        _SCALE_KERNEL = jax.jit(gl2.mul)
    return _SCALE_KERNEL(coeff, gl2.full((), 1 << mult))


# ---------------------------------------------------------------------------
# The prover
# ---------------------------------------------------------------------------


def prove(
    poly: VirtualPoly,
    ts: tr.TranscriptState,
    num_shards: int = 1,
) -> Tuple[SumcheckProof, List[Gl2], tr.TranscriptState]:
    """Prove Sum_{b in {0,1}^n} poly(b); returns (proof, final MLE evals, ts).

    ``num_shards`` (power of two) reproduces the reference's max_thread_id:
    it is a protocol parameter (it moves log2(T) variables from phase 1 to
    phase 2) but the *transcript layout* is shard-oblivious, matching
    prover_v2.rs:66 absorbing num_vars_local + log2(T) = total vars.
    """
    n = poly.num_vars
    if n == 0:
        return SumcheckProof([], []), [fops.to_ext(m) for m in poly.mles], ts

    # Big uniform sumchecks route through the whole-prove fused program
    # (one launch, scan-stage compile cost); see fused.py.  Byte-identical
    # transcript — tests/test_sumcheck.py asserts equality of the paths.
    # Default: on for accelerator backends only — XLA:CPU compiles the scan
    # program pathologically slowly (~76 s for a tiny config vs ~25 s on the
    # TPU for a 2^20 one), so CPU runs stay on the shared per-round kernels
    # unless CENO_SUMCHECK_FUSED=1 opts in.
    from . import fused as _fused

    fused_env = os.environ.get("CENO_SUMCHECK_FUSED", "auto")
    use_fused = fused_env == "1" or (
        fused_env == "auto" and not _on_cpu(poly.mles)
    )
    if (
        use_fused
        and fused_env != "0"
        and n >= _fused.FUSED_MIN_VARS
        and _fused.can_fuse(poly)
    ):
        return _fused.fused_prove(poly, ts, num_shards=num_shards)

    T = num_shards
    assert T & (T - 1) == 0 and T >= 1
    logT = T.bit_length() - 1
    assert logT < n, "need at least 1 local variable per shard"
    n_local = n - logT
    max_degree = poly.max_degree

    ts = tr.absorb_base(ts, _u64_elem(n))
    ts = tr.absorb_base(ts, _u64_elem(max_degree))

    # shard layout: MLE of length 2^k -> (T, 2^k / T); shard s owns the
    # contiguous range [s*2^(k-logT), (s+1)*...) = the top logT index bits,
    # mirroring VirtualPolynomials' ranged slices (virtual_polys.rs:44-56).
    def to_shards(m):
        ln = _length(m)
        assert ln >= T, "MLE shorter than shard count"
        return m.reshape(T, ln // T)

    mles = [to_shards(m) for m in poly.mles]
    factors = [t.factors for t in poly.terms]
    coeffs = [t.coeff for t in poly.terms]

    challenges: List[Gl2] = []
    msgs: List[Gl2] = []

    def scales_for(round_1idx, num_vars_phase, init_lens):
        """Per-term scale for a round: coeff * 2^(num-var deficit).  Lengths
        evolve deterministically (halve per round, floor 1), so this is a
        pure function of the phase-entry lengths."""
        out = []
        for term, ln0 in zip(poly.terms, init_lens):
            ln = max(ln0 >> (round_1idx - 1), 1)
            log_len = max(ln.bit_length() - 1, 1)
            mult = max(num_vars_phase - (log_len + round_1idx - 1), 0)
            out.append(_term_scale(term.coeff, mult))
        return out

    chunk = int(os.environ.get("CENO_SUMCHECK_FUSE", "0")) or (1 << 30)
    # Below this round count, use the per-round shared kernels: a round
    # kernel at size L is reused by EVERY sumcheck passing through L (tower
    # layers, different-num_vars table proofs), so the zkvm's many small
    # sumchecks compile O(sizes) kernels instead of O(sizes^2).  At/above it
    # (big PCS/bench sumchecks — few distinct shapes) fuse the whole phase
    # into one program and pay one compile for a dispatch-free round chain.
    fuse_min = int(os.environ.get("CENO_SUMCHECK_FUSE_MIN", "15"))

    def run_rounds(mles, ts, num_rounds, num_vars_phase):
        """All rounds of one phase."""
        init_lens = [_length(mles[t.factors[0]]) for t in poly.terms]
        all_scales = tuple(
            tuple(scales_for(r, num_vars_phase, init_lens))
            for r in range(1, num_rounds + 1)
        )
        challenge = None
        if num_rounds < fuse_min:
            for rnd in range(num_rounds):
                mles, evals = _run_round(
                    mles, all_scales[rnd], challenge, factors, max_degree
                )
                ts, challenge = _absorb_round(ts, evals)
                msgs.append(evals)
                challenges.append(challenge)
            mles = _run_final_fold(mles, challenge)
            return mles, ts
        done = 0
        while done < num_rounds:
            step = min(chunk, num_rounds - done)
            mles, m, c, ts, challenge = _run_phase(
                mles, ts, all_scales[done : done + step], challenge,
                factors, max_degree, final_fold=(done + step == num_rounds),
            )
            msgs.extend(m)
            challenges.extend(c)
            done += step
        return mles, ts

    # ---- phase 1: n_local rounds over (T, L) arrays ---------------------
    mles, ts = run_rounds(mles, ts, n_local, n_local)

    # ---- merge: per-shard scalars -> logT-var poly -----------------------
    # (merge_sumcheck_polys_v2, /root/reference/sumcheck/src/util.rs:224+)
    if logT:
        mles = [m[..., 0].reshape(1, T) for m in mles]
        mles, ts = run_rounds(mles, ts, logT, logT)

    final_evals = [fops.to_ext(m[0, 0]) for m in mles]
    return SumcheckProof(challenges, msgs), final_evals, ts


def _u64_elem(v: int) -> Gl:
    return gl.from_u64(np.asarray([v], dtype=np.uint64))


def _on_cpu(mles) -> bool:
    """True when the MLE data lives on CPU devices.

    The fused-path heuristic must key on where the arrays ARE, not on
    jax.default_backend(): under the axon plugin the default backend is the
    tunneled TPU even when the caller sharded everything over a virtual CPU
    mesh (the driver's multichip dryrun) — routing that case through the
    fused scan program would hit XLA:CPU's pathological scan compile times
    (PERF.md)."""
    for m in mles:
        for leaf in jax.tree_util.tree_leaves(m):
            devs = getattr(leaf, "devices", None)
            if callable(devs):
                try:
                    return all(d.platform == "cpu" for d in devs())
                except Exception:
                    break
    return jax.default_backend() == "cpu"
