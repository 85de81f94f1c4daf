"""Sumcheck verifier.

Matches /root/reference/sumcheck/src/verifier.rs: absorb num_vars and
max_degree, then per round absorb the d+1 evaluations and sample the
challenge; deferred checks that p_i(0)+p_i(1) equals the previous round's
claimed value, with p_i(r) by univariate Lagrange interpolation at integer
nodes (util.rs:157-224).

Host-sync discipline: device->host readbacks cost ~1s over the TPU tunnel,
so all round checks accumulate into one on-device boolean and the caller
syncs ONCE (``SubClaim.ok``); nothing in here blocks.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import numpy as np

from ..field import fops, gl2
from ..field.gl2 import Gl2
from ..transcript import basic as tr
from .prover import SumcheckProof, _u64_elem

P = 0xFFFFFFFF00000001


class SubClaim(NamedTuple):
    point: List[Gl2]
    expected_evaluation: Gl2
    ok: jax.Array  # on-device bool: all round checks passed


def interpolate_uni_poly(evals: Gl2, r: Gl2) -> Gl2:
    """Evaluate the degree-(k-1) poly with values evals[i] at i, at point r."""
    k = evals.c0.lo.shape[0]
    # prefix/suffix products of (r - j)
    terms = [gl2.sub(r, gl2.const(j)) for j in range(k)]
    pre = [gl2.ones(())]
    for t in terms[:-1]:
        pre.append(gl2.mul(pre[-1], t))
    suf = [gl2.ones(())]
    for t in reversed(terms[1:]):
        suf.append(gl2.mul(suf[-1], t))
    suf.reverse()
    acc = gl2.zeros(())
    for i in range(k):
        # denom_i = prod_{j!=i} (i-j) = (-1)^(k-1-i) * i! * (k-1-i)!
        den = 1
        for j in range(k):
            if j != i:
                den = den * ((i - j) % P) % P
        inv_den = pow(den, P - 2, P)
        num = gl2.mul(pre[i], suf[i])
        acc = gl2.add(acc, gl2.mul(gl2.mul(evals[i], num), gl2.const(inv_den)))
    return acc


_VERIFY_KERNELS = {}


def verify(
    claimed_sum: Gl2,
    proof: SumcheckProof,
    num_vars: int,
    max_degree: int,
    ts: tr.TranscriptState,
) -> Tuple[SubClaim, tr.TranscriptState]:
    """Replays the transcript and checks round consistency.

    Returns the subclaim with an on-device ``ok`` flag — use
    :func:`check` (one host sync) or fold ``ok`` into a larger verification
    program before syncing.
    """
    if num_vars == 0:
        import jax.numpy as jnp

        return SubClaim([], claimed_sum, jnp.asarray(True)), ts

    assert len(proof.round_evals) == num_vars, "proof is incomplete"
    for evals in proof.round_evals:
        assert evals.c0.lo.shape[0] == max_degree + 1, "wrong evaluation count"

    key = (num_vars, max_degree)
    if key not in _VERIFY_KERNELS:

        def go(claimed, round_evals, ts_state):
            import jax.numpy as jnp

            ts2 = tr.absorb_base(ts_state, _u64_elem(num_vars))
            ts2 = tr.absorb_base(ts2, _u64_elem(max_degree))
            challenges = []
            for evals in round_evals:
                ts2 = tr.absorb_exts(ts2, evals)
                ts2, c = tr.get_and_append_challenge(ts2, b"Internal round")
                challenges.append(c)
            ok = jnp.asarray(True)
            expected = claimed
            for evals, c in zip(round_evals, challenges):
                got = gl2.add(evals[0], evals[1])
                ok = ok & gl2.eq(got, expected)
                expected = interpolate_uni_poly(evals, c)
            return challenges, expected, ok, ts2

        _VERIFY_KERNELS[key] = jax.jit(go)

    challenges, expected, ok, ts = _VERIFY_KERNELS[key](
        claimed_sum, list(proof.round_evals), ts
    )
    return SubClaim(list(challenges), expected, ok), ts


def check(subclaim: SubClaim) -> None:
    """One host sync; raises if any round check failed."""
    if not bool(np.asarray(jax.device_get(subclaim.ok))):
        raise ValueError("sumcheck verification failed")
