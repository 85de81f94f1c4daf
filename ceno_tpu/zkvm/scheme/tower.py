"""Tower prover/verifier: layer-by-layer batched GKR over fanin-2 product and
LogUp fractional-sum trees.

Protocol matches the reference exactly:
* prover /root/reference/ceno_zkvm/src/scheme/prover.rs:1194-1342 — per round
  one batched sumcheck over all live specs (eq * f1 * f2 for products;
  eq*p1*q2 + eq*p2*q1 and eq*q1*q2 for logup), alpha batch challenge
  (b"combine subset evals") refreshed every round, initial point
  b"product_sum", per-round merge challenge b"merge", rt' = point || r_merge;
* verifier /root/reference/ceno_zkvm/src/scheme/verifier.rs:816-1037.

The per-round sumchecks reuse ceno_tpu.sumcheck (max_degree 3 via the +1 eq
factor); all layer polys live on device and the verifier accumulates its
checks into an on-device ok flag.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ...field import fops, gl2
from ...field.gl2 import Gl2
from ...mle import mle as mle_mod
from ...sumcheck import VirtualPoly
from ...sumcheck import prove as sumcheck_prove
from ...sumcheck import verify as sumcheck_verify
from ...transcript import basic as tr
from .utils import ceil_log2, get_challenge_pows

NUM_FANIN = 2


class TowerProofs(NamedTuple):
    # proofs[round] = list of (d+1,) Gl2 round messages (the sumcheck msgs)
    proofs: List[List[Gl2]]
    # prod_specs_eval[spec][round] = [e_fanin0, e_fanin1]
    prod_specs_eval: List[List[List[Gl2]]]
    # logup_specs_eval[spec][round] = [p1, p2, q1, q2]
    logup_specs_eval: List[List[List[Gl2]]]
    prod_specs_points: List[List[List[Gl2]]]
    logup_specs_points: List[List[List[Gl2]]]


class TowerVerifyOut(NamedTuple):
    rt_tower: List[Gl2]
    prod_point_and_eval: List[Tuple[List[Gl2], Gl2]]
    logup_p_point_and_eval: List[Tuple[List[Gl2], Gl2]]
    logup_q_point_and_eval: List[Tuple[List[Gl2], Gl2]]
    ok: jnp.ndarray


def prove_tower(
    prod_specs: List[List[List[Gl2]]],
    logup_specs: List[List[List[Gl2]]],
    t: tr.Transcript,
    num_shards: int = 1,
) -> Tuple[List[Gl2], TowerProofs]:
    """prod_specs[i] = layers (layers[0] = size-1 pair); logup_specs[i] =
    layers of [p1,p2,q1,q2].  Returns (rt_tower, proofs)."""
    np_spec, nl_spec = len(prod_specs), len(logup_specs)
    max_round_index = max(
        [len(s) for s in prod_specs] + [len(s) for s in logup_specs]
    ) - 1

    proofs: List[List[Gl2]] = []
    prod_evals = [[] for _ in range(np_spec)]
    logup_evals = [[] for _ in range(nl_spec)]
    prod_points = [[] for _ in range(np_spec)]
    logup_points = [[] for _ in range(nl_spec)]

    alpha_pows = get_challenge_pows(np_spec + nl_spec * 2, t)
    out_rt = [t.get_and_append_challenge(b"product_sum")]

    for rnd in range(1, max_round_index + 1):
        num_vars = rnd  # log2_fanin * rnd
        eq = mle_mod.eq_table(out_rt)
        vp = VirtualPoly(num_vars)
        for s, alpha in zip(prod_specs, alpha_pows[:np_spec]):
            if rnd < len(s):
                f1, f2 = s[rnd]
                vp.add_mle_list([eq, f1, f2], alpha)
        for s, (a_num, a_den) in zip(
            logup_specs,
            [
                (alpha_pows[np_spec + 2 * i], alpha_pows[np_spec + 2 * i + 1])
                for i in range(nl_spec)
            ],
        ):
            if rnd < len(s):
                p1, p2, q1, q2 = s[rnd]
                vp.add_mle_list([eq, p1, q2], a_num)
                vp.add_mle_list([eq, p2, q1], a_num)
                vp.add_mle_list([eq, q1, q2], a_den)

        T = num_shards if (1 << num_vars) >= 2 * num_shards else 1
        proof, final_evals, _ = _prove_round(vp, t, T)
        proofs.append(proof.round_evals)

        r_merge = [t.get_and_append_challenge(b"merge")]
        rt_prime = list(proof.point) + r_merge

        alpha_pows = get_challenge_pows(np_spec + nl_spec * 2, t)

        evals_iter = iter(final_evals)
        next(evals_iter)  # skip eq
        for i, s in enumerate(prod_specs):
            if rnd < len(s):
                prod_evals[i].append([next(evals_iter) for _ in range(NUM_FANIN)])
                prod_points[i].append(rt_prime)
        for i, s in enumerate(logup_specs):
            if rnd < len(s):
                p1 = next(evals_iter)
                q2 = next(evals_iter)
                p2 = next(evals_iter)
                q1 = next(evals_iter)
                logup_evals[i].append([p1, p2, q1, q2])
                logup_points[i].append(rt_prime)
        assert next(evals_iter, None) is None
        out_rt = rt_prime

    return out_rt, TowerProofs(
        proofs, prod_evals, logup_evals, prod_points, logup_points
    )


def _prove_round(vp: VirtualPoly, t: tr.Transcript, num_shards: int):
    """Run one batched sumcheck through the mutable transcript wrapper."""
    proof, final_evals, ts = sumcheck_prove(vp, t.ts, num_shards=num_shards)
    t.ts = ts
    return proof, final_evals, ts


def verify_tower(
    prod_out_evals: List[List[Gl2]],
    logup_out_evals: List[List[Gl2]],
    tower_proofs: TowerProofs,
    num_variables: List[int],
    t: tr.Transcript,
) -> TowerVerifyOut:
    np_spec = len(prod_out_evals)
    nl_spec = len(logup_out_evals)
    assert len(num_variables) == np_spec + nl_spec

    alpha_pows = get_challenge_pows(np_spec + nl_spec * 2, t)
    initial_rt = [t.get_and_append_challenge(b"product_sum")]

    def eval_pair(pair: List[Gl2], point: List[Gl2]) -> Gl2:
        # 1-var MLE [v0, v1] at point[0]
        return gl2.add(pair[0], gl2.mul(point[0], gl2.sub(pair[1], pair[0])))

    prod_pne = [
        (initial_rt, eval_pair(e, initial_rt)) for e in prod_out_evals
    ]
    logup_p_pne = [
        (initial_rt, eval_pair(e[0:2], initial_rt)) for e in logup_out_evals
    ]
    logup_q_pne = [
        (initial_rt, eval_pair(e[2:4], initial_rt)) for e in logup_out_evals
    ]

    claim = gl2.zeros(())
    for (_, e), a in zip(prod_pne, alpha_pows[:np_spec]):
        claim = gl2.add(claim, gl2.mul(e, a))
    for i in range(nl_spec):
        claim = gl2.add(claim, gl2.mul(logup_p_pne[i][1], alpha_pows[np_spec + 2 * i]))
        claim = gl2.add(claim, gl2.mul(logup_q_pne[i][1], alpha_pows[np_spec + 2 * i + 1]))

    ok = jnp.asarray(True)
    max_num_vars = max(num_variables)
    point_and_eval = (initial_rt, claim)

    from ...sumcheck.prover import SumcheckProof

    for rnd in range(max_num_vars - 1):
        out_rt, out_claim = point_and_eval
        subclaim, ts = sumcheck_verify(
            out_claim,
            SumcheckProof([], tower_proofs.proofs[rnd]),
            rnd + 1,
            NUM_FANIN + 1,
            t.ts,
        )
        t.ts = ts
        ok = ok & subclaim.ok
        rt = subclaim.point

        eq_val = mle_mod.eq_eval(out_rt, rt)
        expected = gl2.zeros(())
        for spec in range(np_spec):
            if rnd < num_variables[spec] - 1:
                e = tower_proofs.prod_specs_eval[spec][rnd]
                prod = gl2.mul(e[0], e[1])
                expected = gl2.add(expected, gl2.mul(gl2.mul(eq_val, alpha_pows[spec]), prod))
        for spec in range(nl_spec):
            if rnd < num_variables[np_spec + spec] - 1:
                e = tower_proofs.logup_specs_eval[spec][rnd]
                p1, p2, q1, q2 = e
                a_num = alpha_pows[np_spec + 2 * spec]
                a_den = alpha_pows[np_spec + 2 * spec + 1]
                v = gl2.add(
                    gl2.mul(a_num, gl2.add(gl2.mul(p1, q2), gl2.mul(p2, q1))),
                    gl2.mul(a_den, gl2.mul(q1, q2)),
                )
                expected = gl2.add(expected, gl2.mul(eq_val, v))
        ok = ok & jnp.all(gl2.eq(expected, subclaim.expected_evaluation))

        r_merge = [t.get_and_append_challenge(b"merge")]
        coeffs = mle_mod.eq_table(r_merge)  # (2,)
        rt_prime = list(rt) + r_merge

        alpha_pows = get_challenge_pows(np_spec + nl_spec * 2, t)
        next_round = rnd + 1
        next_eval = gl2.zeros(())
        for spec in range(np_spec):
            if rnd < num_variables[spec] - 1:
                e = tower_proofs.prod_specs_eval[spec][rnd]
                merged = gl2.add(gl2.mul(e[0], coeffs[0]), gl2.mul(e[1], coeffs[1]))
                prod_pne[spec] = (rt_prime, merged)
                if next_round < num_variables[spec] - 1:
                    next_eval = gl2.add(next_eval, gl2.mul(alpha_pows[spec], merged))
        for spec in range(nl_spec):
            if rnd < num_variables[np_spec + spec] - 1:
                e = tower_proofs.logup_specs_eval[spec][rnd]
                p_m = gl2.add(gl2.mul(e[0], coeffs[0]), gl2.mul(e[1], coeffs[1]))
                q_m = gl2.add(gl2.mul(e[2], coeffs[0]), gl2.mul(e[3], coeffs[1]))
                logup_p_pne[spec] = (rt_prime, p_m)
                logup_q_pne[spec] = (rt_prime, q_m)
                if next_round < num_variables[np_spec + spec] - 1:
                    a_num = alpha_pows[np_spec + 2 * spec]
                    a_den = alpha_pows[np_spec + 2 * spec + 1]
                    next_eval = gl2.add(
                        next_eval,
                        gl2.add(gl2.mul(a_num, p_m), gl2.mul(a_den, q_m)),
                    )
        point_and_eval = (rt_prime, next_eval)

    return TowerVerifyOut(point_and_eval[0], prod_pne, logup_p_pne, logup_q_pne, ok)
