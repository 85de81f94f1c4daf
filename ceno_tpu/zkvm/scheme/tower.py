"""Tower prover/verifier: layer-by-layer batched GKR over fanin-2 product and
LogUp fractional-sum trees.

Protocol structure follows the reference one-to-one (bit-level transcript
identity is out of scope — see PROTOCOL.md):
* prover /root/reference/ceno_zkvm/src/scheme/prover.rs:1194-1342 — per round
  one batched sumcheck over all live specs (eq * f1 * f2 for products;
  eq*p1*q2 + eq*p2*q1 and eq*q1*q2 for logup), alpha batch challenge
  (b"combine subset evals") refreshed every round, initial point
  b"product_sum", per-round merge challenge b"merge", rt' = point || r_merge;
* verifier /root/reference/ceno_zkvm/src/scheme/verifier.rs:816-1037.

Compilation model (the TPU tunnel dispatches one eager op in ~20ms but a
cached jitted kernel in ~1ms, and tracing costs ~1.6ms/equation on this
host): the orchestration stays in Python, and every piece of field math runs
in small structure-keyed jitted kernels that are REUSED across rounds,
towers, and circuits — per-round sumcheck kernels (shared via
ceno_tpu.sumcheck's cache), eq-table builders, challenge-power samplers, and
one round-algebra kernel per live-spec configuration.
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
from ...utils import cached_jit
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


def eq_table_jit(point: List[Gl2]) -> Gl2:
    n = len(point)
    return cached_jit(("eq_table", n), lambda: lambda p: mle_mod.eq_table(p))(point)


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
        eq = eq_table_jit(out_rt)
        vp = VirtualPoly(num_vars)
        for s, alpha in zip(prod_specs, alpha_pows[:np_spec]):
            if rnd < len(s):
                f1, f2 = s[rnd]
                vp.add_mle_list([eq, f1, f2], alpha)
        for i, s in enumerate(logup_specs):
            if rnd < len(s):
                a_num = alpha_pows[np_spec + 2 * i]
                a_den = alpha_pows[np_spec + 2 * i + 1]
                p1, p2, q1, q2 = s[rnd]
                vp.add_mle_list([eq, p1, q2], a_num)
                vp.add_mle_list([eq, p2, q1], a_num)
                vp.add_mle_list([eq, q1, q2], a_den)

        T = num_shards if (1 << num_vars) >= 2 * num_shards else 1
        proof, final_evals, ts = sumcheck_prove(vp, t.ts, num_shards=T)
        t.ts = ts
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


# ---------------------------------------------------------------------------
# Verifier
# ---------------------------------------------------------------------------


def _initial_claim_kernel(np_spec: int, nl_spec: int):
    """(prod_out, logup_out, alphas, rt0) -> (claim, per-spec evals at rt0)."""

    def run(prod_out, logup_out, alphas, rt0):
        def eval_pair(a, b):
            return gl2.add(a, gl2.mul(rt0, gl2.sub(b, a)))

        prod_evals = [eval_pair(e[0], e[1]) for e in prod_out]
        p_evals = [eval_pair(e[0], e[1]) for e in logup_out]
        q_evals = [eval_pair(e[2], e[3]) for e in logup_out]
        claim = gl2.zeros(())
        for e, a in zip(prod_evals, alphas[:np_spec]):
            claim = gl2.add(claim, gl2.mul(e, a))
        for i in range(nl_spec):
            claim = gl2.add(claim, gl2.mul(p_evals[i], alphas[np_spec + 2 * i]))
            claim = gl2.add(claim, gl2.mul(q_evals[i], alphas[np_spec + 2 * i + 1]))
        return claim, prod_evals, p_evals, q_evals

    return run


def _round_algebra_kernel(prod_live: tuple, logup_live: tuple, prod_next: tuple,
                          logup_next: tuple, np_spec: int, nl_spec: int):
    """Post-sumcheck round algebra (verifier.rs:916-1030), one kernel per
    live-spec configuration:
    inputs: out_rt, rt, live prod/logup round evals, alphas, expected from
    subclaim, r_merge, next alphas -> (ok_bit, merged evals, next_claim)."""

    def run(out_rt, rt, prod_evals_rnd, logup_evals_rnd, alphas,
            subclaim_expected, r_merge, next_alphas):
        eq_val = mle_mod.eq_eval(out_rt, rt)
        expected = gl2.zeros(())
        li = 0
        for spec in range(np_spec):
            if prod_live[spec]:
                e = prod_evals_rnd[li]
                li += 1
                prod = gl2.mul(e[0], e[1])
                expected = gl2.add(expected, gl2.mul(gl2.mul(eq_val, alphas[spec]), prod))
        li = 0
        for spec in range(nl_spec):
            if logup_live[spec]:
                p1, p2, q1, q2 = logup_evals_rnd[li]
                li += 1
                a_num = alphas[np_spec + 2 * spec]
                a_den = alphas[np_spec + 2 * spec + 1]
                v = gl2.add(
                    gl2.mul(a_num, gl2.add(gl2.mul(p1, q2), gl2.mul(p2, q1))),
                    gl2.mul(a_den, gl2.mul(q1, q2)),
                )
                expected = gl2.add(expected, gl2.mul(eq_val, v))
        ok = jnp.all(gl2.eq(expected, subclaim_expected))

        # merge coeffs = eq table over r_merge (2 entries for fanin 2)
        coeffs = mle_mod.eq_table(r_merge)
        merged_prod, merged_logup = [], []
        next_claim = gl2.zeros(())
        li = 0
        for spec in range(np_spec):
            if prod_live[spec]:
                e = prod_evals_rnd[li]
                li += 1
                m = gl2.add(gl2.mul(e[0], coeffs[0]), gl2.mul(e[1], coeffs[1]))
                merged_prod.append(m)
                if prod_next[spec]:
                    next_claim = gl2.add(next_claim, gl2.mul(next_alphas[spec], m))
        li = 0
        for spec in range(nl_spec):
            if logup_live[spec]:
                e = logup_evals_rnd[li]
                li += 1
                p_m = gl2.add(gl2.mul(e[0], coeffs[0]), gl2.mul(e[1], coeffs[1]))
                q_m = gl2.add(gl2.mul(e[2], coeffs[0]), gl2.mul(e[3], coeffs[1]))
                merged_logup.append((p_m, q_m))
                if logup_next[spec]:
                    a_num = next_alphas[np_spec + 2 * spec]
                    a_den = next_alphas[np_spec + 2 * spec + 1]
                    next_claim = gl2.add(
                        next_claim,
                        gl2.add(gl2.mul(a_num, p_m), gl2.mul(a_den, q_m)),
                    )
        return ok, merged_prod, merged_logup, next_claim

    return run


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

    claim, prod_evals0, p_evals0, q_evals0 = cached_jit(
        ("tower_init", np_spec, nl_spec),
        lambda: _initial_claim_kernel(np_spec, nl_spec),
    )(prod_out_evals, logup_out_evals, alpha_pows, initial_rt[0])

    prod_pne = [(initial_rt, e) for e in prod_evals0]
    logup_p_pne = [(initial_rt, e) for e in p_evals0]
    logup_q_pne = [(initial_rt, e) for e in q_evals0]

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

        r_merge = [t.get_and_append_challenge(b"merge")]
        rt_prime = list(rt) + r_merge
        next_alphas = get_challenge_pows(np_spec + nl_spec * 2, t)

        prod_live = tuple(rnd < num_variables[s] - 1 for s in range(np_spec))
        logup_live = tuple(
            rnd < num_variables[np_spec + s] - 1 for s in range(nl_spec)
        )
        prod_next = tuple(rnd + 1 < num_variables[s] - 1 for s in range(np_spec))
        logup_next = tuple(
            rnd + 1 < num_variables[np_spec + s] - 1 for s in range(nl_spec)
        )

        prod_rnd, logup_rnd = [], []
        for spec in range(np_spec):
            if prod_live[spec]:
                prod_rnd.append(tower_proofs.prod_specs_eval[spec][rnd])
        for spec in range(nl_spec):
            if logup_live[spec]:
                logup_rnd.append(tower_proofs.logup_specs_eval[spec][rnd])

        key = ("tower_round", rnd, prod_live, logup_live, prod_next, logup_next)
        ok_rnd, merged_prod, merged_logup, next_claim = cached_jit(
            key,
            lambda: _round_algebra_kernel(
                prod_live, logup_live, prod_next, logup_next, np_spec, nl_spec
            ),
        )(out_rt, rt, prod_rnd, logup_rnd, alpha_pows,
          subclaim.expected_evaluation, r_merge, next_alphas)
        ok = ok & ok_rnd

        li = 0
        for spec in range(np_spec):
            if prod_live[spec]:
                prod_pne[spec] = (rt_prime, merged_prod[li])
                li += 1
        li = 0
        for spec in range(nl_spec):
            if logup_live[spec]:
                logup_p_pne[spec] = (rt_prime, merged_logup[li][0])
                logup_q_pne[spec] = (rt_prime, merged_logup[li][1])
                li += 1

        alpha_pows = next_alphas
        point_and_eval = (rt_prime, next_claim)

    return TowerVerifyOut(point_and_eval[0], prod_pne, logup_p_pne, logup_q_pne, ok)
