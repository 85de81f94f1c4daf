"""Opcode-circuit verifier.

Mirrors /root/reference/ceno_zkvm/src/scheme/verifier.rs:251-500
(`verify_opcode_proof`): tower verification, main-sel sumcheck replay with
closed-form selector evaluations, record/zero expression re-evaluation at the
opened point, then PCS batch verification.  All checks accumulate into one
on-device ok flag; the per-circuit algebra runs in one structure-keyed
jitted kernel.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax.numpy as jnp

from ...field import fops, gl2
from ...field.gl2 import Gl2
from ...mle import mle as mle_mod
from ...pcs import Basefold
from ...sumcheck import verify as sumcheck_verify
from ...sumcheck.prover import SumcheckProof
from ...transcript import basic as tr
from ...utils import cached_jit
from ..circuit_builder import ConstraintSystem
from ..expression import eval_scalar
from .prover import MAINCONSTRAIN_SUMCHECK_BATCH_SIZE, OpcodeProof, _tail_sum
from .tower import verify_tower
from .utils import (
    ceil_log2,
    eq_eval_less_or_equal_than,
    get_challenge_pows,
    next_pow2_instance_padding,
)

SEL_DEGREE = 2


class OpcodeVerifyOut(NamedTuple):
    input_opening_point: List[Gl2]
    ok: jnp.ndarray


def verify_opcode_proof(
    name: str,
    pcs: Basefold,
    cs: ConstraintSystem,
    proof: OpcodeProof,
    pi: Sequence[Gl2],
    t: tr.Transcript,
    challenges: List[Gl2],
) -> OpcodeVerifyOut:
    r_cnt = len(cs.r_expressions)
    w_cnt = len(cs.w_expressions)
    lk_cnt = len(cs.lk_expressions)
    log2_r, log2_w, log2_lk = ceil_log2(r_cnt), ceil_log2(w_cnt), ceil_log2(lk_cnt)

    num_instances = proof.num_instances
    next_pow2 = next_pow2_instance_padding(num_instances)
    log2_n = ceil_log2(next_pow2)

    tv = verify_tower(
        [proof.record_r_out_evals, proof.record_w_out_evals],
        [proof.lk_out_evals],
        proof.tower_proof,
        [log2_n + log2_r, log2_n + log2_w, log2_n + log2_lk],
        t,
    )
    ok = tv.ok

    rt_r, r_eval = tv.prod_point_and_eval[0]
    rt_w, w_eval = tv.prod_point_and_eval[1]
    rt_lk, q_eval = tv.logup_q_point_and_eval[0]
    p_eval = tv.logup_p_point_and_eval[0][1]

    num_zc = len(cs.assert_zero_sumcheck_expressions)
    alpha_pow = get_challenge_pows(MAINCONSTRAIN_SUMCHECK_BATCH_SIZE + num_zc, t)

    def claim_builder():
        def run(r_e, w_e, q_e, p_e, alphas, chals):
            one = gl2.ones(())
            # logup numerator must be the constant-1 vector
            ok0 = jnp.all(gl2.eq(p_e, one))
            claim = gl2.add(
                gl2.add(
                    gl2.mul(alphas[0], gl2.sub(r_e, one)),
                    gl2.mul(alphas[1], gl2.sub(w_e, one)),
                ),
                gl2.mul(alphas[2], gl2.sub(q_e, chals[0])),
            )
            return claim, ok0

        return run

    claim, ok0 = cached_jit(("opcode_claim",), claim_builder)(
        r_eval, w_eval, q_eval, p_eval, alpha_pow, challenges
    )
    ok = ok & ok0

    max_degree = max(SEL_DEGREE, cs.max_non_lc_degree + 1)
    subclaim, ts = sumcheck_verify(
        claim,
        SumcheckProof([], proof.main_sel_sumcheck_proofs),
        log2_n,
        max_degree,
        t.ts,
    )
    t.ts = ts
    ok = ok & subclaim.ok
    point = list(subclaim.point)

    rt_zc = tv.rt_tower[:log2_n]

    def checks_builder():
        def run(proof_evals, rt_r_, rt_w_, rt_lk_, rt_zc_, pt, alphas, chals,
                pi_, expected):
            (r_in, w_in, lk_in, wits_in) = proof_evals
            one = gl2.ones(())
            eq_r = mle_mod.eq_table(rt_r_[:log2_r])
            eq_w = mle_mod.eq_table(rt_w_[:log2_w])
            eq_lk = mle_mod.eq_table(rt_lk_[:log2_lk])
            sel_r = eq_eval_less_or_equal_than(num_instances - 1, pt, rt_r_[log2_r:])
            sel_w = eq_eval_less_or_equal_than(num_instances - 1, pt, rt_w_[log2_w:])
            sel_lk = eq_eval_less_or_equal_than(num_instances - 1, pt, rt_lk_[log2_lk:])

            def dotsum(evals, eq, cnt):
                acc = gl2.zeros(())
                for i in range(cnt):
                    acc = gl2.add(acc, gl2.mul(evals[i], eq[i]))
                return acc

            computed = gl2.mul(
                gl2.mul(alphas[0], sel_r),
                gl2.sub(gl2.add(dotsum(r_in, eq_r, r_cnt), _tail_sum(eq_r, r_cnt)), one),
            )
            computed = gl2.add(
                computed,
                gl2.mul(
                    gl2.mul(alphas[1], sel_w),
                    gl2.sub(
                        gl2.add(dotsum(w_in, eq_w, w_cnt), _tail_sum(eq_w, w_cnt)),
                        one,
                    ),
                ),
            )
            computed = gl2.add(
                computed,
                gl2.mul(
                    gl2.mul(alphas[2], sel_lk),
                    gl2.add(
                        dotsum(lk_in, eq_lk, lk_cnt),
                        gl2.mul(chals[0], gl2.sub(_tail_sum(eq_lk, lk_cnt), one)),
                    ),
                ),
            )
            if num_zc:
                sel_zc = eq_eval_less_or_equal_than(num_instances - 1, pt, rt_zc_)
                acc = gl2.zeros(())
                for expr, alpha in zip(
                    cs.assert_zero_sumcheck_expressions, alphas[3:]
                ):
                    v = eval_scalar(expr, wits_in, chals, instance=pi_)
                    acc = gl2.add(acc, gl2.mul(alpha, v))
                computed = gl2.add(computed, gl2.mul(sel_zc, acc))

            ok1 = jnp.all(gl2.eq(computed, expected))

            # degree-1 record / zero statements at the opened point
            for expr, want in zip(
                cs.r_expressions + cs.w_expressions + cs.lk_expressions,
                r_in[:r_cnt] + w_in[:w_cnt] + lk_in[:lk_cnt],
            ):
                got = eval_scalar(expr, wits_in, chals, instance=pi_)
                ok1 = ok1 & jnp.all(gl2.eq(got, want))
            for expr in cs.assert_zero_expressions:
                got = eval_scalar(expr, wits_in, chals, instance=pi_)
                ok1 = ok1 & jnp.all(gl2.eq(got, gl2.zeros(())))
            return ok1

        return run

    ok1 = cached_jit(("opcode_checks", cs.fingerprint(), num_instances), checks_builder)(
        (proof.r_records_in_evals, proof.w_records_in_evals,
         proof.lk_records_in_evals, proof.wits_in_evals),
        rt_r, rt_w, rt_lk, rt_zc, point, alpha_pow, challenges, list(pi),
        subclaim.expected_evaluation,
    )
    ok = ok & ok1

    ok = ok & pcs.simple_batch_verify(
        proof.wits_commit, point, proof.wits_in_evals, proof.wits_opening_proof, t
    )
    return OpcodeVerifyOut(point, ok)
