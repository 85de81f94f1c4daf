"""Opcode-circuit prover.

Mirrors /root/reference/ceno_zkvm/src/scheme/prover.rs:244-682
(`create_opcode_proof`):
1. infer r/w/lk record MLEs from the constraint system's RLC expressions
   (one fused vectorized evaluation per circuit);
2. interleave per-instance records into the fanin-2 tower last layers
   (pad reads/writes with 1, lookups with the chip alpha challenge);
3. infer tower witnesses and run the batched tower GKR;
4. the "main_sel" batched sumcheck ties the tower input claims to the
   record expressions and checks degree>1 zero assertions, with the
   selector spliced to zero beyond num_instances;
5. evaluate all witness columns at the final point and open via the PCS.

Compilation model: Python orchestration + structure-keyed jitted kernels
(records inference per circuit, tower-witness inference per shape, main-sel
coefficient prep per shape) — see tower.py's module docstring for why.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

from ...field import fops, gl, gl2
from ...field.gl import Gl
from ...field.gl2 import Gl2
from ...mle import mle as mle_mod
from ...pcs import Basefold, BasefoldCommitment, BasefoldCommitmentWithWitness, BasefoldProof
from ...sumcheck import VirtualPoly
from ...sumcheck import prove as sumcheck_prove
from ...transcript import basic as tr
from ...utils import cached_jit
from ..circuit_builder import ConstraintSystem
from ..expression import eval_scalar_factors, infer_mle, to_monomials
from .tower import TowerProofs, prove_tower
from .utils import (
    ceil_log2,
    get_challenge_pows,
    infer_tower_logup_witness,
    infer_tower_product_witness,
    interleave_records,
    next_pow2_instance_padding,
    splice_selector,
)

MAINCONSTRAIN_SUMCHECK_BATCH_SIZE = 3  # read/write/lookup


class OpcodeProof(NamedTuple):
    num_instances: int
    record_r_out_evals: List[Gl2]
    record_w_out_evals: List[Gl2]
    lk_out_evals: List[Gl2]  # [p1, p2, q1, q2]
    tower_proof: TowerProofs
    main_sel_sumcheck_proofs: List[Gl2]
    r_records_in_evals: List[Gl2]
    w_records_in_evals: List[Gl2]
    lk_records_in_evals: List[Gl2]
    wits_commit: BasefoldCommitment
    wits_opening_proof: BasefoldProof
    wits_in_evals: List[Gl2]


def evaluate_columns(columns: Sequence, point: List[Gl2]) -> List[Gl2]:
    """Evaluate many equal-length MLE columns at one point (one jitted
    kernel per (m, N, type): stack + fold the shared hypercube axis)."""
    m = len(columns)
    n = columns[0].lo.shape[-1] if isinstance(columns[0], Gl) else columns[0].c0.lo.shape[-1]
    is_ext = isinstance(columns[0], Gl2)

    def builder():
        def run(cols, pt):
            stacked = fops.stack(list(cols), axis=0)  # (m, N)
            for r in pt:
                # strided slices, NOT fops.deinterleave: the (m, N/2, 2)
                # reshape materializes TILED on TPU — the trailing 2-axis
                # pads to 128 lanes, a 64x allocation blowup (observed as a
                # 23.6 GB OOM at m=22, N=2^21).  This chain runs once per
                # opcode proof; stride cost is acceptable.
                lo = stacked[..., 0::2]
                hi = stacked[..., 1::2]
                stacked = fops.add(fops.mul(fops.sub(hi, lo), r), fops.to_ext(lo))
            return [stacked[i, 0] for i in range(m)]

        return run

    return list(cached_jit(("eval_cols", m, n, is_ext), builder)(list(columns), point))


def create_opcode_proof(
    name: str,
    pcs: Basefold,
    cs: ConstraintSystem,
    witnesses: List[Gl],
    wits_cww: BasefoldCommitmentWithWitness,
    pi: Sequence[Gl2],
    num_instances: int,
    t: tr.Transcript,
    challenges: List[Gl2],
    num_shards: int = 1,
) -> OpcodeProof:
    next_pow2 = next_pow2_instance_padding(num_instances)
    log2_n = ceil_log2(next_pow2)
    chip_record_alpha = challenges[0]

    assert len(witnesses) == cs.num_witin

    r_cnt = len(cs.r_expressions)
    w_cnt = len(cs.w_expressions)
    lk_cnt = len(cs.lk_expressions)
    assert r_cnt > 0 and w_cnt > 0 and lk_cnt > 0
    log2_r = ceil_log2(r_cnt)
    log2_w = ceil_log2(w_cnt)
    log2_lk = ceil_log2(lk_cnt)

    # ---- records + tower witness (one kernel per circuit shape) -----------
    def towers_builder():
        def run(wits, pi_, chals):
            records = [
                infer_mle(e, wits, chals, instance=pi_, n=next_pow2)
                for e in cs.r_expressions + cs.w_expressions + cs.lk_expressions
            ]
            r_records = records[:r_cnt]
            w_records = records[r_cnt : r_cnt + w_cnt]
            lk_records = records[r_cnt + w_cnt :]
            one = gl2.const(1)
            r_last = interleave_records(r_records, num_instances, 2, one)
            w_last = interleave_records(w_records, num_instances, 2, one)
            lk_last = interleave_records(lk_records, num_instances, 2, chals[0])
            r_layers = infer_tower_product_witness(log2_n + log2_r, r_last)
            w_layers = infer_tower_product_witness(log2_n + log2_w, w_last)
            lk_layers = infer_tower_logup_witness(lk_last)
            return r_records, w_records, lk_records, r_layers, w_layers, lk_layers

        return run

    r_records, w_records, lk_records, r_layers, w_layers, lk_layers = cached_jit(
        ("opcode_towers", cs.fingerprint(), num_instances), towers_builder
    )(witnesses, list(pi), challenges)

    record_r_out = [r_layers[0][0][0], r_layers[0][1][0]]
    record_w_out = [w_layers[0][0][0], w_layers[0][1][0]]
    lk0 = lk_layers[0]
    lk_out = [lk0[0][0], lk0[1][0], lk0[2][0], lk0[3][0]]

    rt_tower, tower_proof = prove_tower(
        [r_layers, w_layers], [lk_layers], t, num_shards=num_shards
    )
    assert len(rt_tower) == log2_n + max(log2_r, log2_w, log2_lk)

    # ---- main_sel sumcheck -------------------------------------------------
    rt_r = tower_proof.prod_specs_points[0][-1]
    rt_w = tower_proof.prod_specs_points[1][-1]
    rt_lk = tower_proof.logup_specs_points[0][-1]
    rt_zc = rt_tower[:log2_n]

    num_zc = len(cs.assert_zero_sumcheck_expressions)
    alpha_pow = get_challenge_pows(MAINCONSTRAIN_SUMCHECK_BATCH_SIZE + num_zc, t)

    # monomial structure of the zerocheck expressions (static per circuit)
    zc_monomials = [
        to_monomials(e) for e in cs.assert_zero_sumcheck_expressions
    ]

    def coeffs_builder():
        def run(rt_r_, rt_w_, rt_lk_, rt_zc_, alphas, chals, pi_):
            alpha_read, alpha_write, alpha_lk = alphas[0], alphas[1], alphas[2]
            sel_r = splice_selector(mle_mod.eq_table(rt_r_[log2_r:]), num_instances)
            sel_w = splice_selector(mle_mod.eq_table(rt_w_[log2_w:]), num_instances)
            sel_lk = splice_selector(mle_mod.eq_table(rt_lk_[log2_lk:]), num_instances)
            eq_r = mle_mod.eq_table(rt_r_[:log2_r])
            eq_w = mle_mod.eq_table(rt_w_[:log2_w])
            eq_lk = mle_mod.eq_table(rt_lk_[:log2_lk])
            r_coeffs = [gl2.mul(eq_r[i], alpha_read) for i in range(r_cnt)]
            r_pad = gl2.sub(gl2.mul(alpha_read, _tail_sum(eq_r, r_cnt)), alpha_read)
            w_coeffs = [gl2.mul(eq_w[i], alpha_write) for i in range(w_cnt)]
            w_pad = gl2.sub(gl2.mul(alpha_write, _tail_sum(eq_w, w_cnt)), alpha_write)
            lk_coeffs = [gl2.mul(eq_lk[i], alpha_lk) for i in range(lk_cnt)]
            lk_pad = gl2.mul(
                gl2.mul(alpha_lk, chals[0]),
                gl2.sub(_tail_sum(eq_lk, lk_cnt), gl2.ones(())),
            )
            sel_zc = None
            zc_coeffs = []
            if num_zc:
                sel_zc = splice_selector(mle_mod.eq_table(rt_zc_), num_instances)
                for monos, alpha in zip(zc_monomials, alphas[3:]):
                    for scalars, _cols in monos:
                        zc_coeffs.append(
                            gl2.mul(alpha, eval_scalar_factors(scalars, chals, pi_))
                        )
            return (sel_r, sel_w, sel_lk, sel_zc, r_coeffs, r_pad, w_coeffs,
                    w_pad, lk_coeffs, lk_pad, zc_coeffs)

        return run

    (sel_r, sel_w, sel_lk, sel_zc, r_coeffs, r_pad, w_coeffs, w_pad,
     lk_coeffs, lk_pad, zc_coeffs) = cached_jit(
        ("opcode_coeffs", cs.fingerprint(), num_instances), coeffs_builder
    )(rt_r, rt_w, rt_lk, rt_zc, alpha_pow, challenges, list(pi))

    vp = VirtualPoly(log2_n)
    for i in range(r_cnt):
        vp.add_mle_list([sel_r, r_records[i]], r_coeffs[i])
    vp.add_mle_list([sel_r], r_pad)
    for i in range(w_cnt):
        vp.add_mle_list([sel_w, w_records[i]], w_coeffs[i])
    vp.add_mle_list([sel_w], w_pad)
    for i in range(lk_cnt):
        vp.add_mle_list([sel_lk, lk_records[i]], lk_coeffs[i])
    vp.add_mle_list([sel_lk], lk_pad)
    if num_zc:
        ci = 0
        for monos in zc_monomials:
            for _scalars, cols in monos:
                vp.add_mle_list(
                    [sel_zc] + [witnesses[c.id] for c in cols], zc_coeffs[ci]
                )
                ci += 1

    main_proof, main_evals, ts = sumcheck_prove(vp, t.ts, num_shards=num_shards)
    t.ts = ts

    it = iter(main_evals)
    next(it)  # sel_r
    r_in = [next(it) for _ in range(r_cnt)]
    next(it)  # sel_w
    w_in = [next(it) for _ in range(w_cnt)]
    next(it)  # sel_lk
    lk_in = [next(it) for _ in range(lk_cnt)]
    # rest: zerocheck sel + distinct monomial columns (not needed: the
    # verifier re-evaluates the zero expressions from wits_in_evals)

    input_open_point = list(main_proof.point)
    assert len(input_open_point) == log2_n

    # ---- witness opening ---------------------------------------------------
    wits_in_evals = evaluate_columns(witnesses, input_open_point)
    wits_opening = pcs.simple_batch_open(
        wits_cww, input_open_point, wits_in_evals, t
    )

    return OpcodeProof(
        num_instances,
        record_r_out,
        record_w_out,
        lk_out,
        tower_proof,
        main_proof.round_evals,
        r_in,
        w_in,
        lk_in,
        wits_cww.to_commitment(),
        wits_opening,
        wits_in_evals,
    )


def _tail_sum(eq_vec: Gl2, start: int) -> Gl2:
    """sum of eq_vec[start:] as a scalar (zero if none)."""
    n = eq_vec.c0.lo.shape[0]
    if start >= n:
        return gl2.zeros(())
    return fops.sum_reduce(eq_vec[start:])
