"""Table-circuit verifier.

Mirrors /root/reference/ceno_zkvm/src/scheme/verifier.rs:497-815
(`verify_table_proof`) with the reference's hardcoded skip-same-point path:
tower verification -> per-set claims -> record expressions re-evaluated at
the opened point (structural witnesses evaluated succinctly via the
well-formed address formula, utils.rs:158-169) -> public-input evals ->
fixed + witness PCS openings.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax.numpy as jnp

from ...field import fops, gl2
from ...field.gl2 import Gl2
from ...pcs import Basefold, BasefoldCommitment
from ...transcript import basic as tr
from ..circuit_builder import ConstraintSystem
from ..expression import eval_scalar
from .prover import evaluate_columns
from .table_prover import TableProof
from .tower import verify_tower
from .utils import ceil_log2


class TableVerifyOut(NamedTuple):
    input_opening_point: List[Gl2]
    ok: jnp.ndarray


def eval_wellform_address_vec(offset: int, scaled: int, r: List[Gl2]) -> Gl2:
    """offset + scaled * sum_i 2^i * r_i (utils.rs:158-169)."""
    acc = gl2.zeros(())
    pow2 = 1
    for x in r:
        acc = gl2.add(acc, gl2.mul(x, gl2.const(pow2)))
        pow2 *= 2
    return gl2.add(gl2.const(offset), gl2.mul(acc, gl2.const(scaled)))


def verify_table_proof(
    name: str,
    pcs: Basefold,
    cs: ConstraintSystem,
    fixed_commit: Optional[BasefoldCommitment],
    proof: TableProof,
    raw_pi_mles: Sequence,
    pi: Sequence[Gl2],
    t: tr.Transcript,
    challenges: List[Gl2],
) -> TableVerifyOut:
    from ...utils import cached_jit

    for var in proof.rw_hints_num_vars:
        t.append_field_element_u64(var)

    point, ok = _table_verify_core(cs, proof, list(pi), t, challenges)
    point = list(point)

    # public-input polys evaluated directly (tiny)
    for idx in cs.instance_ids:
        poly = raw_pi_mles[idx]
        nv = ceil_log2(poly.lo.shape[0]) if poly.lo.shape[0] > 1 else 0
        want = evaluate_columns([fops.to_ext(poly)], point[:nv])[0]
        ok = ok & jnp.all(gl2.eq(want, pi[idx]))

    if fixed_commit is not None:
        ok = ok & pcs.simple_batch_verify(
            fixed_commit, point, proof.fixed_in_evals,
            proof.fixed_opening_proof, t,
        )
    ok = ok & pcs.simple_batch_verify(
        proof.wits_commit, point, proof.wits_in_evals,
        proof.wits_opening_proof, t,
    )
    return TableVerifyOut(point, ok)


def _table_verify_core(
    cs: ConstraintSystem,
    proof: TableProof,
    pi: Sequence[Gl2],
    t: tr.Transcript,
    challenges: List[Gl2],
):
    # expected tower rounds per spec (verifier.rs:524-549)
    expected_rounds = []
    for r in cs.r_table_expressions:
        if r.table_spec.len is not None:
            nv = ceil_log2(r.table_spec.len)
        else:
            nv = max(
                proof.rw_hints_num_vars[sw.id]
                for sw in r.table_spec.structural_witins
            )
        expected_rounds.extend([nv, nv])
    lk_rounds = [ceil_log2(l.table_len) for l in cs.lk_table_expressions]

    prod_out = []
    for r_e, w_e in zip(proof.r_out_evals, proof.w_out_evals):
        prod_out.extend([list(r_e), list(w_e)])

    tv = verify_tower(
        prod_out,
        [list(e) for e in proof.lk_out_evals],
        proof.tower_proof,
        expected_rounds + lk_rounds,
        t,
    )
    ok = tv.ok

    point = tv.rt_tower
    in_evals = [pe[1] for pe in tv.prod_point_and_eval]
    for p_pe, q_pe in zip(tv.logup_p_point_and_eval, tv.logup_q_point_and_eval):
        in_evals.extend([p_pe[1], q_pe[1]])

    # record-expression checks in one jitted kernel per circuit shape
    from ...utils import cached_jit

    hints = tuple(proof.rw_hints_num_vars)

    def checks_builder():
        def run(pt, in_evals_, wits_in, fixed_in, pi_, chals):
            # structural witness evals (succinct)
            structural_evals = {}
            for r in cs.r_table_expressions + cs.w_table_expressions:
                for sw in r.table_spec.structural_witins:
                    nv = hints[sw.id]
                    structural_evals[sw.id] = eval_wellform_address_vec(
                        sw.offset, sw.multi_factor, pt[:nv]
                    )
            structural_list = [
                structural_evals.get(i, gl2.zeros(()))
                for i in range(cs.num_structural_witin)
            ]
            exprs = []
            for r_e, w_e in zip(cs.r_table_expressions, cs.w_table_expressions):
                exprs.extend([r_e.expr, w_e.expr])
            for lk in cs.lk_table_expressions:
                exprs.extend([lk.multiplicity, lk.values])
            assert len(exprs) == len(in_evals_)
            ok1 = jnp.asarray(True)
            for expr, want in zip(exprs, in_evals_):
                got = eval_scalar(
                    expr,
                    wits_in,
                    chals,
                    fixed_evals=fixed_in,
                    structural_evals=structural_list,
                    instance=pi_,
                )
                ok1 = ok1 & jnp.all(gl2.eq(got, want))
            return ok1

        return run

    ok = ok & cached_jit(("table_checks", cs.fingerprint(), hints), checks_builder)(
        point, in_evals, proof.wits_in_evals, proof.fixed_in_evals, pi, challenges
    )

    return point, ok
