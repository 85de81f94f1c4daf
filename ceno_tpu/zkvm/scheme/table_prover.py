"""Table-circuit prover.

Mirrors /root/reference/ceno_zkvm/src/scheme/prover.rs:689-1155
(`create_table_proof`): each r/w table set is its own product-tower spec
(pattern [r1, w1, r2, w2, ...]); each LogUp table is a logup spec with the
multiplicity column as numerator and the RLC'd table values as denominator.
Last layers are plain contiguous halves (tables are full multisets — no
instance interleaving).  Structural-witness sizes (rw_hints_num_vars) are
absorbed before the tower.  The same-point sumcheck is skipped — the
reference verifier hardcodes `is_skip_same_point_sumcheck = true`
(verifier.rs:519), so all table sets in one circuit must share num_vars.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Sequence

from ...field import fops, gl, gl2
from ...field.gl import Gl
from ...field.gl2 import Gl2
from ...pcs import Basefold, BasefoldCommitment, BasefoldCommitmentWithWitness, BasefoldProof
from ...transcript import basic as tr
from ..circuit_builder import ConstraintSystem
from ..expression import infer_mle
from .prover import evaluate_columns
from .tower import TowerProofs, prove_tower
from .utils import (
    ceil_log2,
    infer_tower_logup_witness,
    infer_tower_product_witness,
)


class TableProof(NamedTuple):
    r_out_evals: List[List[Gl2]]  # per r table: [e0, e1]
    w_out_evals: List[List[Gl2]]
    lk_out_evals: List[List[Gl2]]  # per lk table: [p1, p2, q1, q2]
    tower_proof: TowerProofs
    rw_hints_num_vars: List[int]
    fixed_in_evals: List[Gl2]
    fixed_opening_proof: Optional[BasefoldProof]
    wits_in_evals: List[Gl2]
    wits_commit: BasefoldCommitment
    wits_opening_proof: BasefoldProof


def _split_half(v: Gl2) -> List[Gl2]:
    n = v.c0.lo.shape[0]
    return [v[: n // 2], v[n // 2 :]]


def create_table_proof(
    name: str,
    pcs: Basefold,
    cs: ConstraintSystem,
    fixed: List[Gl],
    fixed_cww: Optional[BasefoldCommitmentWithWitness],
    witnesses: List[Gl],
    wits_cww: BasefoldCommitmentWithWitness,
    structural: List[Gl],
    pi: Sequence[Gl2],
    raw_pi_mles: Sequence,
    t: tr.Transcript,
    challenges: List[Gl2],
    num_shards: int = 1,
):
    """Returns (TableProof, pi_in_evals dict)."""
    from ...utils import cached_jit

    assert len(witnesses) == cs.num_witin
    assert len(structural) == cs.num_structural_witin
    assert len(fixed) == cs.num_fixed
    assert cs.r_table_expressions or cs.w_table_expressions or cs.lk_table_expressions

    rw_hints_num_vars = [
        ceil_log2(s.lo.shape[0]) for s in structural
    ]
    for var in rw_hints_num_vars:
        t.append_field_element_u64(var)

    (
        r_out_evals,
        w_out_evals,
        lk_out_evals,
        tower_proof,
        input_open_point,
        wits_in_evals,
        fixed_in_evals,
    ) = _table_core(
        cs, fixed, witnesses, structural, list(pi), t, challenges, num_shards,
        tuple(rw_hints_num_vars),
    )
    input_open_point = list(input_open_point)

    # evaluate public-input polys at the point (tiny, direct)
    pi_in_evals: Dict[int, Gl2] = {}
    for idx in cs.instance_ids:
        poly = raw_pi_mles[idx]
        nv = ceil_log2(poly.lo.shape[0]) if poly.lo.shape[0] > 1 else 0
        pi_in_evals[idx] = evaluate_columns([fops.to_ext(poly)], input_open_point[:nv])[0]

    fixed_opening = None
    if fixed:
        fixed_opening = pcs.simple_batch_open(
            fixed_cww, input_open_point, list(fixed_in_evals), t
        )
    wits_opening = pcs.simple_batch_open(
        wits_cww, input_open_point, list(wits_in_evals), t
    )

    return (
        TableProof(
            [list(e) for e in r_out_evals],
            [list(e) for e in w_out_evals],
            [list(e) for e in lk_out_evals],
            tower_proof,
            rw_hints_num_vars,
            list(fixed_in_evals),
            fixed_opening,
            list(wits_in_evals),
            wits_cww.to_commitment(),
            wits_opening,
        ),
        pi_in_evals,
    )


def _table_core(
    cs: ConstraintSystem,
    fixed: List[Gl],
    witnesses: List[Gl],
    structural: List[Gl],
    pi: Sequence[Gl2],
    t: tr.Transcript,
    challenges: List[Gl2],
    num_shards: int,
    shape_key: tuple,
):
    from ...utils import cached_jit

    n_wit = witnesses[0].lo.shape[0] if witnesses else fixed[0].lo.shape[0]

    def towers_builder():
        def run(fixed_, wits_, structural_, pi_, chals):
            def infer(e):
                return infer_mle(
                    e, wits_, chals, fixed=fixed_, structural=structural_,
                    instance=pi_, n=n_wit,
                )

            r_set = [infer(x.expr) for x in cs.r_table_expressions]
            w_set = [infer(x.expr) for x in cs.w_table_expressions]
            lk_n = [infer(x.multiplicity) for x in cs.lk_table_expressions]
            lk_d = [infer(x.values) for x in cs.lk_table_expressions]

            def nv(v):
                return ceil_log2(
                    v.lo.shape[-1] if isinstance(v, Gl) else v.c0.lo.shape[-1]
                )

            r_layers = [
                infer_tower_product_witness(nv(wit), _split_half(fops.to_ext(wit)))
                for wit in r_set
            ]
            w_layers = [
                infer_tower_product_witness(nv(wit), _split_half(fops.to_ext(wit)))
                for wit in w_set
            ]
            lk_layers = [
                infer_tower_logup_witness(
                    _split_half(fops.to_ext(d)), _split_half(fops.to_ext(n))
                )
                for n, d in zip(lk_n, lk_d)
            ]
            return r_layers, w_layers, lk_layers

        return run

    r_layers, w_layers, lk_layers = cached_jit(
        ("table_towers", cs.fingerprint(), shape_key), towers_builder
    )(fixed, witnesses, structural, pi, challenges)
    # num_vars per set = tower depth (static shapes)
    all_nv = [len(ls) for ls in r_layers] + [len(ls) for ls in w_layers] + [
        len(ls) for ls in lk_layers
    ]
    max_nv = max(all_nv)

    r_out = [[ls[0][0][0], ls[0][1][0]] for ls in r_layers]
    w_out = [[ls[0][0][0], ls[0][1][0]] for ls in w_layers]
    lk_out = [
        [ls[0][0][0], ls[0][1][0], ls[0][2][0], ls[0][3][0]] for ls in lk_layers
    ]

    # pattern [r1, w1, r2, w2, ...]
    prod_specs = []
    for r, w in zip(r_layers, w_layers):
        prod_specs.extend([r, w])
    rt_tower, tower_proof = prove_tower(
        prod_specs, lk_layers, t, num_shards=num_shards
    )
    assert len(rt_tower) == max_nv

    # same-point sumcheck skipped (verifier.rs:519 hardcodes skip): all sets
    # must share num_vars
    assert all(v == max_nv for v in all_nv), (
        "heterogeneous table sets in one circuit need the same-r sumcheck, "
        "which the reference verifier does not support"
    )
    input_open_point = rt_tower

    wits_in_evals = (
        evaluate_columns(witnesses, input_open_point[: ceil_log2(n_wit)])
        if witnesses
        else []
    )
    fixed_in_evals = (
        evaluate_columns(fixed, input_open_point[: ceil_log2(fixed[0].lo.shape[0])])
        if fixed
        else []
    )

    return (
        r_out,
        w_out,
        lk_out,
        tower_proof,
        input_open_point,
        wits_in_evals,
        fixed_in_evals,
    )
