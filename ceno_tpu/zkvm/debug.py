"""Whole-VM witness diagnostics: the reference MockProver's
`assert_satisfied_full` (mock_prover.rs:740) — check the cross-circuit
product/LogUp invariants directly over the assigned witness, without proving.

All arithmetic is exact host-side big-int math over GF(p^2) (X^2 = 7), so a
failure localizes a witness/assignment bug (as opposed to a transcript or
PCS bug, which this check cannot see).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import numpy as np

from ..field import gl
from .mock_prover import TEST_CHALLENGES
from .scheme.utils import next_pow2_instance_padding

P = 0xFFFFFFFF00000001
W = 7


def _ext(c0: int, c1: int) -> Tuple[int, int]:
    return (c0 % P, c1 % P)


def emul(a, b):
    return ((a[0] * b[0] + W * a[1] * b[1]) % P, (a[0] * b[1] + a[1] * b[0]) % P)


def eadd(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def esub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def einv(a):
    norm = (a[0] * a[0] - W * a[1] * a[1]) % P
    ninv = pow(norm, P - 2, P)
    return ((a[0] * ninv) % P, (-a[1] * ninv) % P)


ONE = (1, 0)
ZERO = (0, 0)


def _records_host(cs, exprs, witnesses, fixed, structural, pi, n) -> List[List[Tuple[int, int]]]:
    """Evaluate record expressions over the columns; list per expr of n
    ext values (host ints)."""
    from .expression import infer_mle
    from ..field import fops

    chals = list(TEST_CHALLENGES)
    out = []
    for e in exprs:
        v = fops.to_ext(
            infer_mle(e, witnesses, chals, fixed=fixed, structural=structural,
                      instance=pi, n=n)
        )
        c0 = np.asarray(jax.device_get(gl.to_u64(v.c0))).reshape(-1)
        c1 = np.asarray(jax.device_get(gl.to_u64(v.c1))).reshape(-1)
        out.append([(int(a), int(b)) for a, b in zip(c0, c1)])
    return out


def assert_satisfied_full(
    config,
    witnesses: Dict[str, List],
    num_instances: Dict[str, int],
    structural: Dict[str, List],
    pv,
    fixed: Dict[str, List],
) -> None:
    """Check Σ logup == dummy correction and prod_r*final_gs == prod_w*init_gs
    over the full assigned witness (verifier.rs:162-244 semantics, but on
    witness values instead of proof claims)."""
    from .vm import PublicValues  # noqa: F401  (pv type)

    chals = list(TEST_CHALLENGES)
    alpha = (int(jax.device_get(gl.to_u64(chals[0].c0))),
             int(jax.device_get(gl.to_u64(chals[0].c1))))

    pi_scalars = []
    for vec in pv.to_vec():
        pi_scalars.append(gl.from_u64(np.asarray(vec, dtype=np.uint64)))

    prod_r, prod_w = ONE, ONE
    logup = ZERO

    for name, cs in config.zkvm_cs.circuits.items():
        n_inst = num_instances.get(name, 0)
        is_table = bool(cs.r_table_expressions or cs.w_table_expressions
                        or cs.lk_table_expressions)
        if n_inst == 0:
            # unused opcode circuits and untouched dynamic RAM regions are
            # skipped by the prover too (zero rows -> empty multisets)
            continue
        wits = witnesses.get(name, [])
        fx = fixed.get(name, [])
        st = structural.get(name, [])
        n_padded = wits[0].lo.shape[0] if wits else (
            fx[0].lo.shape[0] if fx else 1
        )

        if not is_table:
            # opcode circuit: real instances only; padding contributes 1 / α
            rs = _records_host(cs, cs.r_expressions, wits, fx, st, pi_scalars, n_padded)
            ws = _records_host(cs, cs.w_expressions, wits, fx, st, pi_scalars, n_padded)
            lks = _records_host(cs, cs.lk_expressions, wits, fx, st, pi_scalars, n_padded)
            for rec in rs:
                for i in range(n_inst):
                    prod_r = emul(prod_r, rec[i])
            for rec in ws:
                for i in range(n_inst):
                    prod_w = emul(prod_w, rec[i])
            # real slots only: the tower's α-padded slots and the verifier's
            # dummy_multiplicity correction cancel exactly, so neither appears
            # in the witness-level identity
            for rec in lks:
                for i in range(n_inst):
                    logup = eadd(logup, einv(rec[i]))
        else:
            for x in cs.r_table_expressions:
                length = x.table_spec.len or n_padded
                rec = _records_host(cs, [x.expr], wits, fx, st, pi_scalars, n_padded)[0]
                for i in range(length):
                    prod_r = emul(prod_r, rec[i])
            for x in cs.w_table_expressions:
                length = x.table_spec.len or n_padded
                rec = _records_host(cs, [x.expr], wits, fx, st, pi_scalars, n_padded)[0]
                for i in range(length):
                    prod_w = emul(prod_w, rec[i])
            for x in cs.lk_table_expressions:
                vals = _records_host(cs, [x.values], wits, fx, st, pi_scalars, n_padded)[0]
                mults = _records_host(cs, [x.multiplicity], wits, fx, st, pi_scalars, n_padded)[0]
                for i in range(x.table_len):
                    logup = esub(logup, emul(mults[i], einv(vals[i])))

    from ..field import gl2
    from .expression import eval_scalar

    pi_consts = [gl2.const(int(vec[0])) for vec in pv.to_vec()]
    init_gs_e = eval_scalar(
        config.zkvm_cs.initial_global_state_expr, [], chals, instance=pi_consts
    )
    fin_gs_e = eval_scalar(
        config.zkvm_cs.finalize_global_state_expr, [], chals, instance=pi_consts
    )

    def scal(x):
        return (int(jax.device_get(gl.to_u64(x.c0))), int(jax.device_get(gl.to_u64(x.c1))))

    prod_w = emul(prod_w, scal(init_gs_e))
    prod_r = emul(prod_r, scal(fin_gs_e))

    errors = []
    if logup != ZERO:
        errors.append(f"logup sum != 0: {logup}")
    if prod_r != prod_w:
        errors.append(f"r/w multiset imbalance: prod_r={prod_r} prod_w={prod_w}")
    if errors:
        raise AssertionError("; ".join(errors))


def check_lookup_values(
    config, witnesses, num_instances, structural, fixed,
) -> None:
    """Exact value-level lookup multiset check (mock_prover.rs load_tables
    style): every opcode lk_record tuple must be counted by exactly one
    table row's multiplicity. Reports the first offending tuples."""
    from collections import Counter

    from .expression import infer_mle
    from ..field import fops

    chals = list(TEST_CHALLENGES)
    counts: Counter = Counter()
    # key -> (circuit name, namespaced lk_record name, first instance index)
    # for mock_prover.rs:163-296-quality "value not in table" diagnostics
    first_seen: dict = {}

    def item_values(cs, items, wits, fx, st, n):
        cols = []
        for e in items:
            v = infer_mle(e, wits, chals, fixed=fx, structural=st, instance=[], n=n)
            if hasattr(v, "c0"):
                v = v.c0
            cols.append(np.asarray(jax.device_get(gl.to_u64(v))).reshape(-1))
        return cols

    for name, cs in config.zkvm_cs.circuits.items():
        n_inst = num_instances.get(name, 0)
        wits = witnesses.get(name, [])
        fx = fixed.get(name, [])
        st = structural.get(name, [])
        if getattr(cs, "lk_raw", None) and n_inst:
            n_padded = wits[0].lo.shape[0]
            for li, (rom, items) in enumerate(cs.lk_raw):
                cols = item_values(cs, items, wits, fx, st, n_padded)
                if len(cols) == 1:
                    cols[0] = np.broadcast_to(cols[0], (n_padded,))
                lk_name = (cs.lk_names[li] if li < len(getattr(cs, "lk_names", []))
                           else f"lk[{li}]")
                for i in range(n_inst):
                    key = (rom, tuple(int(c[i]) if c.ndim else int(c) for c in cols))
                    counts[key] += 1
                    if key not in first_seen:
                        first_seen[key] = (name, lk_name, i)
        if getattr(cs, "lk_table_raw", None):
            n_padded = (wits[0].lo.shape[0] if wits else fx[0].lo.shape[0])
            for rom, items, mult in cs.lk_table_raw:
                cols = item_values(cs, items, wits, fx, st, n_padded)
                mcol = item_values(cs, [mult], wits, fx, st, n_padded)[0]
                for i in range(n_padded):
                    m = int(mcol[i]) if mcol.ndim else int(mcol)
                    if m:
                        key = (rom, tuple(int(c[i]) if c.ndim else int(c) for c in cols))
                        counts[key] -= m

    bad = {k: v for k, v in counts.items() if v != 0}
    if bad:
        from .circuit_builder import ROMType

        rom_names = {v: k for k, v in vars(ROMType).items()
                     if isinstance(v, int)}
        msgs = []
        for key, v in list(bad.items())[:8]:
            rom, vals = key
            rn = rom_names.get(rom, f"ROM#{rom}")
            if v > 0:
                circ, lkn, inst = first_seen.get(key, ("?", "?", -1))
                msgs.append(
                    f"value {list(vals)} not in {rn} table: {v} lookup(s) "
                    f"unmatched — first by circuit '{circ}' record '{lkn}' "
                    f"at instance {inst}"
                )
            else:
                msgs.append(
                    f"{rn} table multiplicity over-counts value {list(vals)} "
                    f"by {-v} (exceeds opcode-side lookups)"
                )
        raise AssertionError(
            f"lookup value imbalance ({len(bad)} keys):\n  " + "\n  ".join(msgs)
        )
