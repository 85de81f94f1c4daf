"""Virtual polynomials: sum of coefficient-scaled products of MLEs.

Mirrors the reference's ``VirtualPolynomialV2``
(/root/reference/multilinear_extensions/src/virtual_poly_v2.rs:42-139): a
virtual poly is Sum_k coeff_k * Prod_i mle_{k,i}, where MLEs are shared
(deduplicated) across products.  num_vars is the max over all MLEs; an MLE
with fewer variables f(x_0..x_{k-1}) is interpreted as a function of the
*low* k variables (plus, under sharding, the top log2(T) shard variables —
exactly the reference's ranged-slice semantics,
/root/reference/ceno_zkvm/src/virtual_polys.rs:44-56).

TPU-native: MLEs are flat Gl/Gl2 arrays; products of equal-length factors
become fused elementwise kernels in the prover.  Deduplication is by object
identity, like the reference's Arc-pointer dedup.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple, Union

from ..field import fops, gl2
from ..field.gl import Gl
from ..field.gl2 import Gl2


class Term(NamedTuple):
    coeff: Gl2  # scalar coefficient
    factors: Tuple[int, ...]  # indices into VirtualPoly.mles


def _as_coeff(c) -> Gl2:
    if isinstance(c, int):
        return gl2.const(c)
    if isinstance(c, Gl):
        return gl2.from_base(c)
    return c


class VirtualPoly:
    """Builder + container.  ``mles`` are deduplicated by identity."""

    def __init__(self, num_vars: int):
        self.num_vars = num_vars
        self.mles: List[Union[Gl, Gl2]] = []
        self._ids = {}
        self.terms: List[Term] = []

    @property
    def max_degree(self) -> int:
        return max((len(t.factors) for t in self.terms), default=0)

    def _index_of(self, mle) -> int:
        key = id(mle)
        if key not in self._ids:
            n = mle.lo.shape[0] if isinstance(mle, Gl) else mle.c0.lo.shape[0]
            assert n & (n - 1) == 0 and n <= (1 << self.num_vars)
            self._ids[key] = len(self.mles)
            self.mles.append(mle)
        return self._ids[key]

    def add_mle_list(self, mles: Sequence, coeff=1) -> Tuple[int, ...]:
        """Add coeff * prod(mles); returns the factor index tuple."""
        assert 1 <= len(mles) <= 3, "reference supports product degree <= 3"
        lens = {m.lo.shape[0] if isinstance(m, Gl) else m.c0.lo.shape[0] for m in mles}
        assert len(lens) == 1, "factors of one product must have equal num_vars"
        idxs = tuple(self._index_of(m) for m in mles)
        self.terms.append(Term(_as_coeff(coeff), idxs))
        return idxs

    def mul_last_by(self, coeff) -> None:
        t = self.terms[-1]
        self.terms[-1] = Term(gl2.mul(t.coeff, _as_coeff(coeff)), t.factors)

    def evaluate(self, point) -> Gl2:
        """Ground-truth evaluation at a full ext point (for tests/claims).

        A k-var MLE among n total vars is evaluated at point[:k] and scaled by
        2^(n-k) implicitly when *summing* — but the final virtual-poly value
        at a point uses f(point[:k]) directly (see sumcheck final claim
        semantics, /root/reference/sumcheck/src/prover_v2.rs:560).
        """
        from ..mle import mle as mle_mod

        total = gl2.zeros(())
        for term in self.terms:
            v = term.coeff
            for i in term.factors:
                m = self.mles[i]
                k = mle_mod.num_vars(m)
                v = fops.mul(v, mle_mod.evaluate(m, [point[j] for j in range(k)]))
            total = gl2.add(total, fops.to_ext(v))
        return total

    def sum_over_hypercube(self) -> Gl2:
        """Ground-truth Sum_{b in {0,1}^n} poly(b) (for tests/claims)."""
        n = self.num_vars
        total = gl2.zeros(())
        for term in self.terms:
            fs = [self.mles[i] for i in term.factors]
            prod = fs[0]
            for f in fs[1:]:
                prod = fops.mul(prod, f)
            s = fops.sum_reduce(prod)
            ln = prod.shape[0]
            scale = 1 << (n - (ln.bit_length() - 1))
            v = fops.mul(fops.mul(term.coeff, s), gl2.const(scale))
            total = gl2.add(total, v)
        return total
