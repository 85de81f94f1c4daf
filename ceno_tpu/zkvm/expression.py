"""Constraint expression AST.

Mirrors the reference's `Expression<E>` (/root/reference/ceno_zkvm/src/
expression.rs:24-46): WitIn / StructuralWitIn / Fixed / Instance / Constant /
Sum / Product / ScaledSum(x,a,b) = a*x+b / Challenge(id, power, scalar,
offset) = scalar * c_id^power + offset.

Two evaluators, both TPU-vectorized:
* `infer_mle` — evaluate over witness/fixed column arrays -> a column array
  (the reference's `wit_infer_by_expr`, scheme/utils.rs:236); under jit this
  compiles each circuit's records into one fused program.
* `eval_scalar` — evaluate at opened scalar values (the verifier's
  `eval_by_expr_with_instance`, scheme/utils.rs:352).

Monomial expansion (`to_monomials`) mirrors expression/monomial.rs and feeds
the main-sel sumcheck's `add_mle_list_by_expr`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from ..field import fops, gl, gl2
from ..field.gl import Gl
from ..field.gl2 import Gl2

P = gl.P


class Expr:
    """Base class; operator overloads build the AST."""

    def __add__(self, other):
        return Sum(self, to_expr(other))

    def __radd__(self, other):
        return Sum(to_expr(other), self)

    def __sub__(self, other):
        return Sum(self, neg_expr(to_expr(other)))

    def __rsub__(self, other):
        return Sum(to_expr(other), neg_expr(self))

    def __mul__(self, other):
        return Product(self, to_expr(other))

    def __rmul__(self, other):
        return Product(to_expr(other), self)

    def __neg__(self):
        return neg_expr(self)

    def degree(self) -> int:
        raise NotImplementedError


@dataclass(frozen=True)
class WitIn(Expr):
    id: int

    def degree(self):
        return 1


@dataclass(frozen=True)
class StructuralWitIn(Expr):
    id: int
    max_len: int
    offset: int
    multi_factor: int

    def degree(self):
        return 1


@dataclass(frozen=True)
class Fixed(Expr):
    id: int

    def degree(self):
        return 1


@dataclass(frozen=True)
class Instance(Expr):
    id: int

    def degree(self):
        return 0


@dataclass(frozen=True)
class Constant(Expr):
    value: int  # base field, canonical

    def degree(self):
        return 0


@dataclass(frozen=True)
class Sum(Expr):
    a: Expr
    b: Expr

    def degree(self):
        return max(self.a.degree(), self.b.degree())


@dataclass(frozen=True)
class Product(Expr):
    a: Expr
    b: Expr

    def degree(self):
        return self.a.degree() + self.b.degree()


@dataclass(frozen=True)
class ScaledSum(Expr):
    """a * x + b; x is wit/fixed/instance, a and b constants or challenges."""

    x: Expr
    a: Expr
    b: Expr

    def degree(self):
        return self.x.degree()


@dataclass(frozen=True)
class Challenge(Expr):
    id: int
    power: int = 1
    scalar: Tuple[int, int] = (1, 0)  # ext scalar (c0, c1)
    offset: Tuple[int, int] = (0, 0)

    def degree(self):
        return 0


def to_expr(v) -> Expr:
    if isinstance(v, Expr):
        return v
    if isinstance(v, int):
        return Constant(v % P)
    raise TypeError(f"cannot lift {type(v)} to Expr")


def neg_expr(e: Expr) -> Expr:
    """-e as ScaledSum/Constant rewriting (reference impl Neg for Expression)."""
    if isinstance(e, Constant):
        return Constant((P - e.value) % P)
    if isinstance(e, (WitIn, StructuralWitIn, Fixed, Instance)):
        return ScaledSum(e, Constant(P - 1), Constant(0))
    if isinstance(e, ScaledSum):
        return ScaledSum(e.x, neg_expr(e.a), neg_expr(e.b))
    if isinstance(e, Sum):
        return Sum(neg_expr(e.a), neg_expr(e.b))
    if isinstance(e, Challenge):
        s0, s1 = e.scalar
        o0, o1 = e.offset
        return Challenge(e.id, e.power, ((P - s0) % P, (P - s1) % P), ((P - o0) % P, (P - o1) % P))
    return Product(Constant(P - 1), e)


# ---------------------------------------------------------------------------
# Evaluators
# ---------------------------------------------------------------------------


def _challenge_value(e: Challenge, challenges: Sequence[Gl2]) -> Gl2:
    c = challenges[e.id]
    v = gl2.pow_const(c, e.power) if e.power != 1 else c
    v = gl2.mul(v, gl2.const(*e.scalar))
    return gl2.add(v, gl2.const(*e.offset))


def infer_mle(
    expr: Expr,
    witnesses: Sequence,
    challenges: Sequence[Gl2],
    fixed: Sequence = (),
    structural: Sequence = (),
    instance: Sequence = (),
    n: Optional[int] = None,
):
    """Evaluate over column arrays -> column array (wit_infer_by_expr).

    Scalars (constants/challenges) stay 0-dim and broadcast.
    """

    def go(e):
        if isinstance(e, WitIn):
            return witnesses[e.id]
        if isinstance(e, StructuralWitIn):
            return structural[e.id]
        if isinstance(e, Fixed):
            return fixed[e.id]
        if isinstance(e, Instance):
            return instance[e.id]
        if isinstance(e, Constant):
            return gl.const(e.value)
        if isinstance(e, Challenge):
            return _challenge_value(e, challenges)
        if isinstance(e, Sum):
            return fops.add(go(e.a), go(e.b))
        if isinstance(e, Product):
            return fops.mul(go(e.a), go(e.b))
        if isinstance(e, ScaledSum):
            return fops.add(fops.mul(go(e.x), go(e.a)), go(e.b))
        raise TypeError(type(e))

    out = go(expr)
    if n is not None and (out.shape == () or out.shape is None):
        out = fops.to_ext(out) if isinstance(out, Gl2) else out
        out = _broadcast(out, n)
    return out


def _broadcast(v, n):
    if isinstance(v, Gl):
        return gl.broadcast_to(v, (n,))
    return gl2.broadcast_to(v, (n,))


def eval_scalar(
    expr: Expr,
    wit_evals: Sequence[Gl2],
    challenges: Sequence[Gl2],
    fixed_evals: Sequence[Gl2] = (),
    structural_evals: Sequence[Gl2] = (),
    instance: Sequence[Gl2] = (),
) -> Gl2:
    """Evaluate at opened scalars (eval_by_expr_with_instance)."""

    def go(e):
        if isinstance(e, WitIn):
            return wit_evals[e.id]
        if isinstance(e, StructuralWitIn):
            return structural_evals[e.id]
        if isinstance(e, Fixed):
            return fixed_evals[e.id]
        if isinstance(e, Instance):
            return instance[e.id]
        if isinstance(e, Constant):
            return gl2.const(e.value)
        if isinstance(e, Challenge):
            return _challenge_value(e, challenges)
        if isinstance(e, Sum):
            return gl2.add(go(e.a), go(e.b))
        if isinstance(e, Product):
            return gl2.mul(go(e.a), go(e.b))
        if isinstance(e, ScaledSum):
            return gl2.add(gl2.mul(go(e.x), go(e.a)), go(e.b))
        raise TypeError(type(e))

    return go(expr)


# ---------------------------------------------------------------------------
# Monomial form
# ---------------------------------------------------------------------------


def to_monomials(expr: Expr) -> List[Tuple[List[Expr], List[Expr]]]:
    """Expand to a sum of monomials: [(scalar_factors, column_factors)].

    scalar_factors are degree-0 (Constant/Challenge/Instance); column_factors
    are WitIn/StructuralWitIn/Fixed (degree-1 leaves).  Mirrors
    expression/monomial.rs to_monomial_form.
    """
    if isinstance(expr, (WitIn, StructuralWitIn, Fixed)):
        return [([], [expr])]
    if isinstance(expr, (Constant, Challenge, Instance)):
        return [([expr], [])]
    if isinstance(expr, Sum):
        return to_monomials(expr.a) + to_monomials(expr.b)
    if isinstance(expr, Product):
        out = []
        for sa, ca in to_monomials(expr.a):
            for sb, cb in to_monomials(expr.b):
                out.append((sa + sb, ca + cb))
        return out
    if isinstance(expr, ScaledSum):
        out = []
        for sa, ca in to_monomials(expr.a):
            for sx, cx in to_monomials(expr.x):
                out.append((sa + sx, ca + cx))
        out.extend(to_monomials(expr.b))
        return out
    raise TypeError(type(expr))


def eval_scalar_factors(
    factors: List[Expr], challenges: Sequence[Gl2], instance: Sequence[Gl2] = ()
) -> Gl2:
    acc = gl2.ones(())
    for f in factors:
        if isinstance(f, Constant):
            acc = gl2.mul(acc, gl2.const(f.value))
        elif isinstance(f, Challenge):
            acc = gl2.mul(acc, _challenge_value(f, challenges))
        elif isinstance(f, Instance):
            acc = gl2.mul(acc, instance[f.id])
        else:
            raise TypeError(type(f))
    return acc
