"""Dense multilinear extensions as flat field arrays.

An n-variable MLE is its 2^n evaluations over the boolean hypercube, stored
as a Gl (base field) or Gl2 (extension) array; index bit i is variable x_i
(bit 0 = LSB).  Conventions match the reference
(/root/reference/multilinear_extensions/src/mle.rs fix_variables — folds the
lowest variable: out[b] = a[2b] + r*(a[2b+1] - a[2b]) — and virtual_poly.rs
build_eq_x_r_vec — eq[idx] = prod_i (idx_i ? r_i : 1 - r_i)).

All ops are field-generic (base or extension evaluations; extension
challenge points) and fully vectorized.
"""

from __future__ import annotations

from ..field import fops, gl2
from ..field.gl2 import Gl2


def num_vars(evals) -> int:
    n = evals.shape[0]
    assert n & (n - 1) == 0
    return n.bit_length() - 1


def fix_low_var(evals, r):
    """Fold the lowest variable at point r: halves the table.

    out[b] = a[2b] + r*(a[2b+1] - a[2b]).  Result is in the field of
    a-promoted-by-r (ext if either is ext)."""
    lo, hi = fops.deinterleave(evals)
    return fops.add(fops.mul(fops.sub(hi, lo), r), fops.to_ext(lo) if _needs_ext(evals, r) else lo)


def _needs_ext(evals, r):
    from ..field.gl import Gl

    return isinstance(r, Gl2) and isinstance(evals, Gl)


def fix_variables(evals, points):
    """Fold variables x_0..x_{k-1} at the given points (low to high)."""
    for r in points:
        evals = fix_low_var(evals, r)
    return evals


def evaluate(evals, points):
    """Evaluate the MLE at a full point (len == num_vars); returns scalar."""
    n = num_vars(evals)
    assert len(points) == n if isinstance(points, (list, tuple)) else points.shape[0] == n
    if not isinstance(points, (list, tuple)):
        points = [points[i] for i in range(points.shape[0])]
    out = fix_variables(evals, points)
    return out[0]


def eq_table(r) -> Gl2:
    """eq(x, r) over the hypercube: (2^n,) with eq[idx] = prod_i (idx_i ? r_i
    : 1-r_i).  r: (n,) ext elements (list or Gl2 vector); DP doubling from the
    highest variable down so r_0 lands on the LSB."""
    if not isinstance(r, (list, tuple)):
        r = [r[i] for i in range(r.shape[0])]
    n = len(r)
    buf = gl2.ones((1,))
    for i in range(n - 1, -1, -1):
        ri = gl2.broadcast_to(r[i].reshape(1), buf.shape)
        hi = gl2.mul(buf, ri)
        lo = gl2.sub(buf, hi)
        buf = _interleave(lo, hi)
    return buf


def _interleave(lo: Gl2, hi: Gl2) -> Gl2:
    import jax.numpy as jnp

    def il(a, b):
        return jnp.stack([a, b], axis=-1).reshape(-1)

    return Gl2(
        type(lo.c0)(il(lo.c0.lo, hi.c0.lo), il(lo.c0.hi, hi.c0.hi)),
        type(lo.c1)(il(lo.c1.lo, hi.c1.lo), il(lo.c1.hi, hi.c1.hi)),
    )


def eq_eval(x, y):
    """eq(x, y) = prod_i (x_i y_i + (1-x_i)(1-y_i)) for two points."""
    if not isinstance(x, (list, tuple)):
        x = [x[i] for i in range(x.shape[0])]
    if not isinstance(y, (list, tuple)):
        y = [y[i] for i in range(y.shape[0])]
    assert len(x) == len(y)
    res = gl2.ones(())
    for xi, yi in zip(x, y):
        xy = fops.mul(xi, yi)
        term = fops.add(fops.sub(fops.add(xy, xy), fops.add(xi, yi)), gl2.ones(()))
        res = fops.mul(res, term)
    return res
