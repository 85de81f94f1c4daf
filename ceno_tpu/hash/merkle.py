"""Poseidon Merkle trees over field-element leaf matrices, TPU-native.

Tree structure follows the reference (/root/reference/mpcs/src/util/
merkle_tree.rs:256-330 `merkelize` and util/hash.rs:20-49):

* leaves are m parallel vectors (polynomials) of n field elements each
  (base or extension; extension values flatten to [c0, c1] base pairs);
* the bottom digest layer hashes *adjacent pairs* of positions:
  - m == 1: digest[i] = hash_or_noop(leaf[2i] || leaf[2i+1])
  - m  > 1: digest[i] = two_to_one(hash_or_noop(column 2i),
                                   hash_or_noop(column 2i+1))
* upper layers are two_to_one compressions; the tree has log2(n) digest
  layers; an authentication path carries the sibling digests of layers
  0..log2(n)-2 ("without leaf sibling or root": the leaf pair is supplied
  by the query itself).

TPU-native: each layer is one batched Poseidon call with the node index on
the TPU lane axis; path extraction is static gathers; path verification is
vectorized over all queried indices at once.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from ..field import fops, gl, gl2
from ..field.gl import Gl
from ..field.gl2 import Gl2
from . import poseidon
from .poseidon_constants import DIGEST_WIDTH


def to_base_matrix(values) -> Tuple[Gl, bool]:
    """(k, n) base matrix from one poly's values; k=1 (base) or 2 (ext:
    rows [c0, c1])."""
    if isinstance(values, Gl2):
        return Gl(
            jnp.stack([values.c0.lo, values.c1.lo]),
            jnp.stack([values.c0.hi, values.c1.hi]),
        ), True
    if values.lo.ndim == 1:
        return Gl(values.lo[None, :], values.hi[None, :]), False
    return values, False


def _pair_columns(mat: Gl) -> Tuple[Gl, Gl]:
    """Split (k, n) into even/odd columns (k, n/2)."""
    return gl.deinterleave(mat)


def hash_leaf_layer(polys: List) -> Gl:
    """Bottom digest layer (4, n/2) from m leaf vectors of length n.

    A single-leaf tree (n == 1, e.g. a 1-instance circuit's trivial
    commitment) has no pair: the layer is hash_or_noop of the one leaf."""
    mats = [to_base_matrix(p)[0] for p in polys]
    if len(mats) == 1:
        if mats[0].lo.shape[1] == 1:
            return poseidon.hash_or_noop(mats[0])
        even, odd = _pair_columns(mats[0])
        # hash_or_noop(leaf[2i] || leaf[2i+1]) over base elements
        return poseidon.hash_or_noop(gl.concat([even, odd], axis=0))
    full = gl.concat(mats, axis=0)  # (sum_k, n)
    if full.lo.shape[1] == 1:
        return poseidon.hash_or_noop(full)
    even, odd = _pair_columns(full)
    return poseidon.two_to_one(poseidon.hash_or_noop(even), poseidon.hash_or_noop(odd))


# Upper layers narrower than this are built inside ONE masked lax.scan:
# an unrolled log2(n)-layer chain is ~240 HLO ops per layer, which both
# explodes XLA compile time (CPU pathologically so) and pays the axon
# backend's per-top-level-op runtime cost (see PERF.md).
_SCAN_LAYER_W = 1 << 10


def build_layers(polys) -> List[Gl]:
    """Pure digest-layer construction (traceable): inner[0] = bottom pair
    digests (4, n/2) ... inner[-1] = root (4, 1)."""
    import jax

    layers = [hash_leaf_layer(polys)]
    # wide layers: one batched compression each (bandwidth-bound)
    while layers[-1].lo.shape[1] > _SCAN_LAYER_W:
        cur = layers[-1]
        layers.append(poseidon.two_to_one(*gl.deinterleave(cur)))

    w0 = layers[-1].lo.shape[1]
    if w0 <= 1:
        return layers

    # narrow tail: ONE fixed-width masked scan; iteration j compresses the
    # live prefix w0 >> j and re-pads (garbage beyond the prefix is never
    # read — each returned layer is sliced to its true width)
    n_tail = w0.bit_length() - 1

    def body(cur, _):
        e, o = gl.deinterleave(cur)
        d = poseidon.two_to_one(e, o)  # (4, w/2) live prefix halves
        padded = Gl(
            jnp.concatenate([d.lo, d.lo], axis=1),
            jnp.concatenate([d.hi, d.hi], axis=1),
        )
        return padded, padded

    _, ys = jax.lax.scan(body, layers[-1], None, length=n_tail)
    for j in range(n_tail):
        layers.append(Gl(ys.lo[j, :, : w0 >> (j + 1)], ys.hi[j, :, : w0 >> (j + 1)]))
    return layers


def leaf_pairs(polys, indices):
    """Values at (2*(i>>1), 2*(i>>1)+1) per queried index (traceable; indices
    may be a jnp array): list per poly of (left, right), shape (q,)."""
    indices = jnp.asarray(indices)
    left = (indices >> 1) << 1
    right = left + 1
    return [
        (fops.take(p, left, axis=-1), fops.take(p, right, axis=-1)) for p in polys
    ]


def extract_paths(inner: List[Gl], indices) -> Gl:
    """Sibling digests excluding leaf pair and root: (height-1, 4, q).

    Layer l sibling for leaf index i is inner[l][(i >> (l+1)) ^ 1].
    """
    indices = jnp.asarray(indices)
    height = len(inner)
    sibs = []
    for level in range(height - 1):
        node = (indices >> (level + 1)) ^ 1
        sibs.append(gl.take(inner[level], node, axis=1))
    if not sibs:
        return gl.zeros((0, DIGEST_WIDTH, indices.shape[0]))
    return gl.stack(sibs, axis=0)


def batch_leaves(polys, coeffs: Gl2) -> Gl2:
    """RLC of the m leaf vectors with ext coefficients (merkle_tree.rs)."""
    acc = None
    for i, p in enumerate(polys):
        term = fops.mul(fops.to_ext(p), coeffs[i])
        acc = term if acc is None else gl2.add(acc, term)
    return acc


class MerkleTree:
    """Committed tree over m parallel leaf vectors (reference `MerkleTree`)."""

    def __init__(self, polys, _layers: List[Gl] = None):
        # NOTE: Gl/Gl2 are NamedTuples, so check for them before list/tuple
        if isinstance(polys, (Gl, Gl2)) or not isinstance(polys, (list, tuple)):
            polys = [polys]
        self.polys = list(polys)
        n = (
            polys[0].lo.shape[-1]
            if isinstance(polys[0], Gl)
            else polys[0].c0.lo.shape[-1]
        )
        assert n & (n - 1) == 0 and n >= 1, "leaf count must be a power of two"
        self.num_leaves = n
        self.inner = build_layers(self.polys) if _layers is None else _layers

    @property
    def height(self) -> int:
        """Number of digest layers = log2(num_leaves)."""
        return len(self.inner)

    def root(self) -> Gl:
        return self.inner[-1][:, 0]

    def leaf_pairs(self, indices):
        return leaf_pairs(self.polys, indices)

    def paths(self, indices) -> Gl:
        return extract_paths(self.inner, indices)

    def batch_leaves(self, coeffs: Gl2) -> Gl2:
        return batch_leaves(self.polys, coeffs)


def leaf_pair_digest(left_cols: Gl, right_cols: Gl, num_polys: int) -> Gl:
    """Recompute a bottom digest from queried leaf pair columns (k, q)."""
    if num_polys == 1:
        return poseidon.hash_or_noop(gl.concat([left_cols, right_cols], axis=0))
    return poseidon.two_to_one(
        poseidon.hash_or_noop(left_cols), poseidon.hash_or_noop(right_cols)
    )


def verify_paths(
    root: Gl,
    indices,
    bottom_digests: Gl,
    paths: Gl,
) -> jnp.ndarray:
    """Vectorized path check for q queries at once (traceable indices).

    bottom_digests: (4, q) recomputed pair digests; paths: (levels, 4, q).
    Returns an on-device bool scalar (all paths authenticate).
    """
    indices = jnp.asarray(indices)
    digest = bottom_digests
    levels = paths.lo.shape[0]
    for level in range(levels):
        sib = paths[level]
        bit = ((indices >> (level + 1)) & 1) == 1
        left = gl.select(bit[None, :], sib, digest)
        right = gl.select(bit[None, :], digest, sib)
        digest = poseidon.two_to_one(left, right)
    want = Gl(root.lo[:, None], root.hi[:, None])
    return jnp.all(gl.eq(digest, want))
