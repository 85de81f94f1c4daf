"""Poseidon Merkle trees over field-element leaf matrices.

Mirrors the reference Merkle semantics (/root/reference/mpcs/src/util/
merkle_tree.rs): a leaf may carry several field elements (values of several
polynomials at the same index, interleaved); the leaf digest is
``hash_or_noop`` of those values; inner nodes are ``two_to_one``
compressions; extension-field values are flattened to their two base
coefficients.

TPU-native: each level is one batched Poseidon call over all nodes at that
level (digests are laid out (4, n) with the node index riding the TPU lane
dimension), so a 2^k-leaf tree is k kernel launches, each fully parallel.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax.numpy as jnp

from ..field import fops, gl
from ..field.gl import Gl
from ..field.gl2 import Gl2
from . import poseidon
from .poseidon_constants import DIGEST_WIDTH


def leaf_matrix(values) -> Gl:
    """Normalize leaf values to a base-field matrix (m, n): n leaves with m
    base elements each.  Accepts Gl (m, n) / Gl (n,) / Gl2 (flattened to
    2 coefficients per element, interleaved [c0, c1])."""
    if isinstance(values, Gl2):
        lo = jnp.stack([values.c0.lo, values.c1.lo], axis=0)
        hi = jnp.stack([values.c0.hi, values.c1.hi], axis=0)
        values = Gl(lo.reshape(-1, lo.shape[-1]) if lo.ndim > 2 else lo,
                    hi.reshape(-1, hi.shape[-1]) if hi.ndim > 2 else hi)
    if values.lo.ndim == 1:
        values = Gl(values.lo[None, :], values.hi[None, :])
    return values


def hash_leaves(values) -> Gl:
    """Leaf digests (4, n) from a leaf matrix (see leaf_matrix)."""
    return poseidon.hash_or_noop(leaf_matrix(values))


def build_layers(leaf_digests: Gl) -> List[Gl]:
    """All digest layers from leaves (4, n) up to the root (4, 1)."""
    layers = [leaf_digests]
    cur = leaf_digests
    while cur.lo.shape[1] > 1:
        cur = poseidon.two_to_one(cur[:, 0::2], cur[:, 1::2])
        layers.append(cur)
    return layers


class MerkleTree:
    """Committed tree: leaf value matrix + digest layers up to the root."""

    def __init__(self, values):
        self.values = leaf_matrix(values)  # (m, n) base elements
        n = self.values.lo.shape[1]
        assert n & (n - 1) == 0, "leaf count must be a power of two"
        self.layers = build_layers(hash_leaves(self.values))

    @property
    def num_leaves(self) -> int:
        return self.values.lo.shape[1]

    @property
    def height(self) -> int:
        return len(self.layers) - 1

    def root(self) -> Gl:
        return self.layers[-1][:, 0]

    def leaf_values(self, indices: np.ndarray) -> Gl:
        """Leaf value columns (m, k) at the given indices."""
        return gl.take(self.values, jnp.asarray(indices), axis=1)

    def paths(self, indices: np.ndarray) -> Gl:
        """Sibling digests for each index: (height, 4, k)."""
        indices = np.asarray(indices, dtype=np.int64)
        sibs = []
        for level in range(self.height):
            node = (indices >> level) ^ 1
            sibs.append(gl.take(self.layers[level], jnp.asarray(node), axis=1))
        return gl.stack(sibs, axis=0) if sibs else gl.zeros((0, DIGEST_WIDTH, len(indices)))


def verify_path(
    root: Gl, index: int, leaf_values: Gl, path: Gl, height: int
) -> bool:
    """Host-side path check: recompute the root from one leaf's values and
    its sibling path.  leaf_values: (m,) column; path: (height, 4)."""
    digest = poseidon.hash_or_noop(
        Gl(leaf_values.lo[:, None], leaf_values.hi[:, None])
    )  # (4, 1)
    for level in range(height):
        sib = Gl(path.lo[level][:, None], path.hi[level][:, None])
        if (index >> level) & 1:
            digest = poseidon.two_to_one(sib, digest)
        else:
            digest = poseidon.two_to_one(digest, sib)
    got = gl.to_u64(digest[:, 0])
    want = gl.to_u64(root)
    return bool(np.array_equal(got, want))
