"""Distributed (multi-chip) devirgo sumcheck over a jax device mesh.

The reference's distribution model (/root/reference/sumcheck/src/
prover_v2.rs:36-315) fans out OS threads, sums per-round univariate
evaluations through crossbeam channels, and broadcasts challenges back.
The TPU-native equivalent (SURVEY.md section 2.9):

* every MLE is laid out (T, L) with the shard axis sharded over the mesh
  ("sequence parallelism" over the hypercube prefix) — shard s owns the
  contiguous range of the eval table = the top log2(T) index bits;
* the per-round cross-shard sum of the d+1 evaluations is a `psum` riding
  ICI: we express it as a plain global reduction and let GSPMD insert the
  collective (the jit'ed round kernels from ceno_tpu.sumcheck are reused
  unchanged — they are already written over (T, L) arrays);
* the Poseidon transcript runs on replicated data, so every device advances
  it in lockstep — no channel sync, and proof bytes are independent of the
  mesh size (for a fixed protocol shard count T).

This module only *places* data: `shard_virtual_poly` device_puts each MLE
with a NamedSharding over the mesh axis, and `prove_sharded` calls the
standard prover, whose kernels then compile to SPMD programs with the psum
inserted at the reduction.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..field.gl import Gl
from ..field.gl2 import Gl2
from ..sumcheck import prover as sc_prover
from ..sumcheck.virtual_poly import VirtualPoly
from ..transcript import basic as tr


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the shard axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("shard",))


def shard_virtual_poly(poly: VirtualPoly, mesh: Mesh) -> VirtualPoly:
    """Place every MLE of ``poly`` sharded over the mesh.

    MLEs are kept flat (length 2^k); the prover reshapes to (T, L) with
    T = mesh size, so we shard the flat vector contiguously — identical
    layout to the reference's ranged slices (virtual_polys.rs:44-56).
    """
    T = mesh.devices.size
    sharding = NamedSharding(mesh, PartitionSpec("shard"))

    def put(m):
        arrs = jax.tree_util.tree_leaves(m)
        assert all(a.shape[-1] % T == 0 for a in arrs)
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), m)

    out = VirtualPoly(poly.num_vars)
    out.mles = [put(m) for m in poly.mles]
    out.terms = list(poly.terms)
    return out


def prove_sharded(poly: VirtualPoly, ts: tr.TranscriptState, mesh: Mesh):
    """Devirgo sumcheck with the shard axis on the mesh.

    The protocol shard count T equals the mesh size, so the proof equals a
    single-chip run with num_shards=T (tested in test_parallel.py).
    """
    T = int(mesh.devices.size)
    sharded = shard_virtual_poly(poly, mesh)
    return sc_prover.prove(sharded, ts, num_shards=T)


MIN_VARS_PER_SHARD = 4  # ceno_zkvm/src/utils.rs:96 min_numvar_per_thread


def optimal_num_shards(num_vars: int, n_devices: Optional[int] = None) -> int:
    """Device-count-aware shard layout (the reference's
    optimal_sumcheck_threads, ceno_zkvm/src/utils.rs:94-102, with the device
    mesh standing in for the rayon pool): 1 shard for tiny polys, else
    min(2^(num_vars - 4), pow2_floor(n_devices)).  Always a power of two so
    the shard axis is a clean reshape of the eval table."""
    if n_devices is None:
        n_devices = len(jax.devices())
    cap = 1 << (max(n_devices, 1).bit_length() - 1)
    if num_vars <= MIN_VARS_PER_SHARD:
        return 1
    return min(1 << (num_vars - MIN_VARS_PER_SHARD), cap)
