"""Multi-device sharding tests on the virtual CPU mesh: the distributed
sumcheck must produce byte-identical proofs to the single-chip run with the
same protocol shard count (the reference's multi-thread oracle,
SURVEY.md section 2.9)."""

import os

import numpy as np
import jax
import pytest

import conftest

# The virtual-device mesh programs are compiled by XLA:CPU and executed as
# 4 cooperating device threads; on a 1-core host both are pathological
# (multi-hour SPMD compiles, collective rendezvous spin).  The driver's
# multichip dryrun (__graft_entry__.dryrun_multichip) covers the same path
# on a multicore box every round.
_mesh_host_ok = pytest.mark.skipif(
    (os.cpu_count() or 1) < 4,
    reason="virtual-device mesh needs a multicore host (1-core XLA:CPU "
    "SPMD compile/execution is pathological; driver dryrun covers this)",
)
from ceno_tpu.field import fops, gl
from ceno_tpu.parallel import make_mesh, prove_sharded
from ceno_tpu.sumcheck import VirtualPoly, check, prove, verify
from ceno_tpu.transcript import basic as tr


def _make_poly(seed, num_vars, degree):
    rng = np.random.default_rng(seed)
    vp = VirtualPoly(num_vars)
    mles = [
        gl.from_u64(rng.integers(0, gl.P, size=1 << num_vars, dtype=np.uint64))
        for _ in range(degree)
    ]
    vp.add_mle_list(mles, coeff=11)
    return vp


def test_sharded_round_kernel_compiles_to_allreduce():
    """The collectives exist: compiling ONE devirgo round kernel with its
    inputs sharded over an 8-device mesh must place an `all-reduce` (the
    psum of the d+1 round evaluations, SURVEY.md section 2.9) in the SPMD
    module.  Compile-only — no mesh execution, so it runs on any host."""
    from jax.sharding import NamedSharding, PartitionSpec

    from ceno_tpu.sumcheck.prover import _round_kernel

    devices = conftest.cpu_mesh_devices(8)
    mesh = make_mesh(devices=devices)
    T = 8
    vp = _make_poly(5, 6, 2)
    sh = NamedSharding(mesh, PartitionSpec("shard", None))
    mles = [
        jax.tree_util.tree_map(
            lambda a: jax.device_put(np.asarray(a).reshape(T, -1), sh), m
        )
        for m in vp.mles
    ]
    scales = [t.coeff for t in vp.terms]
    factors = tuple(t.factors for t in vp.terms)

    def step(mles, scales):
        _, evals = _round_kernel(mles, scales, None, factors=factors,
                                 max_degree=2)
        return evals

    txt = jax.jit(step).lower(mles, scales).compile().as_text()
    assert "all-reduce" in txt, "no all-reduce in SPMD module:\n" + txt[:2000]


@_mesh_host_ok
def test_mesh_prove_matches_single_chip():
    devices = conftest.cpu_mesh_devices(4)
    mesh = make_mesh(devices=devices)
    num_vars = 6
    with jax.default_device(devices[0]):
        vp = _make_poly(3, num_vars, 2)
        claimed = vp.sum_over_hypercube()

        proof_mesh, _, _ = prove_sharded(vp, tr.new(b"mesh"), mesh)
        proof_single, _, _ = prove(vp, tr.new(b"mesh"), num_shards=4)

        import jax.numpy as jnp

        acc = jnp.asarray(True)
        for a, b in zip(proof_mesh.round_evals, proof_single.round_evals):
            acc = acc & jnp.all(fops.eq(a, b))
        assert bool(jax.device_get(acc))

        subclaim, _ = verify(claimed, proof_mesh, num_vars, 2, tr.new(b"mesh"))
        check(subclaim)


@_mesh_host_ok
def test_mesh_full_opcode_proof_matches_single_device():
    """Full opcode proof (records -> tower -> main-sel -> Basefold open)
    with witness columns sharded over a 4-device mesh: canonical proof bytes
    must equal the single-device run with the same protocol shard count
    (VERDICT round-1 item 6; oracle per SURVEY section 2.9)."""
    from ceno_tpu.parallel.opcode_dryrun import prove_tiny_add_opcode

    devices = conftest.cpu_mesh_devices(4)
    mesh = make_mesh(devices=devices)
    with jax.default_device(devices[0]):
        bytes_single = prove_tiny_add_opcode(num_shards=4, mesh=None)
        bytes_mesh = prove_tiny_add_opcode(num_shards=4, mesh=mesh)
    assert bytes_mesh == bytes_single


def test_optimal_num_shards():
    """Device-count-aware shard heuristic (utils.rs:94-102 analog)."""
    from ceno_tpu.parallel import optimal_num_shards

    assert optimal_num_shards(3, 8) == 1
    assert optimal_num_shards(4, 8) == 1
    assert optimal_num_shards(5, 8) == 2
    assert optimal_num_shards(20, 8) == 8
    assert optimal_num_shards(20, 5) == 4   # pow2 floor of the mesh
    assert optimal_num_shards(20, 1) == 1
