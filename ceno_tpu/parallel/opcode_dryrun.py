"""Full opcode proof over a device mesh — dryrun + byte-equality oracle.

The reference's distribution story stops at OS threads inside one address
space (/root/reference/sumcheck/src/prover_v2.rs:36-315).  Here the whole
`create_opcode_proof` pipeline — record inference, tower GKR, main-sel
sumcheck, Basefold commit/open (NTT + Merkle) — runs with every witness
column *sharded over a jax device mesh*:

* the hypercube/instance axis is placed with NamedSharding(("shard",));
* the jitted kernels are unchanged — GSPMD partitions them and inserts the
  collectives (psum for the per-round sumcheck reductions, all-to-alls for
  the NTT bit-reversal/butterfly regroups and Merkle layer halvings);
* the transcript advances on replicated values, so proof bytes are
  IDENTICAL to a single-device run with the same protocol shard count T
  (= the devirgo thread count, prover_v2.rs:66).  That byte equality is the
  correctness oracle for the distributed path, mirroring the reference's
  multi-thread-vs-single-thread transcript test (sumcheck/src/test.rs).

Used by __graft_entry__.dryrun_multichip (driver-run on N virtual devices)
and tests/test_parallel.py.
"""

from __future__ import annotations

import numpy as np


def tiny_add_setup(num_adds: int = 12, program_size: int = 16):
    """A minimal real-emulation ADD bucket: straight-line ADDs, truncated
    (non-halting) trace, toy PCS parameters (shape-tiny but full-pipeline)."""
    from ..emul import CENO_PLATFORM, Program, encode_rv32
    from ..emul.insn import InsnKind as K
    from ..emul.platform import setup_platform
    from ..pcs import Basefold, RSSpec
    from ..zkvm.e2e import emulate_program
    from ..zkvm.riscv.config import MemLayout, Rv32imConfig
    from ..zkvm.riscv.tables import REG_COUNT_POW2

    body = [encode_rv32(K.ADD, 1, 1, 2, 0)] * num_adds
    program = Program.from_instructions(CENO_PLATFORM.pc_base(), body)
    platform = setup_platform("ceno", program, 4096, 4096, 16)
    mem_layout = MemLayout.from_platform(program, platform)
    config = Rv32imConfig.construct(
        program_size, kinds=(K.ADD,), mem_layout=mem_layout
    )
    pcs = Basefold(
        RSSpec(num_queries=3, rate_log=1, basecode_msg_size_log=1),
        max_num_vars=12,
    )
    init = np.zeros(REG_COUNT_POW2, dtype=np.uint64)
    init[2] = 5
    vm, steps, pv = emulate_program(program, platform, num_adds, init)
    wit, ni, _structural = config.assign_witnesses(steps, program, vm)
    cs = config.zkvm_cs.circuits["ADD"]
    return pcs, cs, wit["ADD"], ni["ADD"], pv


def prove_tiny_add_opcode(num_shards: int = 8, mesh=None) -> bytes:
    """Run the FULL opcode proof (tower + main-sel + PCS open) and return its
    canonical bytes.  mesh=None runs single-device; otherwise every witness
    column is sharded over the mesh and the same jitted programs compile to
    SPMD.  Bytes must be identical for a fixed num_shards."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from ..field import gl2
    from ..transcript import basic as tr
    from ..zkvm import vm as zkvm_mod
    from ..zkvm.scheme.prover import create_opcode_proof
    from ..zkvm.serialize import serialize_proof

    pcs, cs, cols, n, pv = tiny_add_setup()
    raw_pi = pv.to_vec()
    pi_mles = zkvm_mod._raw_pi_mles(raw_pi)
    pi_scalars = [gl2.from_base(m[0]) for m in pi_mles]

    if mesh is not None:
        sh = NamedSharding(mesh, PartitionSpec("shard"))
        cols = [
            jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), c)
            for c in cols
        ]

    cww = pcs.commit(cols)
    t = tr.Transcript(b"opcode-dryrun")
    challenges = [t.read_challenge(), t.read_challenge()]
    proof = create_opcode_proof(
        "ADD", pcs, cs, cols, cww, pi_scalars, n, t, challenges,
        num_shards=num_shards,
    )
    return serialize_proof(proof)
