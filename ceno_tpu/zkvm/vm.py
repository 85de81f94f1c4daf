"""ZKVM-level prover/verifier orchestration.

Mirrors /root/reference/ceno_zkvm/src/scheme/prover.rs:60-237 and
verifier.rs:40-250: absorb raw public input, write fixed commitments,
batch-commit witness traces per circuit (sorted by name), derive the two
chip challenges, fork the transcript per circuit, prove/verify each circuit
independently, then check the two global invariants:
* sum of logup fractions over all circuits (with the dummy-padding
  multiplicity correction) equals zero;
* prod_r * finalize_global_state == prod_w * initial_global_state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fops, gl, gl2
from ..field.gl import Gl
from ..field.gl2 import Gl2
from ..pcs import Basefold
from ..transcript import basic as tr
from .circuit_builder import ConstraintSystem
from .expression import eval_scalar
from .scheme.prover import OpcodeProof, create_opcode_proof
from .scheme.table_prover import TableProof, create_table_proof
from .scheme.table_verifier import verify_table_proof
from .scheme.utils import next_pow2_instance_padding
from .scheme.verifier import verify_opcode_proof
from .structs import ZKVMProof, ZKVMProvingKey


class PublicValues(NamedTuple):
    """scheme.rs:72-113; each field becomes a public polynomial.

    `public_io` holds full 32-bit words; `to_vec` exposes them as two
    16-bit-limb vectors (lo, hi) so the PubIO table's record layout matches
    the 2-limb memory records (a documented deviation from the reference's
    single-word MemoryExpr, see PROTOCOL.md)."""

    exit_code: int = 0
    init_pc: int = 0
    init_cycle: int = 0
    end_pc: int = 0
    end_cycle: int = 0
    public_io: tuple = ()

    def to_vec(self) -> List[List[int]]:
        io = list(self.public_io) or [0]
        return [
            [self.exit_code & 0xFFFF],
            [(self.exit_code >> 16) & 0xFFFF],
            [self.init_pc],
            [self.init_cycle],
            [self.end_pc],
            [self.end_cycle],
            [w & 0xFFFF for w in io],
            [(w >> 16) & 0xFFFF for w in io],
        ]


# indices into raw_pi (matching PublicValues::to_vec order)
PV_EXIT_CODE_LO = 0
PV_EXIT_CODE_HI = 1
PV_INIT_PC = 2
PV_INIT_CYCLE = 3
PV_END_PC = 4
PV_END_CYCLE = 5
PV_PUBLIC_IO_LO = 6
PV_PUBLIC_IO_HI = 7


def _raw_pi_mles(raw_pi: List[List[int]]) -> List[Gl]:
    out = []
    for vec in raw_pi:
        n = max(1, 1 << (len(vec) - 1).bit_length()) if len(vec) > 1 else 1
        padded = list(vec) + [0] * (n - len(vec))
        out.append(gl.from_u64(np.asarray(padded, dtype=np.uint64)))
    return out


def _absorb_raw_pi(t: tr.Transcript, raw_pi: List[List[int]]) -> None:
    for vec in raw_pi:
        for v in vec:
            t.append_field_element_u64(int(v))


def _split_entries(pk, witnesses, num_instances, seg_cap_log2):
    """Segmentation at MAX_NUM_VARIABLES (scheme/constants.rs:8, SURVEY §5).

    Opcode buckets whose padded instance count exceeds 2^seg_cap_log2 are
    split into chunk entries ``NAME`` (chunk 0), ``NAME@001``, ``NAME@002``…
    each proved as an independent opcode proof *under the same α/β chip
    challenges*.  This is sound without any extra glue: the cross-circuit
    multiset product and LogUp sum are linear over proofs, so per-step
    global-state records at chunk boundaries cancel in the global product
    exactly as they do between adjacent instances inside one proof — the
    verifier's prod_r/prod_w/logup accumulation chains the segments.

    Chunk ids are zero-padded so lexicographic entry order == chunk order,
    keeping the transcript schedule deterministic.  Table circuits cannot be
    split (single multiset over the whole execution); they assert the cap.

    Returns (entry_names_by_circuit, entry_wits, entry_n): per base circuit
    name the ordered chunk entry list, plus per-entry columns / counts.
    """
    cap = 1 << seg_cap_log2
    by_circuit: Dict[str, List[str]] = {}
    entry_wits: Dict[str, List[Gl]] = {}
    entry_n: Dict[str, int] = {}

    def is_opcode(name):
        c = pk.circuit_pks[name].cs
        return not (
            c.r_table_expressions or c.w_table_expressions or c.lk_table_expressions
        )

    for name in pk.sorted_names():
        n = num_instances.get(name, 0)
        if n == 0:
            by_circuit[name] = []
            continue
        if not is_opcode(name) or next_pow2_instance_padding(n) <= cap:
            assert next_pow2_instance_padding(n) <= cap, (
                f"table {name}: {n} rows exceeds the 2^{seg_cap_log2} "
                "commitment cap and tables cannot be segmented"
            )
            by_circuit[name] = [name]
            entry_wits[name] = witnesses[name]
            entry_n[name] = n
            continue
        cols = witnesses[name]
        entries = []
        num_chunks = -(-n // cap)
        assert num_chunks <= 999, "raise seg_cap_log2"
        for j in range(num_chunks):
            ename = name if j == 0 else f"{name}@{j:03d}"
            n_j = min(cap, n - j * cap)
            pad_j = next_pow2_instance_padding(n_j)
            entry_wits[ename] = [c[j * cap : j * cap + pad_j] for c in cols]
            entry_n[ename] = n_j
            entries.append(ename)
        by_circuit[name] = entries
    return by_circuit, entry_wits, entry_n


def create_proof(
    pk: ZKVMProvingKey,
    witnesses: Dict[str, List[Gl]],
    structural: Dict[str, List[Gl]],
    num_instances: Dict[str, int],
    pv: PublicValues,
    t: tr.Transcript,
    num_shards: int = 1,
    seg_cap_log2: Optional[int] = None,
) -> ZKVMProof:
    """witnesses[name] = padded witin columns; num_instances[name] = real
    (unpadded) instance count.  Circuits with no instances are skipped.
    seg_cap_log2 (default: the PCS max_num_vars) caps any one commitment;
    larger opcode buckets are proved as multiple segments (_split_entries).
    num_shards=0 picks a per-entry shard count from the device mesh
    (optimal_sumcheck_threads analog, utils.rs:94-102)."""
    pcs = pk.pcs
    if seg_cap_log2 is None:
        seg_cap_log2 = pcs.max_num_vars
    raw_pi = pv.to_vec()
    _absorb_raw_pi(t, raw_pi)
    pi_mles = _raw_pi_mles(raw_pi)
    # instance scalars for opcode circuits: single-value public inputs
    pi_scalars = [gl2.from_base(m[0]) for m in pi_mles]

    for name in pk.sorted_names():
        cpk = pk.circuit_pks[name]
        if cpk.fixed_commit is not None:
            Basefold.write_commitment(cpk.fixed_commit, t)

    # commit opcode circuits first, then tables, each sorted by entry name —
    # the verifier replays absorbs in this order (prover.rs:98 comment,
    # verifier.rs:118-127)
    def is_opcode_name(name):
        c = pk.circuit_pks[name].cs
        return not (
            c.r_table_expressions or c.w_table_expressions or c.lk_table_expressions
        )

    by_circuit, entry_wits, entry_n = _split_entries(
        pk, witnesses, num_instances, seg_cap_log2
    )
    commitments = {}
    ordered = [e for n in pk.sorted_names() if is_opcode_name(n)
               for e in by_circuit[n]] + [
        e for n in pk.sorted_names() if not is_opcode_name(n)
        for e in by_circuit[n]
    ]
    from ..utils.profiling import span

    for ename in ordered:
        with span(f"commit/{ename}", level=2):
            cww = pcs.commit(entry_wits[ename])
        Basefold.write_commitment(cww.to_commitment(), t)
        commitments[ename] = cww

    challenges = [t.read_challenge(), t.read_challenge()]

    proof = ZKVMProof(raw_pi, _constant_pi_evals(raw_pi))
    forks = t.fork(len(pk.circuit_pks))
    for i, name in enumerate(pk.sorted_names()):
        cpk = pk.circuit_pks[name]
        cs = cpk.cs
        ft = forks[i]  # shared by all chunks of this circuit, in order
        for ename in by_circuit[name]:
            if num_shards == 0:
                from ..parallel import optimal_num_shards

                pad = entry_wits[ename][0].lo.shape[0] if entry_wits[ename] else 1
                ns = optimal_num_shards(max(pad, 1).bit_length() - 1)
            else:
                ns = num_shards
            if is_opcode_name(name):
                with span(f"opcode_proof/{ename}", level=2):
                    p = create_opcode_proof(
                        ename, pcs, cs, entry_wits[ename], commitments[ename],
                        pi_scalars, entry_n[ename], ft, challenges, ns,
                    )
                proof.opcode_proofs[ename] = (i, p)
            else:
                with span(f"table_proof/{ename}", level=2):
                    p, pi_in_evals = create_table_proof(
                        ename, pcs, cs, cpk.fixed_traces or [], cpk.fixed_cww,
                        entry_wits[ename], commitments[ename],
                        structural.get(ename, []),
                        pi_mles, pi_mles, ft, challenges, ns,
                    )
                proof.table_proofs[ename] = (i, p)
                for idx, ev in pi_in_evals.items():
                    proof.pi_evals[idx] = ev
    return proof


def _constant_pi_evals(raw_pi: List[List[int]]) -> Dict[int, Gl2]:
    return {
        i: gl2.const(vec[0]) for i, vec in enumerate(raw_pi) if len(vec) == 1
    }


HALT_CIRCUIT_NAME = "ECALL_HALT"


def verify_proof_halt(
    pk_or_vk,
    proof: ZKVMProof,
    t: tr.Transcript,
    does_halt: bool = True,
) -> jnp.ndarray:
    """verifier.rs:55-75: a halting trace must carry exactly one ECALL-HALT
    instance; a truncated (max_steps) segment must carry none.  The count is
    a host-side structural check; the rest verifies on-device."""
    num_halts = sum(
        p.num_instances for name, (_, p) in proof.opcode_proofs.items()
        if name.split("@")[0] == HALT_CIRCUIT_NAME
    )
    if num_halts != int(does_halt):
        return jnp.asarray(False)
    return verify_proof(pk_or_vk, proof, t)


def verify_proof(
    pk_or_vk,
    proof: ZKVMProof,
    t: tr.Transcript,
) -> jnp.ndarray:
    """Returns on-device ok.  pk_or_vk: ZKVMProvingKey (doubles as vk —
    fixed commitments + constraint systems; witness data unused)."""
    vk = pk_or_vk
    pcs = vk.pcs
    raw_pi = proof.raw_pi
    _absorb_raw_pi(t, raw_pi)
    pi_mles = _raw_pi_mles(raw_pi)
    pi_evals = [
        proof.pi_evals.get(i, gl2.const(raw_pi[i][0] if len(raw_pi[i]) == 1 else 0))
        for i in range(len(raw_pi))
    ]

    ok = jnp.asarray(True)
    # constant pi evals must equal the raw constants
    for i, vec in enumerate(raw_pi):
        if len(vec) == 1:
            ok = ok & jnp.all(gl2.eq(pi_evals[i], gl2.const(vec[0])))

    for name in vk.sorted_names():
        cpk = vk.circuit_pks[name]
        if cpk.fixed_commit is not None:
            Basefold.write_commitment(cpk.fixed_commit, t)
    for name, (_, p) in sorted(proof.opcode_proofs.items()):
        Basefold.write_commitment(p.wits_commit, t)
    for name, (_, p) in sorted(proof.table_proofs.items()):
        Basefold.write_commitment(p.wits_commit, t)

    challenges = [t.read_challenge(), t.read_challenge()]
    dummy_table_item = challenges[0]
    dummy_multiplicity = 0

    prod_r = gl2.ones(())
    prod_w = gl2.ones(())
    logup_sum = gl2.zeros(())

    forks = t.fork(len(vk.circuit_pks))
    # sorted order == proving order (chunk ids are zero-padded); chunks of a
    # segmented circuit share forks[i] and replay sequentially on it
    for name, (i, p) in sorted(proof.opcode_proofs.items()):
        cs = vk.circuit_pks[name.split("@")[0]].cs
        out = verify_opcode_proof(name, pcs, cs, p, pi_evals, forks[i], challenges)
        ok = ok & out.ok

        num_lks = len(cs.lk_expressions)
        # lookup slots pad to 1<<ceil_log2(k) — no min-2 (that floor applies
        # to the instance axis only; verifier.rs:162-221)
        k_pad = 1 << (num_lks - 1).bit_length() if num_lks > 1 else 1
        pad_lks = k_pad - num_lks
        pad_inst = next_pow2_instance_padding(p.num_instances) - p.num_instances
        dummy_multiplicity += pad_lks * p.num_instances + k_pad * pad_inst

        prod_r = gl2.mul(prod_r, gl2.mul(p.record_r_out_evals[0], p.record_r_out_evals[1]))
        prod_w = gl2.mul(prod_w, gl2.mul(p.record_w_out_evals[0], p.record_w_out_evals[1]))
        p1, p2, q1, q2 = p.lk_out_evals
        logup_sum = gl2.add(logup_sum, gl2.mul(p1, gl2.inv(q1)))
        logup_sum = gl2.add(logup_sum, gl2.mul(p2, gl2.inv(q2)))

    for name, (i, p) in sorted(proof.table_proofs.items()):
        cs = vk.circuit_pks[name].cs
        out = verify_table_proof(
            name, pcs, cs, vk.circuit_pks[name].fixed_commit, p,
            pi_mles, pi_evals, forks[i], challenges,
        )
        ok = ok & out.ok
        for (p1, p2, q1, q2) in p.lk_out_evals:
            logup_sum = gl2.sub(logup_sum, gl2.mul(p1, gl2.inv(q1)))
            logup_sum = gl2.sub(logup_sum, gl2.mul(p2, gl2.inv(q2)))
        for e in p.w_out_evals:
            prod_w = gl2.mul(prod_w, gl2.mul(e[0], e[1]))
        for e in p.r_out_evals:
            prod_r = gl2.mul(prod_r, gl2.mul(e[0], e[1]))

    logup_sum = gl2.sub(
        logup_sum,
        gl2.mul(gl2.const(dummy_multiplicity), gl2.inv(dummy_table_item)),
    )
    ok = ok & jnp.all(gl2.eq(logup_sum, gl2.zeros(())))

    if vk.initial_global_state_expr is not None:
        init_gs = eval_scalar(
            vk.initial_global_state_expr, [], challenges, instance=pi_evals
        )
        prod_w = gl2.mul(prod_w, init_gs)
        final_gs = eval_scalar(
            vk.finalize_global_state_expr, [], challenges, instance=pi_evals
        )
        prod_r = gl2.mul(prod_r, final_gs)
    ok = ok & jnp.all(gl2.eq(prod_r, prod_w))
    return ok
