"""Basefold multilinear PCS (RS-code default), TPU-native.

Protocol matches the reference (/root/reference/mpcs/src/basefold.rs,
basefold/commit_phase.rs, basefold/query_phase.rs):

* commit: hypercube evals -> coefficients (interpolate) -> bit-reverse ->
  RS-encode -> bit-reverse codeword -> Merkle tree (pair leaves); the
  stored bh_evals are bit-reversed so all folds are adjacent-pair ops
  (basefold.rs:89-157).  Polys with <= basecode_msg_size_log variables are
  committed trivially (Merkle over raw evals).
* simple_batch_open (the zkvm's path: one commitment, many polys, one point):
  sample batch coeffs eq(X,t), run the interleaved sumcheck+FRI commit phase
  (coefficient-form degree-2 messages, b"commit round" challenges, per-round
  codeword fold by interpolation weights, Merkle roots absorbed), then open
  200 transcript-sampled query positions with Merkle paths at every level
  (commit_phase.rs:349+, query_phase.rs:31-140).
* verify: replay transcript, re-encode the final message, replay each query's
  fold chain against the opened oracle values, check Merkle paths, and check
  the sumcheck chain (query_phase.rs:1329-1420).

TPU-native: all per-round work (sumcheck round, codeword fold, Merkle layer
hashes) is fused elementwise kernels over whole arrays; the verifier's 200
query chains are batched on the query axis; every check accumulates into one
on-device boolean (single host sync via `check`).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fops, gl, gl2
from ..field.gl import Gl
from ..field.gl2 import Gl2
from ..hash import merkle, poseidon
from ..mle import mle as mle_mod
from ..transcript import basic as tr
from . import ntt
from .encoding import RSCode, RSSpec

P = gl.P


# ---------------------------------------------------------------------------
# Data types
# ---------------------------------------------------------------------------


class BasefoldCommitment(NamedTuple):
    root: Gl  # (4,)
    num_vars: int
    is_base: bool
    num_polys: int


class BasefoldCommitmentWithWitness(NamedTuple):
    tree: merkle.MerkleTree  # leaves = bit-reversed codewords (or raw evals if trivial)
    bh_evals: List  # bit-reversed hypercube evals per poly (raw if trivial)
    num_vars: int
    is_base: bool
    trivial: bool

    @property
    def num_polys(self) -> int:
        return len(self.bh_evals)

    def to_commitment(self) -> BasefoldCommitment:
        return BasefoldCommitment(
            self.tree.root(), self.num_vars, self.is_base, self.num_polys
        )


class QueryOpens(NamedTuple):
    comm_left: object  # (m, q) Gl or Gl2: per-poly codeword values at even pos
    comm_right: object
    comm_paths: Gl  # (h-1, 4, q)
    oracle_vals: List[Tuple[Gl2, Gl2]]  # per tree: (left (q,), right (q,))
    oracle_paths: List[Gl]


class Evaluation(NamedTuple):
    """One claim poly[i](points[j]) = value (mpcs/src/lib.rs:277-300)."""

    poly: int
    point: int
    value: Gl2


class CommQueryOpen(NamedTuple):
    """One commitment's codeword pair + Merkle path at its join level."""

    left: object  # (q,) Gl or Gl2
    right: object
    paths: Gl  # (h-1, 4, q)


class BatchedQueryOpens(NamedTuple):
    comm_opens: List[CommQueryOpen]  # per commitment, at index >> delta_c
    oracle_vals: List[Tuple[Gl2, Gl2]]  # per oracle tree (pre-merge values)
    oracle_paths: List[Gl]


class BasefoldProof(NamedTuple):
    sumcheck_messages: List[Gl2]  # per round: (3,) coefficient-form
    roots: List[Gl]  # num_rounds-1 digests
    final_message: Optional[Gl2]  # (2^basecode,) little-endian evals
    query_opens: Optional[QueryOpens]
    trivial_evals: Optional[List]  # full bh evals for trivial commitments
    # batch_open extras (None on the single/simple paths):
    sumcheck_proof: object = None  # reduction SumcheckProof (batch_open)
    batched_opens: Optional[BatchedQueryOpens] = None


class Basefold:
    """PCS instance for a fixed spec and maximum message size.

    ``spec`` selects the encoding: RSSpec -> Reed-Solomon (the reference's
    default, BasefoldRSParams), BasecodeSpec -> the random foldable code
    (BasefoldBasecodeParams, basefold/structure.rs:230-259).  The only
    protocol difference between the two is the message-fold convention
    (basefold.rs:118-136): even-odd codes bit-reverse the coefficient
    vector before encoding, left-right codes (Basecode) do not; the
    verifier's final-message re-encode mirrors this (query_phase.rs:162)."""

    def __init__(self, spec=RSSpec(), max_num_vars: int = 24):
        self.spec = spec
        self.max_num_vars = max_num_vars
        if isinstance(spec, RSSpec):
            self.code = RSCode(spec, max_num_vars)
        else:
            from .basecode import Basecode, BasecodeSpec

            assert isinstance(spec, BasecodeSpec), spec
            self.code = Basecode(spec, max_num_vars)
        # left-right codes fold message pairs (m[i], m[i+n/2]); bit-reversal
        # maps those to adjacent pairs, so the fold kernels are shared and
        # only the two bitrev points below differ
        self._lr = bool(getattr(self.code, "is_left_right", False))

    # -- commit ------------------------------------------------------------

    def commit(self, polys: List) -> BasefoldCommitmentWithWitness:
        """Batch-commit polys of equal num_vars (reference batch_commit).

        One jitted program per (m, num_vars, field) signature."""
        from ..utils import cached_jit

        if isinstance(polys, (Gl, Gl2)) or not isinstance(polys, (list, tuple)):
            polys = [polys]
        polys = list(polys)
        n = _len(polys[0])
        num_vars = n.bit_length() - 1
        assert num_vars <= self.max_num_vars, "poly too big"
        for p in polys:
            assert _len(p) == n
        is_base = isinstance(polys[0], Gl)

        if num_vars <= self.spec.basecode_msg_size_log:
            def trivial_builder():
                return lambda ps: merkle.build_layers(ps)

            layers = cached_jit(
                ("bf_commit_trivial", len(polys), num_vars, is_base), trivial_builder
            )(polys)
            tree = merkle.MerkleTree(polys, _layers=layers)
            return BasefoldCommitmentWithWitness(
                tree, polys, num_vars, is_base, True
            )

        def builder():
            def run(ps):
                codewords = [self._encode_poly(p, use_jit=False) for p in ps]
                layers = merkle.build_layers(codewords)
                bh = [ntt.bitrev(p) for p in ps]
                return codewords, layers, bh

            return run

        codewords, layers, bh = cached_jit(
            ("bf_commit", len(polys), num_vars, is_base, self.spec, self.max_num_vars),
            builder,
        )(polys)
        tree = merkle.MerkleTree(codewords, _layers=layers)
        return BasefoldCommitmentWithWitness(tree, bh, num_vars, is_base, False)

    def _encode_poly(self, evals, use_jit: bool = True):
        """interpolate -> [bitrev if even-odd code] -> encode -> bitrev
        (basefold.rs:110-156; the coefficient bitrev is the even-odd-fold
        compensation, skipped for left-right codes like Basecode)."""
        coeffs = ntt.interpolate_over_hypercube(evals) if not use_jit else ntt.interpolate_jit(evals)
        if not self._lr:
            coeffs = ntt.bitrev(coeffs)
        cw = self.code.encode(coeffs, use_jit=use_jit)
        return ntt.bitrev(cw)

    @staticmethod
    def write_commitment(comm: BasefoldCommitment, t: tr.Transcript) -> None:
        """Absorb the root digest, one element at a time (hash.rs:10-18)."""
        for i in range(4):
            t.append_field_elements(comm.root[i : i + 1])

    # -- open ----------------------------------------------------------------

    def simple_batch_open(
        self,
        cww: BasefoldCommitmentWithWitness,
        point: List[Gl2],
        evals: List[Gl2],
        t: tr.Transcript,
    ) -> BasefoldProof:
        num_vars = cww.num_vars
        m = cww.num_polys
        assert len(point) == num_vars and len(evals) == m

        if cww.trivial:
            return BasefoldProof([], [], None, None, list(cww.bh_evals))

        from ..utils import cached_jit

        num_rounds = num_vars - self.spec.basecode_msg_size_log
        # fold tables are built eagerly ONCE (device constants); pass them in
        # so the jitted cores never build cached state inside a trace
        fold_tables = [
            self.code.fold_table(num_vars + self.spec.rate_log - i - 1)
            for i in range(num_rounds)
        ]

        sig = (m, num_vars, cww.is_base, self.spec, self.max_num_vars)

        # batch coeffs + RLC'd oracle/evals + first sumcheck message
        def prep_builder():
            def run(bh_evals, tree_polys, pt, ts):
                t2 = tr.Transcript.__new__(tr.Transcript)
                t2.ts = ts
                t2.field_appended_num = 0
                batch_coeffs = _batch_coeffs(t2, m)
                oracle = merkle.batch_leaves(tree_polys, batch_coeffs)
                running = _rlc(bh_evals, batch_coeffs)
                eq = ntt.bitrev(mle_mod.eq_table(pt))
                eq = _interp_pairs(eq)
                running = _interp_pairs(running)
                msg = _pi_coeffs(running, eq)
                return oracle, eq, running, msg, t2.ts

            return run

        oracle, eq, running, msg, ts = cached_jit(("bf_prep",) + sig, prep_builder)(
            cww.bh_evals, cww.tree.polys, point, t.ts
        )
        t.ts = ts

        msgs, roots, oracles_layers = [], [], []
        final_message = None
        for i in range(num_rounds):
            t.append_field_element_exts(msg)
            msgs.append(msg)
            r = t.get_and_append_challenge(b"commit round")
            x0, w = fold_tables[i]
            oracle = _fold_codeword(oracle, r, x0, w)
            if i < num_rounds - 1:
                eq, running, msg = _challenge_round(eq, running, r)
                layers = _build_layers_jit([oracle])
                oracles_layers.append((oracle, layers))
                root = layers[-1][:, 0]
                _write_digest(root, t)
                roots.append(root)
            else:
                final_message = _final_fold_jit(running, r)
                t.append_field_element_exts(final_message)

        # query phase (one host sync for the indices)
        q = self.spec.num_queries
        codeword_size = 1 << (num_vars + self.spec.rate_log)
        indices = _sample_query_indices(t, q, codeword_size)
        idx_arr = jnp.asarray(indices, dtype=jnp.int32)

        def query_builder():
            def run(tree_polys, tree_inner, oracles, idx):
                pairs = merkle.leaf_pairs(tree_polys, idx)
                comm_left = fops.stack([p[0] for p in pairs], axis=0)
                comm_right = fops.stack([p[1] for p in pairs], axis=0)
                comm_paths = merkle.extract_paths(tree_inner, idx)
                oracle_vals, oracle_paths = [], []
                cur = idx >> 1
                for oracle, layers in oracles:
                    pr = merkle.leaf_pairs([oracle], cur)
                    oracle_vals.append((pr[0][0], pr[0][1]))
                    oracle_paths.append(merkle.extract_paths(layers, cur))
                    cur = cur >> 1
                return QueryOpens(
                    comm_left, comm_right, comm_paths, oracle_vals, oracle_paths
                )

            return run

        opens = cached_jit(("bf_open2",) + sig + (q,), query_builder)(
            cww.tree.polys, cww.tree.inner, oracles_layers, idx_arr
        )

        return BasefoldProof(list(msgs), list(roots), final_message, opens, None)

    def open(
        self,
        cww: BasefoldCommitmentWithWitness,
        point: List[Gl2],
        eval_: Gl2,
        t: tr.Transcript,
    ) -> BasefoldProof:
        """Single-poly single-point open (mpcs/src/lib.rs:165, basefold.rs:467).

        Identical protocol to simple_batch with batch size 1: with one poly
        the batch-coefficient phase samples zero challenges and the RLC is
        the identity, which is exactly the reference's single commit_phase."""
        assert cww.num_polys == 1
        return self.simple_batch_open(cww, point, [eval_], t)

    def verify(
        self,
        comm: BasefoldCommitment,
        point: List[Gl2],
        eval_: Gl2,
        proof: BasefoldProof,
        t: tr.Transcript,
    ):
        assert comm.num_polys == 1
        return self.simple_batch_verify(comm, point, [eval_], proof, t)

    # -- batch open (multi-commitment, multi-point) --------------------------

    def batch_open(
        self,
        cwws: List[BasefoldCommitmentWithWitness],
        points: List[List[Gl2]],
        evals: List[Evaluation],
        t: tr.Transcript,
    ) -> BasefoldProof:
        """Open several (single-poly) commitments of possibly different sizes
        at several points (basefold.rs:547-762 batch_open).

        Protocol:
        1. sample ``batch coeffs`` t, set eq_xt = eq(X, t);
        2. reduce all claims to one point with a devirgo sumcheck over
           Sum_p eq(X, point_p) * merged_p where merged_p is the eq_xt-RLC of
           the polys opened at point_p (this build's sumcheck replaces the
           reference's classic coefficient-form sumcheck
           mpcs/src/sum_check/classic.rs:222 — a documented deviation);
        3. run the batched FRI commit phase (commit_phase.rs:179): the
           running oracle starts as the RLC of the full-size codewords and
           each fold merges in codewords whose size now matches; each round's
           Merkle tree commits the PRE-merge folded oracle;
        4. query phase opens every commitment at its own join level plus the
           per-round oracles (query_phase.rs:67 batch_prover_query_phase).
        """
        from ..utils import cached_jit
        from ..mle import mle as mle_mod
        from ..sumcheck import prover as sc_prover
        from ..sumcheck.virtual_poly import VirtualPoly

        nvs = [c.num_vars for c in cwws]
        n = max(len(p) for p in points)
        assert n == max(nvs)
        assert n <= self.max_num_vars
        num_rounds = n - self.spec.basecode_msg_size_log
        assert num_rounds >= 1
        for c in cwws:
            assert c.num_polys == 1 and not c.trivial
            assert c.num_vars > self.spec.basecode_msg_size_log, (
                "batch_open requires every codeword to join before the final "
                "round; commit polys of <= basecode vars trivially instead"
            )
        for e in evals:
            assert cwws[e.poly].num_vars == len(points[e.point]), (
                "each poly must be opened at a point of its own num_vars"
            )

        m = len(evals)
        eq_xt = _batch_coeffs(t, m)

        # ---- step 2: reduction sumcheck ---------------------------------
        sig = (tuple(nvs), tuple(len(p) for p in points),
               tuple(e.poly for e in evals), tuple(e.point for e in evals),
               self.spec, self.max_num_vars)

        def reduce_builder():
            def run(bhs, pts, vals, coeffs):
                nat = [ntt.bitrev(fops.to_ext(b[0])) for b in bhs]
                merged = []
                for pi, pt in enumerate(pts):
                    acc = None
                    for i, e in enumerate(evals):
                        if e.point != pi:
                            continue
                        term = gl2.mul(nat[e.poly],
                                       gl2.broadcast_to(coeffs[i], nat[e.poly].shape))
                        acc = term if acc is None else gl2.add(acc, term)
                    assert acc is not None, "every point must be used"
                    merged.append(acc)
                eqs = [mle_mod.eq_table(list(pt)) for pt in pts]
                target = gl2.zeros(())
                for i, e in enumerate(evals):
                    scale = gl2.const(1 << (n - len(pts[e.point])))
                    target = gl2.add(
                        target, gl2.mul(gl2.mul(vals[i], scale), coeffs[i])
                    )
                return merged, eqs, target

            return run

        merged, eqs, target = cached_jit(("bf_batch_reduce",) + sig, reduce_builder)(
            [c.bh_evals for c in cwws], [list(p) for p in points],
            [e.value for e in evals], eq_xt,
        )

        vp = VirtualPoly(n)
        for eq_p, m_p in zip(eqs, merged):
            vp.add_mle_list([eq_p, m_p])
        scproof, _final_evals, ts = sc_prover.prove(vp, t.ts)
        t.ts = ts
        challenges = list(scproof.point)

        # ---- step 3: FRI coefficients per commitment --------------------
        def coeff_builder():
            def run(chals, coeffs):
                eq_xy = [
                    mle_mod.eq_eval(chals[: len(pt)], list(pt)) for pt in points
                ]
                out = [gl2.zeros(()) for _ in cwws]
                for i, e in enumerate(evals):
                    out[e.poly] = gl2.add(
                        out[e.poly], gl2.mul(eq_xy[e.point], coeffs[i])
                    )
                return out

            return run

        fri_coeffs = cached_jit(("bf_batch_coeff",) + sig, coeff_builder)(
            challenges, eq_xt
        )

        # ---- batched FRI commit phase -----------------------------------
        num_rounds = n - self.spec.basecode_msg_size_log
        fold_tables = [
            self.code.fold_table(n + self.spec.rate_log - i - 1)
            for i in range(num_rounds)
        ]
        joins = {}  # round delta -> list of comm indices joining there
        for ci, nv in enumerate(nvs):
            joins.setdefault(n - nv, []).append(ci)

        def prep_builder():
            def run(bhs, cws, fcoeffs, chals):
                running = None
                for ci, b in enumerate(bhs):
                    nat = ntt.bitrev(fops.to_ext(b[0]))
                    ext = _tile(nat, 1 << (n - nvs[ci]))
                    term = gl2.mul(ext, gl2.broadcast_to(fcoeffs[ci], ext.shape))
                    running = term if running is None else gl2.add(running, term)
                running = ntt.bitrev(running)
                oracle = None
                for ci in joins.get(0, []):
                    term = gl2.mul(
                        fops.to_ext(cws[ci][0]),
                        gl2.broadcast_to(fcoeffs[ci], (cws[ci][0].shape[-1],)),
                    )
                    oracle = term if oracle is None else gl2.add(oracle, term)
                if oracle is None:
                    oracle = gl2.zeros((1 << (n + self.spec.rate_log),))
                eq = ntt.bitrev(mle_mod.eq_table(chals))
                eq = _interp_pairs(eq)
                running = _interp_pairs(running)
                msg = _pi_coeffs(running, eq)
                return oracle, eq, running, msg

            return run

        oracle, eq, running, msg = cached_jit(("bf_batch_prep",) + sig, prep_builder)(
            [c.bh_evals for c in cwws], [c.tree.polys for c in cwws],
            fri_coeffs, challenges,
        )

        msgs, roots, oracles_layers = [], [], []
        final_message = None
        for i in range(num_rounds):
            t.append_field_element_exts(msg)
            msgs.append(msg)
            r = t.get_and_append_challenge(b"commit round")
            x0, w = fold_tables[i]
            oracle = _fold_codeword(oracle, r, x0, w)
            if i < num_rounds - 1:
                eq, running, msg = _challenge_round(eq, running, r)
                layers = _build_layers_jit([oracle])
                oracles_layers.append((oracle, layers))
                root = layers[-1][:, 0]
                _write_digest(root, t)
                roots.append(root)
                # merge codewords whose size now matches (pre-merge tree!)
                join_cis = joins.get(i + 1, [])
                if join_cis:
                    oracle = _merge_codewords(
                        oracle, [cwws[ci].tree.polys[0] for ci in join_cis],
                        [fri_coeffs[ci] for ci in join_cis],
                    )
            else:
                final_message = _final_fold_jit(running, r)
                t.append_field_element_exts(final_message)

        # ---- query phase ------------------------------------------------
        q = self.spec.num_queries
        codeword_size = 1 << (n + self.spec.rate_log)
        indices = _sample_query_indices(t, q, codeword_size)
        idx_arr = jnp.asarray(indices, dtype=jnp.int32)

        def query_builder():
            def run(trees_polys, trees_inner, oracles, idx):
                comm_opens = []
                for ci in range(len(cwws)):
                    lvl_idx = idx >> (n - nvs[ci])
                    pairs = merkle.leaf_pairs(trees_polys[ci], lvl_idx)
                    comm_opens.append(CommQueryOpen(
                        pairs[0][0], pairs[0][1],
                        merkle.extract_paths(trees_inner[ci], lvl_idx),
                    ))
                oracle_vals, oracle_paths = [], []
                cur = idx >> 1
                for oracle_, layers in oracles:
                    pr = merkle.leaf_pairs([oracle_], cur)
                    oracle_vals.append((pr[0][0], pr[0][1]))
                    oracle_paths.append(merkle.extract_paths(layers, cur))
                    cur = cur >> 1
                return BatchedQueryOpens(comm_opens, oracle_vals, oracle_paths)

            return run

        opens = cached_jit(("bf_batch_query",) + sig + (q,), query_builder)(
            [c.tree.polys for c in cwws], [c.tree.inner for c in cwws],
            oracles_layers, idx_arr,
        )

        return BasefoldProof(
            list(msgs), list(roots), final_message, None, None, scproof, opens
        )

    def batch_verify(
        self,
        comms: List[BasefoldCommitment],
        points: List[List[Gl2]],
        evals: List[Evaluation],
        proof: BasefoldProof,
        t: tr.Transcript,
    ):
        """Returns on-device ok (basefold.rs:941-1072 batch_verify)."""
        from ..utils import cached_jit
        from ..mle import mle as mle_mod
        from ..sumcheck import verifier as sc_verifier

        nvs = [c.num_vars for c in comms]
        n = max(len(p) for p in points)
        assert n == max(nvs)
        num_rounds = n - self.spec.basecode_msg_size_log
        for e in evals:
            assert comms[e.poly].num_vars == len(points[e.point])
        for c in comms:
            assert c.num_polys == 1
            assert c.num_vars > self.spec.basecode_msg_size_log

        m = len(evals)
        eq_xt = _batch_coeffs(t, m)

        sig = (tuple(nvs), tuple(len(p) for p in points),
               tuple(e.poly for e in evals), tuple(e.point for e in evals),
               self.spec, self.max_num_vars)

        def target_builder():
            def run(vals, coeffs):
                target = gl2.zeros(())
                for i, e in enumerate(evals):
                    scale = gl2.const(1 << (n - len(points[e.point])))
                    target = gl2.add(
                        target, gl2.mul(gl2.mul(vals[i], scale), coeffs[i])
                    )
                return target

            return run

        target = cached_jit(("bf_batch_target",) + sig, target_builder)(
            [e.value for e in evals], eq_xt
        )

        subclaim, ts = sc_verifier.verify(target, proof.sumcheck_proof, n, 2, t.ts)
        t.ts = ts
        challenges = list(subclaim.point)

        def coeff_builder():
            def run(chals, coeffs):
                eq_xy = [
                    mle_mod.eq_eval(chals[: len(pt)], list(pt)) for pt in points
                ]
                out = [gl2.zeros(()) for _ in comms]
                for i, e in enumerate(evals):
                    out[e.poly] = gl2.add(
                        out[e.poly], gl2.mul(eq_xy[e.point], coeffs[i])
                    )
                return out

            return run

        fri_coeffs = cached_jit(("bf_batch_coeff",) + sig, coeff_builder)(
            challenges, eq_xt
        )

        # replay the FRI-round absorbs
        def replay_builder():
            def run(msgs, roots, final_message, ts_):
                t2 = tr.Transcript.__new__(tr.Transcript)
                t2.ts = ts_
                t2.field_appended_num = 0
                fold_challenges = []
                for i in range(num_rounds):
                    t2.append_field_element_exts(msgs[i])
                    fold_challenges.append(
                        t2.get_and_append_challenge(b"commit round")
                    )
                    if i < num_rounds - 1:
                        _write_digest(roots[i], t2)
                t2.append_field_element_exts(final_message)
                return fold_challenges, t2.ts

            return run

        fold_challenges, ts = cached_jit(("bf_batch_replay",) + sig, replay_builder)(
            list(proof.sumcheck_messages), list(proof.roots),
            proof.final_message, t.ts,
        )
        t.ts = ts

        q = self.spec.num_queries
        codeword_size = 1 << (n + self.spec.rate_log)
        indices = _sample_query_indices(t, q, codeword_size)
        idx_arr = jnp.asarray(indices, dtype=jnp.int32)

        fold_tables = [
            self.code.fold_table(n + self.spec.rate_log - i - 1)
            for i in range(num_rounds)
        ]
        joins = {}
        for ci, nv in enumerate(nvs):
            joins.setdefault(n - nv, []).append(ci)

        def check_builder():
            def run(roots_c, opens, msgs, roots, final_message, fcoeffs,
                    fchal, sc_expected, sc_ok, pt, tables, idx):
                fm = final_message if self._lr else ntt.bitrev(final_message)
                fm = ntt.interpolate_over_hypercube(fm)
                final_codeword = ntt.bitrev(self.code.encode(fm, use_jit=False))

                ok = jnp.asarray(sc_ok)
                # per-commitment Merkle checks at the join level
                for ci, co in enumerate(opens.comm_opens):
                    lvl_idx = idx >> (n - nvs[ci])
                    bottom = merkle.leaf_pair_digest(
                        _to_base_rows(co.left), _to_base_rows(co.right), 1
                    )
                    ok = ok & merkle.verify_paths(
                        roots_c[ci], lvl_idx, bottom, co.paths
                    )
                cur = idx >> 1
                for (lv, rv), paths, rt in zip(
                    opens.oracle_vals, opens.oracle_paths, roots
                ):
                    bottom = merkle.leaf_pair_digest(
                        _to_base_rows(lv), _to_base_rows(rv), 1
                    )
                    ok = ok & merkle.verify_paths(rt, cur, bottom, paths)
                    cur = cur >> 1

                # fold replay with per-round joins
                def join_vals(round_delta, side):
                    acc = None
                    for ci in joins.get(round_delta, []):
                        co = opens.comm_opens[ci]
                        v = fops.to_ext(co.left if side == 0 else co.right)
                        term = gl2.mul(v, gl2.broadcast_to(fcoeffs[ci], v.shape))
                        acc = term if acc is None else gl2.add(acc, term)
                    return acc

                curr_left = join_vals(0, 0)
                curr_right = join_vals(0, 1)
                zero_q = gl2.zeros((idx.shape[0],))
                if curr_left is None:
                    curr_left, curr_right = zero_q, zero_q
                index = idx
                for i in range(num_rounds):
                    x0_t, w_t = tables[i]
                    x0 = gl.take(x0_t, index >> 1)
                    w = gl.take(w_t, index >> 1)
                    r = fchal[i]
                    res = _interp2(curr_left, curr_right, x0, w, r)
                    next_index = index >> 1
                    if i < num_rounds - 1:
                        lv, rv = opens.oracle_vals[i]
                        nxt = fops.select(
                            (next_index & 1) == 0,
                            fops.to_ext(lv), fops.to_ext(rv),
                        )
                        ok = ok & jnp.all(gl2.eq(res, nxt))
                        curr_left, curr_right = fops.to_ext(lv), fops.to_ext(rv)
                        jl, jr = join_vals(i + 1, 0), join_vals(i + 1, 1)
                        if jl is not None:
                            curr_left = gl2.add(curr_left, jl)
                            curr_right = gl2.add(curr_right, jr)
                    else:
                        nxt = fops.take(final_codeword, next_index, axis=-1)
                        ok = ok & jnp.all(gl2.eq(res, nxt))
                    index = next_index

                # FRI sumcheck chain: starts at the reduction subclaim value
                ok = ok & jnp.all(gl2.eq(sc_expected, _deg2_zero_plus_one(msgs[0])))
                for i in range(num_rounds - 1):
                    lhs = _deg2_eval(msgs[i], fchal[i])
                    rhs = _deg2_zero_plus_one(msgs[i + 1])
                    ok = ok & jnp.all(gl2.eq(lhs, rhs))
                lhs = _deg2_eval(msgs[-1], fchal[-1])
                coeff = mle_mod.eq_eval(
                    pt[n - num_rounds:], list(reversed(fchal))
                )
                partial_eq = mle_mod.eq_table(pt[: n - num_rounds])
                partial_eq = gl2.mul(
                    partial_eq, gl2.broadcast_to(coeff, partial_eq.shape)
                )
                rhs = fops.sum_reduce(gl2.mul(final_message, partial_eq))
                ok = ok & jnp.all(gl2.eq(lhs, rhs))
                return ok

            return run

        return cached_jit(("bf_batch_check",) + sig + (q,), check_builder)(
            [c.root for c in comms], proof.batched_opens,
            list(proof.sumcheck_messages), list(proof.roots),
            proof.final_message, fri_coeffs, fold_challenges,
            subclaim.expected_evaluation, subclaim.ok, challenges,
            fold_tables, idx_arr,
        )

    # -- verify ----------------------------------------------------------------

    def simple_batch_verify(
        self,
        comm: BasefoldCommitment,
        point: List[Gl2],
        evals: List[Gl2],
        proof: BasefoldProof,
        t: tr.Transcript,
    ):
        """Returns an on-device ok bool; use `check` for one host sync."""
        num_vars = comm.num_vars
        m = comm.num_polys
        assert len(point) == num_vars and len(evals) == m

        from ..utils import cached_jit

        if proof.trivial_evals is not None:
            def trivial_builder():
                def run(trivial_evals, root, pt, evs):
                    layers = merkle.build_layers(list(trivial_evals))
                    ok = jnp.all(gl.eq(layers[-1][:, 0], root))
                    for p, e in zip(trivial_evals, evs):
                        got = mle_mod.evaluate(fops.to_ext(p), pt)
                        ok = ok & jnp.all(gl2.eq(got, e))
                    return ok

                return run

            return cached_jit(
                ("bf_verify_trivial", m, num_vars, comm.is_base), trivial_builder
            )(list(proof.trivial_evals), comm.root, point, evals)

        num_rounds = num_vars - self.spec.basecode_msg_size_log
        sig = (m, num_vars, comm.is_base, self.spec, self.max_num_vars)
        fold_tables = [
            self.code.fold_table(num_vars + self.spec.rate_log - i - 1)
            for i in range(num_rounds)
        ]

        def replay_builder():
            def run(msgs, roots, final_message, ts):
                t2 = tr.Transcript.__new__(tr.Transcript)
                t2.ts = ts
                t2.field_appended_num = 0
                batch_coeffs = _batch_coeffs(t2, m)
                fold_challenges = []
                for i in range(num_rounds):
                    t2.append_field_element_exts(msgs[i])
                    fold_challenges.append(
                        t2.get_and_append_challenge(b"commit round")
                    )
                    if i < num_rounds - 1:
                        _write_digest(roots[i], t2)
                t2.append_field_element_exts(final_message)
                return batch_coeffs, fold_challenges, t2.ts

            return run

        batch_coeffs, fold_challenges, ts = cached_jit(
            ("bf_verify1",) + sig, replay_builder
        )(list(proof.sumcheck_messages), list(proof.roots), proof.final_message, t.ts)
        t.ts = ts

        q = self.spec.num_queries
        codeword_size = 1 << (num_vars + self.spec.rate_log)
        indices = _sample_query_indices(t, q, codeword_size)
        idx_arr = jnp.asarray(indices, dtype=jnp.int32)

        def check_builder():
            def run(root, opens, msgs, roots, final_message, pt, evs,
                    bcoeffs, fchal, tables, idx):
                # re-encode the final message (verifier convention: [bitrev
                # if even-odd code] -> interpolate -> encode -> bitrev;
                # query_phase.rs:162-171)
                fm = final_message if self._lr else ntt.bitrev(final_message)
                fm = ntt.interpolate_over_hypercube(fm)
                final_codeword = ntt.bitrev(self.code.encode(fm, use_jit=False))

                ok = jnp.asarray(True)
                comm_bottom = merkle.leaf_pair_digest(
                    _to_base_rows(opens.comm_left),
                    _to_base_rows(opens.comm_right),
                    m,
                )
                ok = ok & merkle.verify_paths(root, idx, comm_bottom, opens.comm_paths)
                cur = idx >> 1
                for (lv, rv), paths, rt in zip(
                    opens.oracle_vals, opens.oracle_paths, roots
                ):
                    bottom = merkle.leaf_pair_digest(
                        _to_base_rows(lv), _to_base_rows(rv), 1
                    )
                    ok = ok & merkle.verify_paths(rt, cur, bottom, paths)
                    cur = cur >> 1

                # fold replay
                curr_left = _rlc_rows(opens.comm_left, bcoeffs)
                curr_right = _rlc_rows(opens.comm_right, bcoeffs)
                index = idx
                for i in range(num_rounds):
                    x0_t, w_t = tables[i]
                    x0 = gl.take(x0_t, index >> 1)
                    w = gl.take(w_t, index >> 1)
                    r = fchal[i]
                    res = _interp2(curr_left, curr_right, x0, w, r)
                    next_index = index >> 1
                    if i < num_rounds - 1:
                        lv, rv = opens.oracle_vals[i]
                        nxt = fops.select(
                            (next_index & 1) == 0,
                            fops.to_ext(lv),
                            fops.to_ext(rv),
                        )
                        curr_left, curr_right = fops.to_ext(lv), fops.to_ext(rv)
                    else:
                        nxt = fops.take(final_codeword, next_index, axis=-1)
                    ok = ok & jnp.all(gl2.eq(res, nxt))
                    index = next_index

                # sumcheck chain
                target = _inner(bcoeffs, gl2.stack(evs))
                ok = ok & jnp.all(gl2.eq(target, _deg2_zero_plus_one(msgs[0])))
                for i in range(num_rounds - 1):
                    lhs = _deg2_eval(msgs[i], fchal[i])
                    rhs = _deg2_zero_plus_one(msgs[i + 1])
                    ok = ok & jnp.all(gl2.eq(lhs, rhs))
                lhs = _deg2_eval(msgs[-1], fchal[-1])
                coeff = mle_mod.eq_eval(
                    pt[num_vars - num_rounds :], list(reversed(fchal))
                )
                partial_eq = mle_mod.eq_table(pt[: num_vars - num_rounds])
                partial_eq = gl2.mul(
                    partial_eq, gl2.broadcast_to(coeff, partial_eq.shape)
                )
                rhs = fops.sum_reduce(gl2.mul(final_message, partial_eq))
                ok = ok & jnp.all(gl2.eq(lhs, rhs))
                return ok

            return run

        return cached_jit(("bf_verify2",) + sig + (q,), check_builder)(
            comm.root,
            proof.query_opens,
            list(proof.sumcheck_messages),
            list(proof.roots),
            proof.final_message,
            point,
            evals,
            batch_coeffs,
            fold_challenges,
            fold_tables,
            idx_arr,
        )


def check(ok) -> None:
    if not bool(np.asarray(jax.device_get(ok))):
        raise ValueError("basefold verification failed")


# ---------------------------------------------------------------------------
# Kernels / helpers
# ---------------------------------------------------------------------------


def _len(p) -> int:
    return p.lo.shape[-1] if isinstance(p, Gl) else p.c0.lo.shape[-1]


def _batch_coeffs(t: tr.Transcript, m: int) -> Gl2:
    """eq(X, t) restricted to the first m entries (basefold.rs:744-760)."""
    batch_size_log = (m - 1).bit_length() if m > 1 else 0
    ts = [t.get_and_append_challenge(b"batch coeffs") for _ in range(batch_size_log)]
    if not ts:
        return gl2.ones((1,))
    table = mle_mod.eq_table(ts)
    return table[:m]


def _rlc(polys: List, coeffs: Gl2) -> Gl2:
    acc = None
    for i, p in enumerate(polys):
        term = fops.mul(fops.to_ext(p), coeffs[i])
        acc = term if acc is None else gl2.add(acc, term)
    return acc


def _rlc_rows(mat, coeffs: Gl2) -> Gl2:
    """(m, q) values -> (q,) RLC."""
    m = mat.lo.shape[0] if isinstance(mat, Gl) else mat.c0.lo.shape[0]
    acc = None
    for i in range(m):
        term = fops.mul(fops.to_ext(mat[i]), coeffs[i])
        acc = term if acc is None else gl2.add(acc, term)
    return acc


def _to_base_rows(v) -> Gl:
    """Leaf columns for hashing: (rows, q) base matrix."""
    return merkle.to_base_matrix(v)[0]


def _tile(v, times: int):
    """Natural-order extension by high-var repetition: out[x] = v[x mod L]."""
    if times == 1:
        return v

    def t2(x):
        return jnp.tile(x, times)

    if isinstance(v, Gl):
        return Gl(t2(v.lo), t2(v.hi))
    return Gl2(
        Gl(t2(v.c0.lo), t2(v.c0.hi)), Gl(t2(v.c1.lo), t2(v.c1.hi))
    )


_MERGE_KERNELS = {}


def _merge_codewords(oracle: Gl2, codewords: List, coeffs: List[Gl2]) -> Gl2:
    """oracle += sum_i coeffs[i] * codewords[i] (commit_phase.rs:288-300)."""
    key = (oracle.c0.lo.shape, tuple(isinstance(c, Gl2) for c in codewords))
    if key not in _MERGE_KERNELS:

        def go(o, cws, cs):
            for cw, c in zip(cws, cs):
                v = fops.to_ext(cw)
                o = gl2.add(o, gl2.mul(v, gl2.broadcast_to(c, v.shape)))
            return o

        _MERGE_KERNELS[key] = jax.jit(go)
    return _MERGE_KERNELS[key](oracle, codewords, coeffs)


def _interp_pairs(v):
    """[v0, v1] -> [v0, v1 - v0] per adjacent pair (one_level_interp_hc)."""
    even, odd = fops.deinterleave(v)
    d = fops.sub(odd, even)
    return _interleave(even, d)


def _interleave(a, b):
    def il(x, y):
        return jnp.stack([x, y], axis=-1).reshape(x.shape[:-1] + (-1,))

    if isinstance(a, Gl):
        return Gl(il(a.lo, b.lo), il(a.hi, b.hi))
    return Gl2(
        Gl(il(a.c0.lo, b.c0.lo), il(a.c0.hi, b.c0.hi)),
        Gl(il(a.c1.lo, b.c1.lo), il(a.c1.hi, b.c1.hi)),
    )


def _fold_pairs(v, r: Gl2):
    """[c0, c1] pairs -> c0 + r*c1 (one_level_eval_hc)."""
    c0, c1 = fops.deinterleave(v)
    return fops.add(fops.to_ext(c0), fops.mul(fops.to_ext(c1), r))


def _pi_coeffs(evals, eq) -> Gl2:
    """Degree-2 round message in coefficient form (parallel_pi)."""
    e0, e1 = fops.deinterleave(evals)
    q0, q1 = fops.deinterleave(eq)
    c0 = fops.sum_reduce(fops.mul(e0, q0))
    c1 = fops.sum_reduce(fops.add(fops.mul(e1, q0), fops.mul(e0, q1)))
    c2 = fops.sum_reduce(fops.mul(e1, q1))
    return gl2.stack([fops.to_ext(c0), fops.to_ext(c1), fops.to_ext(c2)])


def _build_layers_jit(polys):
    from ..utils import cached_jit

    key = tuple(
        (isinstance(p, Gl2), p.lo.shape if isinstance(p, Gl) else p.c0.lo.shape)
        for p in polys
    )
    return cached_jit(("merkle_layers", key), lambda: lambda ps: merkle.build_layers(ps))(
        list(polys)
    )


def _final_fold_jit(running: Gl2, r: Gl2) -> Gl2:
    from ..utils import cached_jit

    key = ("bf_final_fold", running.c0.lo.shape)
    return cached_jit(key, lambda: lambda v, c: ntt.bitrev(_fold_pairs(v, c)))(running, r)


_CHALLENGE_ROUND_KERNELS = {}


def _challenge_round(eq: Gl2, running: Gl2, r: Gl2):
    """fold both at r, re-interp, emit next message (sum_check_challenge_round)."""
    key = eq.c0.lo.shape
    if key not in _CHALLENGE_ROUND_KERNELS:

        def go(eq_, run_, r_):
            eq2 = _interp_pairs(_fold_pairs(eq_, r_))
            run2 = _interp_pairs(_fold_pairs(run_, r_))
            return eq2, run2, _pi_coeffs(run2, eq2)

        _CHALLENGE_ROUND_KERNELS[key] = jax.jit(go)
    return _CHALLENGE_ROUND_KERNELS[key](eq, running, r)


_FOLD_CW_KERNELS = {}


def _fold_codeword(oracle: Gl2, r: Gl2, x0: Gl, w: Gl) -> Gl2:
    """new[i] = y0 + (r - x0)*(y1 - y0)*w (basefold_one_round_by_...weights)."""
    key = (oracle.c0.lo.shape, True)
    if key not in _FOLD_CW_KERNELS:

        def go(o, r_, x0_, w_):
            y0, y1 = fops.deinterleave(o)
            return _interp2(y0, y1, x0_, w_, r_)

        _FOLD_CW_KERNELS[key] = jax.jit(go)
    return _FOLD_CW_KERNELS[key](oracle, r, x0, w)


def _interp2(y0, y1, x0: Gl, w: Gl, r: Gl2) -> Gl2:
    """interpolate2_weights: y0 + (r - x0) * (y1 - y0) * w (jnp broadcast)."""
    y0 = fops.to_ext(y0)
    y1 = fops.to_ext(y1)
    dx = gl2.sub(gl2.broadcast_to(r, x0.lo.shape) if r.shape != x0.lo.shape else r,
                 gl2.from_base(x0))
    return gl2.add(y0, gl2.mul(gl2.mul(dx, gl2.sub(y1, y0)), gl2.from_base(w)))


def _deg2_zero_plus_one(msg: Gl2) -> Gl2:
    return gl2.add(gl2.add(msg[0], msg[0]), gl2.add(msg[1], msg[2]))


def _deg2_eval(msg: Gl2, x: Gl2) -> Gl2:
    return gl2.add(msg[0], gl2.mul(x, gl2.add(msg[1], gl2.mul(x, msg[2]))))


def _inner(a: Gl2, b: Gl2) -> Gl2:
    return fops.sum_reduce(gl2.mul(a, b))


def _write_digest(d: Gl, t: tr.Transcript) -> None:
    for i in range(4):
        t.append_field_elements(d[i : i + 1])


_QUERY_KERNELS = {}


def _sample_query_indices(t: tr.Transcript, q: int, codeword_size: int) -> np.ndarray:
    """q challenges via b"query indices" labels; index = first base coeff
    mod codeword size (query_phase.rs:31-60).  One scan kernel + one sync."""
    label = tr.bytes_to_field_elements(b"query indices")
    k = len(label)
    if (q, k) not in _QUERY_KERNELS:

        def go(state):
            lab = gl.from_u64(label)

            def body(st, _):
                st2 = Gl(
                    jnp.concatenate([lab.lo, st.lo[k:]]),
                    jnp.concatenate([lab.hi, st.hi[k:]]),
                )
                st2 = poseidon.permute(st2)
                return st2, (st2.lo[0], st2.hi[0])

            st, (los, his) = jax.lax.scan(body, state, None, length=q)
            return st, los, his

        _QUERY_KERNELS[(q, k)] = jax.jit(go)
    st, los, his = _QUERY_KERNELS[(q, k)](t.ts.state)
    t.ts = tr.TranscriptState(st)
    t.field_appended_num += k * q
    vals = np.asarray(jax.device_get(los), dtype=np.uint64) | (
        np.asarray(jax.device_get(his), dtype=np.uint64) << np.uint64(32)
    )
    return (vals % np.uint64(codeword_size)).astype(np.int64)
