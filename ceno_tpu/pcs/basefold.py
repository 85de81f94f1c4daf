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


class BasefoldProof(NamedTuple):
    sumcheck_messages: List[Gl2]  # per round: (3,) coefficient-form
    roots: List[Gl]  # num_rounds-1 digests
    final_message: Optional[Gl2]  # (2^basecode,) little-endian evals
    query_opens: Optional[QueryOpens]
    trivial_evals: Optional[List]  # full bh evals for trivial commitments


class Basefold:
    """PCS instance for a fixed spec and maximum message size."""

    def __init__(self, spec: RSSpec = RSSpec(), max_num_vars: int = 24):
        self.spec = spec
        self.max_num_vars = max_num_vars
        self.code = RSCode(spec, max_num_vars)

    # -- commit ------------------------------------------------------------

    def commit(self, polys: List) -> BasefoldCommitmentWithWitness:
        """Batch-commit polys of equal num_vars (reference batch_commit)."""
        if not isinstance(polys, (list, tuple)):
            polys = [polys]
        n = _len(polys[0])
        num_vars = n.bit_length() - 1
        assert num_vars <= self.max_num_vars, "poly too big"
        for p in polys:
            assert _len(p) == n
        is_base = isinstance(polys[0], Gl)

        if num_vars <= self.spec.basecode_msg_size_log:
            tree = merkle.MerkleTree(list(polys))
            return BasefoldCommitmentWithWitness(
                tree, list(polys), num_vars, is_base, True
            )

        codewords = [self._encode_poly(p) for p in polys]
        tree = merkle.MerkleTree(codewords)
        bh = [ntt.bitrev(p) for p in polys]
        return BasefoldCommitmentWithWitness(tree, bh, num_vars, is_base, False)

    def _encode_poly(self, evals):
        """interpolate -> bitrev -> encode -> bitrev (basefold.rs:110-156)."""
        coeffs = ntt.interpolate_jit(evals)
        coeffs = ntt.bitrev(coeffs)
        cw = self.code.encode(coeffs)
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

        num_rounds = num_vars - self.spec.basecode_msg_size_log

        batch_coeffs = _batch_coeffs(t, m)
        oracle = cww.tree.batch_leaves(batch_coeffs)  # RLC codeword (bitrev)
        running = _rlc(cww.bh_evals, batch_coeffs)  # RLC bh evals (bitrev)

        eq = mle_mod.eq_table(point)
        eq = ntt.bitrev(eq)

        eq = _interp_pairs(eq)
        running = _interp_pairs(running)
        msg = _pi_coeffs(running, eq)

        msgs: List[Gl2] = []
        roots: List[Gl] = []
        trees: List[merkle.MerkleTree] = []
        final_message = None

        for i in range(num_rounds):
            t.append_field_element_exts(msg)
            msgs.append(msg)
            r = t.get_and_append_challenge(b"commit round")

            level = (oracle.c0.lo.shape[0].bit_length() - 1) - 1
            x0, w = self.code.fold_table(level)
            oracle = _fold_codeword(oracle, r, x0, w)

            if i < num_rounds - 1:
                eq, running, msg = _challenge_round(eq, running, r)
                tree = merkle.MerkleTree([oracle])
                trees.append(tree)
                root = tree.root()
                _write_digest(root, t)
                roots.append(root)
            else:
                running = _fold_pairs(running, r)
                final_message = ntt.bitrev(running)
                t.append_field_element_exts(final_message)

        # query phase
        q = self.spec.num_queries
        codeword_size = 1 << (num_vars + self.spec.rate_log)
        indices = _sample_query_indices(t, q, codeword_size)

        pairs = cww.tree.leaf_pairs(indices)
        comm_left = fops.stack([p[0] for p in pairs], axis=0)
        comm_right = fops.stack([p[1] for p in pairs], axis=0)
        comm_paths = cww.tree.paths(indices)
        oracle_vals = []
        oracle_paths = []
        idx = indices >> 1
        for tree in trees:
            pr = tree.leaf_pairs(idx)
            oracle_vals.append((pr[0][0], pr[0][1]))
            oracle_paths.append(tree.paths(idx))
            idx = idx >> 1

        return BasefoldProof(
            msgs,
            roots,
            final_message,
            QueryOpens(comm_left, comm_right, comm_paths, oracle_vals, oracle_paths),
            None,
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

        if proof.trivial_evals is not None:
            tree = merkle.MerkleTree(list(proof.trivial_evals))
            ok = jnp.all(gl.eq(tree.root(), comm.root))
            # also check the claimed evaluations against the shipped polys
            for p, e in zip(proof.trivial_evals, evals):
                got = mle_mod.evaluate(fops.to_ext(p), point)
                ok = ok & jnp.all(gl2.eq(got, e))
            return ok

        num_rounds = num_vars - self.spec.basecode_msg_size_log
        batch_coeffs = _batch_coeffs(t, m)

        fold_challenges: List[Gl2] = []
        for i in range(num_rounds):
            t.append_field_element_exts(proof.sumcheck_messages[i])
            fold_challenges.append(t.get_and_append_challenge(b"commit round"))
            if i < num_rounds - 1:
                _write_digest(proof.roots[i], t)
        t.append_field_element_exts(proof.final_message)

        q = self.spec.num_queries
        codeword_size = 1 << (num_vars + self.spec.rate_log)
        indices = _sample_query_indices(t, q, codeword_size)

        # re-encode the final message (verifier convention: bitrev ->
        # interpolate -> encode -> bitrev; query_phase.rs:1349-1371)
        fm = ntt.bitrev(proof.final_message)
        fm = ntt.interpolate_jit(fm)
        final_codeword = ntt.bitrev(self.code.encode(fm))

        ok = jnp.asarray(True)

        # ---- query chains (batched over the q axis) ----------------------
        opens = proof.query_opens
        # Merkle path checks
        comm_bottom = merkle.leaf_pair_digest(
            _to_base_rows(opens.comm_left), _to_base_rows(opens.comm_right), m
        )
        ok = ok & merkle.verify_paths(comm.root, indices, comm_bottom, opens.comm_paths)
        idx = indices >> 1
        for i, ((lv, rv), paths, root) in enumerate(
            zip(opens.oracle_vals, opens.oracle_paths, proof.roots)
        ):
            bottom = merkle.leaf_pair_digest(
                _to_base_rows(lv), _to_base_rows(rv), 1
            )
            ok = ok & merkle.verify_paths(root, idx, bottom, paths)
            idx = idx >> 1

        # fold replay
        curr_left = _rlc_rows(opens.comm_left, batch_coeffs)
        curr_right = _rlc_rows(opens.comm_right, batch_coeffs)
        index = indices.copy()
        fc_np = None
        for i in range(num_rounds):
            level = num_vars + self.spec.rate_log - i - 1
            x0, w = self.code.fold_gather(level, index >> 1)
            r = fold_challenges[i]
            res = _interp2(curr_left, curr_right, x0, w, r)
            next_index = index >> 1
            if i < num_rounds - 1:
                lv, rv = opens.oracle_vals[i]
                nxt = fops.select(
                    jnp.asarray((next_index & 1) == 0),
                    fops.to_ext(lv),
                    fops.to_ext(rv),
                )
                curr_left, curr_right = fops.to_ext(lv), fops.to_ext(rv)
            else:
                nxt = fops.take(final_codeword, jnp.asarray(next_index), axis=-1)
            ok = ok & jnp.all(gl2.eq(res, nxt))
            index = next_index

        # ---- sumcheck chain ----------------------------------------------
        target = _inner(batch_coeffs, gl2.stack(evals))
        ok = ok & jnp.all(gl2.eq(target, _deg2_zero_plus_one(proof.sumcheck_messages[0])))
        for i in range(num_rounds - 1):
            lhs = _deg2_eval(proof.sumcheck_messages[i], fold_challenges[i])
            rhs = _deg2_zero_plus_one(proof.sumcheck_messages[i + 1])
            ok = ok & jnp.all(gl2.eq(lhs, rhs))
        # last: p(r) == <final_message, partial_eq>
        lhs = _deg2_eval(proof.sumcheck_messages[-1], fold_challenges[-1])
        coeff = mle_mod.eq_eval(
            point[num_vars - num_rounds :], list(reversed(fold_challenges))
        )
        partial_eq = mle_mod.eq_table(point[: num_vars - num_rounds])
        partial_eq = gl2.mul(partial_eq, gl2.broadcast_to(coeff, partial_eq.shape))
        rhs = fops.sum_reduce(gl2.mul(proof.final_message, partial_eq))
        ok = ok & jnp.all(gl2.eq(lhs, rhs))
        return ok


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


def _interp_pairs(v):
    """[v0, v1] -> [v0, v1 - v0] per adjacent pair (one_level_interp_hc)."""
    even = v[..., 0::2]
    odd = v[..., 1::2]
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
    c0 = v[..., 0::2]
    c1 = v[..., 1::2]
    return fops.add(fops.to_ext(c0), fops.mul(fops.to_ext(c1), r))


def _pi_coeffs(evals, eq) -> Gl2:
    """Degree-2 round message in coefficient form (parallel_pi)."""
    e0, e1 = evals[..., 0::2], evals[..., 1::2]
    q0, q1 = eq[..., 0::2], eq[..., 1::2]
    c0 = fops.sum_reduce(fops.mul(e0, q0))
    c1 = fops.sum_reduce(fops.add(fops.mul(e1, q0), fops.mul(e0, q1)))
    c2 = fops.sum_reduce(fops.mul(e1, q1))
    return gl2.stack([fops.to_ext(c0), fops.to_ext(c1), fops.to_ext(c2)])


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
            y0 = o[..., 0::2]
            y1 = o[..., 1::2]
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
