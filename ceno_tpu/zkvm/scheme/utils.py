"""Scheme-level witness manipulation, TPU-vectorized.

Mirrors /root/reference/ceno_zkvm/src/scheme/utils.rs:
* `interleave_records` = interleaving_mles_to_mles (utils.rs:28): per-instance
  record slots land in the LOW index bits, instances split contiguously into
  the fanin halves, padding slots/instances get `default`;
* `infer_tower_product_witness` (utils.rs:200): layer above = elementwise
  product over contiguous halves;
* `infer_tower_logup_witness` (utils.rs:109): fraction addition
  p' = p1 q2 + p2 q1 (or q1 + q2 at the input layer), q' = q1 q2.

All loops are whole-array jnp ops; a full tower inference is log2(n) fused
kernels with geometrically shrinking work.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp

from ...field import fops, gl, gl2
from ...field.gl import Gl
from ...field.gl2 import Gl2
from ...transcript import basic as tr


def ceil_log2(x: int) -> int:
    assert x > 0
    return (x - 1).bit_length()


def next_pow2_instance_padding(n: int) -> int:
    """Minimum 2 (utils.rs:187-189): the NUM_FANIN=2 tower interleave always
    introduces an instance axis of at least one bit."""
    return max(2, 1 << ceil_log2(max(n, 1)))


def get_challenge_pows(n: int, t: tr.Transcript) -> List[Gl2]:
    """[1, a, ..., a^(n-1)] with a = challenge(b"combine subset evals");
    one jitted kernel per n (utils.rs:62-77)."""
    from ...utils import cached_jit

    def builder():
        def run(ts):
            ts2, alpha = tr.get_and_append_challenge(ts, b"combine subset evals")
            out = [gl2.ones(())]
            for _ in range(n - 1):
                out.append(gl2.mul(out[-1], alpha))
            return out, ts2

        return run

    pows, ts2 = cached_jit(("challenge_pows", n), builder)(t.ts)
    t.ts = ts2
    return list(pows)


def interleave_records(
    mles: Sequence[Gl2], num_instances: int, num_limbs: int, default: Gl2
) -> List[Gl2]:
    """k record MLEs (each len N = next_pow2(num_instances)) -> num_limbs
    arrays of len 2^ceil_log2(k) * N / num_limbs with record slots in the low
    bits; pad slots and invalid instances filled with `default`."""
    k = len(mles)
    assert k > 0
    N = mles[0].c0.lo.shape[0]
    k_pad = 1 << ceil_log2(k)
    stacked = gl2.stack(list(mles), axis=1)  # (N, k)
    if k_pad > k:
        pad = gl2.broadcast_to(default.reshape(1, 1), (N, k_pad - k))
        stacked = gl2.concat([stacked, pad], axis=1)
    if num_instances < N:
        mask = (jnp.arange(N) < num_instances)[:, None]
        stacked = gl2.select(
            jnp.broadcast_to(mask, (N, k_pad)),
            stacked,
            gl2.broadcast_to(default.reshape(1, 1), (N, k_pad)),
        )
    flat = stacked.reshape(N * k_pad)
    if N == 1:
        # single instance: fanin 0 holds it, other fanins are pure padding
        # (utils.rs:43 `per_fanin_len = (len / num_limbs).max(1)`)
        pad = gl2.broadcast_to(default.reshape(1), (k_pad,))
        return [flat] + [pad] * (num_limbs - 1)
    per = (N // num_limbs) * k_pad
    return [flat[i * per : (i + 1) * per] for i in range(num_limbs)]


def infer_tower_product_witness(
    num_vars: int, last_layer: List[Gl2], num_fanin: int = 2
) -> List[List[Gl2]]:
    """layers[0] = output pair (size 1) ... layers[-1] = last_layer."""
    assert len(last_layer) == num_fanin == 2
    layers = [last_layer]
    for _ in range(num_vars - 1):
        nxt = layers[-1]
        half = nxt[0].c0.lo.shape[0] // 2
        prod = gl2.mul(nxt[0], nxt[1])  # elementwise both fanins
        layers.append([prod[:half], prod[half:]])
    layers.reverse()
    return layers


def infer_tower_logup_witness(
    q_last: List[Gl2], p_last: Optional[List[Gl2]] = None
) -> List[List[Gl2]]:
    """layers of [p1, p2, q1, q2]; input layer p defaults to all-ones."""
    assert len(q_last) == 2
    num_vars = ceil_log2(q_last[0].c0.lo.shape[0])
    acc: List[Tuple[Optional[List[Gl2]], List[Gl2]]] = [(p_last, q_last)]
    for _ in range(num_vars):
        p, q = acc[-1]
        q1, q2 = q
        half = q1.c0.lo.shape[0] // 2
        if p is not None:
            p1, p2 = p
            p_new = gl2.add(gl2.mul(q1, p2), gl2.mul(q2, p1))
        else:
            p_new = gl2.add(q1, q2)
        q_new = gl2.mul(q1, q2)
        acc.append(
            ([p_new[:half], p_new[half:]], [q_new[:half], q_new[half:]])
        )
    acc.reverse()
    out = []
    for p, q in acc:
        if p is None:
            n = q[0].c0.lo.shape[0]
            p = [gl2.ones((n,)), gl2.ones((n,))]
        out.append([p[0], p[1], q[0], q[1]])
    return out


def eq_eval_less_or_equal_than(
    max_idx: int, a: List[Gl2], b: List[Gl2]
) -> Gl2:
    """sel evaluation: sum_{t <= max_idx} eq(a,t) eq(b,t) in closed form
    (/root/reference/ceno_zkvm/src/utils.rs:111-151)."""
    assert len(a) >= len(b)
    one = gl2.ones(())
    rp = [one]
    for i in range(len(b)):
        x = gl2.mul(a[i], b[i])
        y = gl2.mul(gl2.sub(one, a[i]), gl2.sub(one, b[i]))
        rp.append(gl2.mul(rp[i], gl2.add(x, y)))
    rp2 = [None] * (len(b) + 1)
    rp2[len(b)] = one
    for i in range(len(b) - 1, -1, -1):
        bit = (max_idx >> i) & 1
        if bit:
            term = gl2.mul(a[i], b[i])
        else:
            term = gl2.mul(gl2.sub(one, a[i]), gl2.sub(one, b[i]))
        rp2[i] = gl2.mul(rp2[i + 1], term)
    ans = rp[len(b)]
    for i in range(len(b)):
        if (max_idx >> i) & 1:
            continue
        ans = gl2.sub(ans, gl2.mul(gl2.mul(rp[i], rp2[i + 1]), gl2.mul(a[i], b[i])))
    for v in a[len(b):]:
        ans = gl2.mul(ans, gl2.sub(one, v))
    return ans


def splice_selector(eq_vec: Gl2, num_instances: int) -> Gl2:
    """eq table with entries >= num_instances zeroed (prover.rs:450-498)."""
    n = eq_vec.c0.lo.shape[0]
    if num_instances >= n:
        return eq_vec
    mask = jnp.arange(n) < num_instances
    return gl2.select(mask, eq_vec, gl2.zeros((n,)))
