"""Tower prover/verifier round trips over synthetic product and logup trees
(mirrors scheme-level tests in /root/reference/ceno_zkvm/src/scheme/tests.rs)."""

import jax
import numpy as np

from ceno_tpu.field import fops, gl, gl2
from ceno_tpu.mle import mle as mle_mod
from ceno_tpu.transcript import basic as tr
from ceno_tpu.zkvm.scheme.tower import prove_tower, verify_tower
from ceno_tpu.zkvm.scheme.utils import (
    infer_tower_logup_witness,
    infer_tower_product_witness,
    interleave_records,
)

P = gl.P


def rand_gl2(rng, shape):
    return gl2.from_u64(
        rng.integers(0, P, size=shape, dtype=np.uint64),
        rng.integers(0, P, size=shape, dtype=np.uint64),
    )


def test_product_tower_inference():
    rng = np.random.default_rng(5)
    n = 3
    last = [rand_gl2(rng, 1 << (n - 1)), rand_gl2(rng, 1 << (n - 1))]
    layers = infer_tower_product_witness(n, last)
    assert len(layers) == n
    # root pair product == product of all last-layer values
    r0 = gl2.to_u64(gl2.mul(layers[0][0][0], layers[0][1][0]))
    vals = np.concatenate([gl2.to_u64(last[0]), gl2.to_u64(last[1])], axis=0)
    # big-int product in ext field
    def ext_mul(a, b):
        c0 = (a[0] * b[0] + 7 * a[1] * b[1]) % P
        c1 = (a[0] * b[1] + a[1] * b[0]) % P
        return (c0, c1)

    acc = (1, 0)
    for v in vals:
        acc = ext_mul(acc, (int(v[0]), int(v[1])))
    assert (int(r0[0]), int(r0[1])) == acc


def test_tower_prove_verify_product_and_logup():
    rng = np.random.default_rng(6)
    n = 4
    r_last = [rand_gl2(rng, 1 << (n - 1)), rand_gl2(rng, 1 << (n - 1))]
    w_last = [rand_gl2(rng, 1 << (n - 1)), rand_gl2(rng, 1 << (n - 1))]
    q_last = [rand_gl2(rng, 1 << (n - 1)), rand_gl2(rng, 1 << (n - 1))]

    r_layers = infer_tower_product_witness(n, r_last)
    w_layers = infer_tower_product_witness(n, w_last)
    lk_layers = infer_tower_logup_witness(q_last)

    t = tr.Transcript(b"tower")
    rt, proofs = prove_tower([r_layers, w_layers], [lk_layers], t)

    prod_out = [
        [r_layers[0][0][0], r_layers[0][1][0]],
        [w_layers[0][0][0], w_layers[0][1][0]],
    ]
    lk0 = lk_layers[0]
    logup_out = [[lk0[0][0], lk0[1][0], lk0[2][0], lk0[3][0]]]

    tv = tr.Transcript(b"tower")
    out = verify_tower(prod_out, logup_out, proofs, [n, n, n], tv)
    assert bool(jax.device_get(out.ok))

    # the final claims must equal direct evaluations of the last layers
    checks = []
    for (pt, ev), last in zip(out.prod_point_and_eval, [r_last, w_last]):
        merged = gl2.concat(last)  # fanin index = top variable
        want = mle_mod.evaluate(merged, pt)
        checks.append((want, ev))
    (pt_p, ev_p) = out.logup_p_point_and_eval[0]
    (pt_q, ev_q) = out.logup_q_point_and_eval[0]
    p_last = lk_layers[-1][0:2]
    want_p = mle_mod.evaluate(gl2.concat(p_last), pt_p)
    want_q = mle_mod.evaluate(gl2.concat(lk_layers[-1][2:4]), pt_q)
    checks += [(want_p, ev_p), (want_q, ev_q)]

    import jax.numpy as jnp

    acc = jnp.asarray(True)
    for a, b in checks:
        acc = acc & jnp.all(gl2.eq(a, b))
    assert bool(jax.device_get(acc))


def test_tower_rejects_tampered_out_evals():
    rng = np.random.default_rng(8)
    n = 3
    last = [rand_gl2(rng, 1 << (n - 1)), rand_gl2(rng, 1 << (n - 1))]
    layers = infer_tower_product_witness(n, last)
    t = tr.Transcript(b"t2")
    rt, proofs = prove_tower([layers], [], t)
    bad_out = [[gl2.add(layers[0][0][0], gl2.ones(())), layers[0][1][0]]]
    tv = tr.Transcript(b"t2")
    out = verify_tower(bad_out, [], proofs, [n], tv)
    assert not bool(jax.device_get(out.ok))


def test_interleave_records():
    rng = np.random.default_rng(9)
    N, k = 4, 3
    mles = [rand_gl2(rng, N) for _ in range(k)]
    num_instances = 3
    default = gl2.const(1)
    out = interleave_records(mles, num_instances, 2, default)
    assert len(out) == 2 and out[0].c0.lo.shape[0] == 8  # 4 slots * 2 inst
    got = [gl2.to_u64(o) for o in out]
    for fanin in range(2):
        for inst in range(2):
            g_inst = fanin * 2 + inst
            for slot in range(4):
                v = got[fanin][inst * 4 + slot]
                if g_inst < num_instances and slot < k:
                    want = gl2.to_u64(mles[slot][g_inst])
                    assert np.array_equal(v, want), (fanin, inst, slot)
                else:
                    assert v[0] == 1 and v[1] == 0, (fanin, inst, slot)
