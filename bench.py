"""Benchmark entry (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current flagship workload: devirgo sumcheck prove over a degree-3 product of
three 2^20-entry Goldilocks MLEs (the reference's devirgo_sumcheck bench
shape, sumcheck/benches/devirgo_sumcheck.rs:24-41, scaled to fit round time).
vs_baseline compares against the single-threaded-CPU-equivalent op rate
recorded in BASELINE.json targets (>= 10x per chip is the target; the
reference publishes no absolute numbers, BASELINE.md).
"""

import json
import time

import numpy as np


def bench_fibonacci(n=32):
    """Fibonacci guest e2e prove (the reference's headline workload,
    ceno_zkvm/benches/fibonacci.rs). Prints prove seconds + steps/s."""
    import jax

    from ceno_tpu.emul.insn import InsnKind as K
    from ceno_tpu.emul.programs import fib, fibonacci_program
    from ceno_tpu.pcs import RSSpec
    from ceno_tpu.zkvm.e2e import Checkpoint, run_e2e_with_checkpoint

    program = fibonacci_program(n)
    kinds = (K.ADD, K.ADDI, K.BEQ, K.JAL, K.ECALL)
    spec = RSSpec()  # production parameters: 200 queries, rate 1/2
    res = run_e2e_with_checkpoint(
        program, max_steps=1 << 20, checkpoint=Checkpoint.COMPLETE,
        spec=spec, kinds=kinds,
    )
    assert res.verified is True and res.exit_code == fib(n)
    from ceno_tpu.zkvm.stats import proof_size_bytes

    dt = res.timings["prove"]
    print(json.dumps({
        "metric": f"fibonacci_n{n}_e2e_prove",
        "value": round(res.steps / dt, 1),
        "unit": "steps/s",
        "vs_baseline": round(dt, 3),
        "proof_bytes": proof_size_bytes(res.proof),
        "timings": {k: round(v, 2) for k, v in res.timings.items()},
    }))


def main():
    import sys

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if "--fib" in sys.argv:
        idx = sys.argv.index("--fib")
        n = int(sys.argv[idx + 1]) if len(sys.argv) > idx + 1 else 32
        return bench_fibonacci(n)

    from ceno_tpu.field import gl
    from ceno_tpu.sumcheck import VirtualPoly, prove
    from ceno_tpu.transcript import basic as tr

    num_vars = 20
    degree = 3
    rng = np.random.default_rng(0)
    vp = VirtualPoly(num_vars)
    mles = [
        gl.from_u64(rng.integers(0, gl.P, size=1 << num_vars, dtype=np.uint64))
        for _ in range(degree)
    ]
    vp.add_mle_list(mles, coeff=7)

    # warmup (compile)
    proof, _, _ = prove(vp, tr.new(b"bench"))
    jax.block_until_ready(proof.round_evals[-1].c0.lo)

    runs = 3
    t0 = time.time()
    for _ in range(runs):
        proof, _, _ = prove(vp, tr.new(b"bench"))
        jax.block_until_ready(proof.round_evals[-1].c0.lo)
    dt = (time.time() - t0) / runs

    # field-mul count of the round kernels: per round at size L: 3 MLE folds
    # (1 ext-base mul each ~ 2 base muls) + 4 eval points * 2 muls each over
    # L/2 pairs ~ 14 * L/2 base muls; sum over rounds ~ 14 * 2^num_vars
    field_muls = 14 * (1 << num_vars)
    ops_per_s = field_muls / dt

    print(
        json.dumps(
            {
                "metric": "sumcheck_nv20_deg3_field_mul_rate",
                "value": round(ops_per_s / 1e6, 2),
                "unit": "Mmul/s",
                "vs_baseline": round(dt, 4),  # seconds per prove (no published baseline)
            }
        )
    )


if __name__ == "__main__":
    main()
