"""End-to-end pipeline: ELF -> emulate -> witnesses -> prove -> verify.

Mirrors /root/reference/ceno_zkvm/src/e2e.rs (setup_platform, emulate_program
building PublicValues from the tracer, generate_witness, keygen, prove,
verify) and bin/e2e.rs (the CLI: --platform preset, --stack-size,
--heap-size, --hints, --max-steps, --profiling).  `Checkpoint` reproduces
the reference's pipeline-stage early exits for benchmarking (e2e.rs:350-480).

Key invariants (e2e.rs:169-244):
* the platform + memory layout + verifying key are derived from the program
  and declared sizes ONLY — keygen never looks at an execution, so one vk
  serves every input;
* a run that hits max_steps without halting proves as a truncated segment
  and verifies with does_halt=False (verifier.rs:55-75).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from enum import Enum
from typing import Dict, Optional, Sequence

import numpy as np

from ..emul import CENO_PLATFORM, Platform, Program, VMState, load_elf
from ..emul.platform import setup_platform
from ..emul.tracer import SUBCYCLES_PER_INSN
from ..pcs import Basefold, RSSpec
from ..transcript import basic as tr
from ..utils.profiling import span
from . import vm as zkvm
from .riscv.config import DEFAULT_KINDS, MemLayout, Rv32imConfig
from .riscv.tables import REG_COUNT_POW2


class Checkpoint(Enum):
    PREP_E2E_PROVING = 1
    PREP_WITNESS_GEN = 2
    PREP_SANITY_CHECK = 3
    COMPLETE = 4


@dataclass
class E2EResult:
    proof: Optional[object]
    verified: Optional[bool]
    steps: int
    exit_code: Optional[int]
    timings: Dict[str, float]
    halted: bool = True
    proof_bytes: Optional[int] = None


def emulate_program(program: Program, platform: Platform, max_steps: int,
                    reg_init: Optional[np.ndarray] = None, hints=None,
                    public_io: Sequence[int] = ()):
    """Run to halt (or max_steps); returns (vm, steps, public values).

    public_io words are poked into the platform's pub-io window before the
    run (e2e.rs:61-63 io_init) and become the PV_PUBLIC_IO instance vectors,
    padded to the window length."""
    vm = VMState(platform, program)
    if hints is not None:
        image = hints.memory_image(platform)
        for waddr, word in image.items():
            vm.memory[waddr] = word
        vm._hints_image = image
    io_len = (platform.public_io[1] - platform.public_io[0]) // 4
    io_words = list(public_io)[:io_len]
    io_base = platform.public_io[0] >> 2
    for i, w in enumerate(io_words):
        vm.memory[io_base + i] = w & 0xFFFFFFFF
    init = np.zeros(REG_COUNT_POW2, dtype=np.uint64) if reg_init is None else reg_init
    for idx in range(min(vm.REG_COUNT, REG_COUNT_POW2)):
        if init[idx]:
            vm.init_register_unsafe(idx, int(init[idx]))
    vm._reg_init = init
    steps = []
    for s in vm.iter_until_halt(max_steps):
        steps.append(s)
    pv = zkvm.PublicValues(
        exit_code=vm.exit_code if vm.halted else 0,
        init_pc=program.entry,
        init_cycle=SUBCYCLES_PER_INSN,
        end_pc=vm.pc,
        end_cycle=vm.tracer.cycle(),
        public_io=tuple(io_words) + (0,) * (io_len - len(io_words)),
    )
    return vm, steps, pv


def run_e2e_with_checkpoint(
    program: Program,
    platform: Optional[Platform] = None,
    max_steps: int = 1 << 20,
    checkpoint: Checkpoint = Checkpoint.COMPLETE,
    spec: RSSpec = RSSpec(),
    max_num_vars: int = 24,
    kinds: Sequence[int] = DEFAULT_KINDS,
    reg_init: Optional[np.ndarray] = None,
    num_shards: int = 1,
    hints=None,
    public_io: Sequence[int] = (),
    preset: str = "ceno",
    stack_size: int = 32768,
    heap_size: int = 2 * 1024 * 1024,
    pub_io_size: int = 64,
) -> E2EResult:
    """platform=None derives it from (preset, program, sizes) — the
    reference's only mode.  Passing an explicit platform keeps the caller
    responsible for a pow2 static layout."""
    timings: Dict[str, float] = {}
    if platform is None:
        platform = setup_platform(preset, program, stack_size, heap_size,
                                  pub_io_size)

    # --- execution-independent: layout, circuits, keys (e2e.rs:214-292) ---
    t0 = time.time()
    with span("keygen"):
        mem_layout = MemLayout.from_platform(program, platform)
        program_size = max(4, 1 << (len(program.instructions) - 1).bit_length())
        config = Rv32imConfig.construct(program_size, kinds=kinds,
                                        mem_layout=mem_layout)
        pcs = Basefold(spec, max_num_vars=max_num_vars)
        init = (np.zeros(REG_COUNT_POW2, dtype=np.uint64)
                if reg_init is None else reg_init)
        fixed = config.generate_fixed_traces(program, init)
        pk = config.zkvm_cs.key_gen(pcs, fixed)
    timings["keygen"] = time.time() - t0

    # --- per-run: emulate, witnesses, prove, verify ---
    t0 = time.time()
    with span("emulate"):
        vm, steps, pv = emulate_program(program, platform, max_steps, init,
                                        hints, public_io)
    timings["emulate"] = time.time() - t0
    if checkpoint == Checkpoint.PREP_E2E_PROVING:
        return E2EResult(None, None, len(steps), vm.exit_code, timings,
                         vm.halted)

    t0 = time.time()
    with span("witness_gen"):
        witnesses, num_instances, structural = config.assign_witnesses(
            steps, program, vm)
    timings["witness_gen"] = time.time() - t0
    if checkpoint == Checkpoint.PREP_WITNESS_GEN:
        return E2EResult(None, None, len(steps), vm.exit_code, timings,
                         vm.halted)

    if os.environ.get("MOCK_PROVING"):
        # e2e.rs:455-463: run the mock prover over the full assigned witness
        # before the real proof — catches unsatisfied constraints with names.
        from .debug import assert_satisfied_full

        t0 = time.time()
        with span("mock_proving"):
            assert_satisfied_full(config, witnesses, num_instances,
                                  structural, pv, fixed)
        timings["mock_proving"] = time.time() - t0

    t0 = time.time()
    with span("prove"):
        t = tr.Transcript(b"riscv")
        proof = zkvm.create_proof(pk, witnesses, structural, num_instances,
                                  pv, t, num_shards=num_shards)
    timings["prove"] = time.time() - t0

    t0 = time.time()
    import jax

    with span("verify"):
        tv = tr.Transcript(b"riscv")
        ok = bool(jax.device_get(
            zkvm.verify_proof_halt(pk, proof, tv, does_halt=vm.halted)))
    timings["verify"] = time.time() - t0
    return E2EResult(proof, ok, len(steps), vm.exit_code, timings, vm.halted)


def main(argv=None):
    """CLI mirroring bin/e2e.rs:23-54."""
    import argparse
    import json

    p = argparse.ArgumentParser(description="ceno_tpu e2e prover")
    p.add_argument("elf", nargs="?", help="path to a RISC-V ELF32 guest binary")
    p.add_argument("--fib", type=int, default=None,
                   help="prove the synthesized fibonacci guest fib(N) instead of an ELF")
    p.add_argument("--max-steps", type=int, default=1 << 20)
    p.add_argument("--checkpoint", default="complete",
                   choices=["emulate", "witness", "complete"])
    p.add_argument("--num-shards", type=int, default=1,
                   help="mesh shards per sumcheck; 0 = auto from the device "
                        "count (optimal_sumcheck_threads analog)")
    p.add_argument("--platform", default="ceno", choices=["ceno", "sp1"],
                   help="address-space preset (bin/e2e.rs --platform)")
    p.add_argument("--stack-size", type=int, default=32768)
    p.add_argument("--heap-size", type=int, default=2 * 1024 * 1024)
    p.add_argument("--hints", default=None,
                   help="raw file mapped into the hints segment")
    p.add_argument("--profiling", type=int, default=None,
                   help="print the span timing tree at depth <= N")
    args = p.parse_args(argv)

    if args.fib is not None:
        from ..emul.programs import fibonacci_program

        program = fibonacci_program(args.fib)
    else:
        assert args.elf, "need an ELF path or --fib N"
        with open(args.elf, "rb") as f:
            program = load_elf(f.read())
    cp = {
        "emulate": Checkpoint.PREP_E2E_PROVING,
        "witness": Checkpoint.PREP_WITNESS_GEN,
        "complete": Checkpoint.COMPLETE,
    }[args.checkpoint]
    hints = None
    if args.hints:
        from ..host import CenoStdin

        with open(args.hints, "rb") as f:
            hints = CenoStdin.from_raw(f.read())

    from ..utils.profiling import enable as enable_profiling, report

    if args.profiling is not None:
        enable_profiling()
    res = run_e2e_with_checkpoint(
        program, max_steps=args.max_steps, checkpoint=cp,
        num_shards=args.num_shards, preset=args.platform,
        stack_size=args.stack_size, heap_size=args.heap_size, hints=hints,
    )
    print(json.dumps({
        "steps": res.steps,
        "exit_code": res.exit_code,
        "halted": res.halted,
        "verified": res.verified,
        "timings": {k: round(v, 3) for k, v in res.timings.items()},
    }))
    if args.profiling is not None:
        report(max_depth=args.profiling)


if __name__ == "__main__":
    main()
