"""End-to-end pipeline: ELF -> emulate -> witnesses -> prove -> verify.

Mirrors /root/reference/ceno_zkvm/src/e2e.rs (setup_platform, emulate_program
building PublicValues from the tracer, generate_witness, keygen, prove,
verify) and bin/e2e.rs (the CLI).  `Checkpoint` reproduces the reference's
pipeline-stage early exits for benchmarking (e2e.rs:350-480).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from enum import Enum
from typing import Dict, Optional, Sequence

import numpy as np

from ..emul import CENO_PLATFORM, Platform, Program, VMState, load_elf
from ..emul.tracer import SUBCYCLES_PER_INSN
from ..pcs import Basefold, RSSpec
from ..transcript import basic as tr
from . import vm as zkvm
from .riscv.config import DEFAULT_KINDS, Rv32imConfig
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


def emulate_program(program: Program, platform: Platform, max_steps: int,
                    reg_init: Optional[np.ndarray] = None, hints=None):
    """Run to halt (or max_steps); returns (vm, steps, public values)."""
    vm = VMState(platform, program)
    if hints is not None:
        image = hints.memory_image(platform)
        for waddr, word in image.items():
            vm.memory[waddr] = word
        vm._hints_image = image
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
        public_io=(),
    )
    return vm, steps, pv


def run_e2e_with_checkpoint(
    program: Program,
    platform: Platform = CENO_PLATFORM,
    max_steps: int = 1 << 20,
    checkpoint: Checkpoint = Checkpoint.COMPLETE,
    spec: RSSpec = RSSpec(),
    max_num_vars: int = 24,
    kinds: Sequence[int] = DEFAULT_KINDS,
    reg_init: Optional[np.ndarray] = None,
    num_shards: int = 1,
    hints=None,
) -> E2EResult:
    timings: Dict[str, float] = {}
    t0 = time.time()
    vm, steps, pv = emulate_program(program, platform, max_steps, reg_init, hints)
    timings["emulate"] = time.time() - t0
    if checkpoint == Checkpoint.PREP_E2E_PROVING:
        return E2EResult(None, None, len(steps), vm.exit_code, timings)

    program_size = max(4, 1 << (len(program.instructions) - 1).bit_length())
    from .riscv.config import MemLayout

    mem_layout = MemLayout.from_execution(program, vm, platform)
    config = Rv32imConfig.construct(program_size, kinds=kinds, mem_layout=mem_layout)
    pcs = Basefold(spec, max_num_vars=max_num_vars)
    t0 = time.time()
    fixed = config.generate_fixed_traces(program, vm._reg_init)
    pk = config.zkvm_cs.key_gen(pcs, fixed)
    timings["keygen"] = time.time() - t0

    t0 = time.time()
    witnesses, num_instances, structural = config.assign_witnesses(steps, program, vm)
    timings["witness_gen"] = time.time() - t0
    if checkpoint == Checkpoint.PREP_WITNESS_GEN:
        return E2EResult(None, None, len(steps), vm.exit_code, timings)

    t0 = time.time()
    t = tr.Transcript(b"riscv")
    proof = zkvm.create_proof(pk, witnesses, structural, num_instances, pv, t,
                              num_shards=num_shards)
    timings["prove"] = time.time() - t0

    t0 = time.time()
    import jax

    tv = tr.Transcript(b"riscv")
    ok = bool(jax.device_get(zkvm.verify_proof(pk, proof, tv)))
    timings["verify"] = time.time() - t0
    return E2EResult(proof, ok, len(steps), vm.exit_code, timings)


def main(argv=None):
    """CLI mirroring bin/e2e.rs: elf path, --max-steps, --profiling."""
    import argparse
    import json

    p = argparse.ArgumentParser(description="ceno_tpu e2e prover")
    p.add_argument("elf", nargs="?", help="path to a RISC-V ELF32 guest binary")
    p.add_argument("--fib", type=int, default=None,
                   help="prove the synthesized fibonacci guest fib(N) instead of an ELF")
    p.add_argument("--max-steps", type=int, default=1 << 20)
    p.add_argument("--checkpoint", default="complete",
                   choices=["emulate", "witness", "complete"])
    p.add_argument("--num-shards", type=int, default=1)
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
    res = run_e2e_with_checkpoint(
        program, max_steps=args.max_steps, checkpoint=cp,
        num_shards=args.num_shards,
    )
    print(json.dumps({
        "steps": res.steps,
        "exit_code": res.exit_code,
        "verified": res.verified,
        "timings": {k: round(v, 3) for k, v in res.timings.items()},
    }))


if __name__ == "__main__":
    main()
