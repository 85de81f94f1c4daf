"""ceno_tpu: a TPU-native zero-knowledge proving framework.

A from-scratch JAX/XLA/Pallas implementation of a non-uniform RISC-V zkVM
with the capabilities of the reference Rust zkVM (see SURVEY.md): Goldilocks
field + quadratic extension, Poseidon transcript, tower sumchecks
(product + LogUp), Basefold multilinear PCS, per-opcode circuits, and an
RV32IM emulator producing provable execution traces.
"""

__version__ = "0.1.0"
