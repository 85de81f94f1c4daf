from .encoding import RSCode, RSSpec
from .basefold import (
    Basefold,
    BasefoldCommitment,
    BasefoldCommitmentWithWitness,
    BasefoldProof,
)

__all__ = [
    "RSCode",
    "RSSpec",
    "Basefold",
    "BasefoldCommitment",
    "BasefoldCommitmentWithWitness",
    "BasefoldProof",
]
