from .basecode import Basecode, BasecodeSpec
from .encoding import RSCode, RSSpec
from .basefold import (
    Basefold,
    BasefoldCommitment,
    BasefoldCommitmentWithWitness,
    BasefoldProof,
)

__all__ = [
    "Basecode",
    "BasecodeSpec",
    "RSCode",
    "RSSpec",
    "Basefold",
    "BasefoldCommitment",
    "BasefoldCommitmentWithWitness",
    "BasefoldProof",
]
