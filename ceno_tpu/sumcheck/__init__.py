from .virtual_poly import Term, VirtualPoly
from .prover import SumcheckProof, prove
from .verifier import SubClaim, check, verify

__all__ = ["Term", "VirtualPoly", "SumcheckProof", "SubClaim", "prove", "verify", "check"]
