"""In-circuit verifier mirror (snark/* analog, SURVEY.md §2.8).

The reference re-expresses the GKR verifier over gnark variables so proofs
verify inside a Groth16 SNARK. Here the same verification relation runs
over an eager constraint tracer (`cs.ConstraintSystem`): every assert is
checked on concrete values (the `test.IsSolved` behavior) and R1CS-style
constraint counts fall out — including the headline "constraints per hash"
measurement of the outer circuit.
"""

from .cs import ConstraintSystem, UnsatisfiedConstraint, Variable
from .gkr import Proof
from .hash import mimc_hash
from .polynomial import MultiLin, Univariate, eq_eval, univariate_eq_eval
from .sumcheck import SumcheckProof

__all__ = [
    "ConstraintSystem",
    "MultiLin",
    "Proof",
    "SumcheckProof",
    "Univariate",
    "UnsatisfiedConstraint",
    "Variable",
    "eq_eval",
    "mimc_hash",
    "univariate_eq_eval",
]
