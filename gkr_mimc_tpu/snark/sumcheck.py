"""In-circuit sumcheck verifier (snark/sumcheck/sumcheck.go:15-63 mirror).

Per round: assert P(0)+P(1) == claim, challenge = in-circuit
MimcHash(coeffs), next claim = P(challenge). Multi-claim layers are
recombined with an RLC whose coefficient is MimcHash(claims) — the single-
claim case still hashes (matching the native prover's control flow, a
transcript-parity requirement noted in SURVEY.md §7).
"""

from __future__ import annotations

from .cs import ConstraintSystem, Variable
from .hash import mimc_hash
from .polynomial import Univariate


class SumcheckProof(list):
    """bN rounds of Univariate coefficients (snark/sumcheck.go:15)."""

    @classmethod
    def from_ints(cls, cs: ConstraintSystem, rounds: list[list[int]]) -> "SumcheckProof":
        return cls(Univariate.from_ints(cs, r) for r in rounds)

    def assert_valid(self, cs: ConstraintSystem, initial_claims: list[Variable]):
        """Returns (qPrime, finalClaim, recombChal)
        (snark/sumcheck/sumcheck.go:39-54)."""
        claim, recomb_chal = _recombine_multi_claims(cs, initial_claims)
        hs = []
        for poly in self:
            cs.assert_is_equal(poly.zero_and_one(cs), claim)
            h = mimc_hash(cs, *poly)
            hs.append(h)
            claim = poly.eval(cs, h)
        return hs, claim, recomb_chal


def _recombine_multi_claims(cs: ConstraintSystem, claims: list[Variable]):
    """snark/sumcheck/sumcheck.go:57-63: coeff = MimcHash(claims), combined
    claim = univariate(claims)(coeff). Hashing happens even for one claim."""
    challenge = mimc_hash(cs, *claims)
    return Univariate(claims).eval(cs, challenge), challenge
