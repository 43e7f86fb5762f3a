"""Sumcheck verifier (host-side, Python-int field ops).

Parity with sumcheck/verifier.go:28-65. The verifier's work is O(bn * deg)
tiny field ops plus Fiat-Shamir hashing — host scalar arithmetic is the
right tool; only the final multilinear input evaluations (done by the GKR
verifier) touch the device.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields import scalar
from ..poly.lagrange import eval_univariate
from ..utils.common import get_challenge


class SumcheckError(Exception):
    pass


def recombine_multi_claims(claims: list[int]) -> tuple[int, int]:
    """-> (combined claim, recombination challenge).
    Parity with sumcheck/verifier.go:58-65."""
    if len(claims) < 1:
        raise SumcheckError("no claims to recombine")
    challenge = get_challenge(claims)
    return eval_univariate(claims, challenge), challenge


def verify(claims: list[int], proof: list[list[int]], challenges=None):
    """proof: per round, the (deg+2) univariate coefficients (ints).

    `challenges` optionally supplies the per-round Fiat-Shamir challenges
    MimcHash(coeffs) precomputed elsewhere (the GKR verifier batches all
    of them in one device program); when given they are trusted to be the
    recomputation of get_challenge(coeffs) — they are derived by the
    verifier itself, never taken from the prover.

    Returns (challenges, final_claim, recomb_chal); raises SumcheckError on
    a bad proof.
    """
    expected, recomb_chal = recombine_multi_claims(claims)

    out_challenges = []
    for i, coeffs in enumerate(proof):
        actual = scalar.add(eval_univariate(coeffs, 0), eval_univariate(coeffs, 1))
        if actual != expected:
            raise SumcheckError(
                f"round {i}: P(0)+P(1) = {actual} != expected {expected}"
            )
        r = challenges[i] if challenges is not None else get_challenge(coeffs)
        out_challenges.append(r)
        expected = eval_univariate(coeffs, r)

    return out_challenges, expected, recomb_chal
