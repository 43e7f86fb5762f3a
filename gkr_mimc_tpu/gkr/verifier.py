"""GKR verifier.

Parity with gkr/verifier.go:15-132: seed the output claim by evaluating the
output table itself; per non-input layer verify the sumcheck transcript and
the final-claim consistency expectedClaim = Gate(subclaims) *
EvalUnivariate([EvalEq(qPrime_j, nextQ)]_j, recombChal); check qPrime
consistency between layers; finally check each input table's evaluation.

Hybrid execution: the O(2**bn) multilinear evaluations (output + input
tables) run on device; the per-round transcript checks are host ints.
"""

from __future__ import annotations

import jax

from ..circuits.circuit import Circuit
from ..fields import fr
from ..poly import multilin
from ..poly.lagrange import eval_univariate
from ..sumcheck import verifier as sumcheck_verifier
from ..utils.convert import rows_to_ints, ints_to_rows
from .prover import GKRProof


class GKRError(Exception):
    pass


_evaluate_jit = jax.jit(multilin.evaluate)


def _eval_table(table, qprime_rows) -> int:
    """Device multilinear evaluation -> host int."""
    out = _evaluate_jit(table, jax.numpy.asarray(qprime_rows))
    return fr.to_int(out[:, None])


def verify(circuit: Circuit, proof: GKRProof, inputs: list, outputs, qprime) -> None:
    """inputs: list of (16, N) input tables; outputs: (16, N) output table;
    qprime: (bn, 16) Montgomery rows. Raises GKRError if invalid."""
    nlayers = len(circuit)

    # hostify the proof's small artifacts once
    claims_int = [
        rows_to_ints(c) if c is not None and c.shape[0] else [] for c in proof.claims
    ]
    qprimes_int = [
        rows_to_ints(q) if q is not None and q.shape[0] else [] for q in proof.qprimes
    ]
    qprime_int = rows_to_ints(qprime)

    if qprimes_int[nlayers - 1][0] != qprime_int:
        raise GKRError("initial qPrime does not match the proof")

    # the verifier computes the output claim itself (gkr/verifier.go:35-37)
    claims_int[nlayers - 1] = claims_int[nlayers - 1] + [_eval_table(outputs, qprime)]

    for layer in range(nlayers - 1, -1, -1):
        if circuit.is_input_layer(layer):
            break
        _test_sumcheck(circuit, proof, claims_int, qprimes_int, layer)

    for layer in range(len(inputs)):
        got = _eval_table(inputs[layer], ints_to_rows(qprimes_int[layer][0]))
        if got != claims_int[layer][0]:
            raise GKRError(
                f"input layer {layer} check failed: claim {claims_int[layer][0]} "
                f"!= eval {got}"
            )


def _test_sumcheck(circuit, proof, claims_int, qprimes_int, layer) -> None:
    coeffs_int = rows_to_ints(proof.sumcheck_proofs[layer].coeffs)

    try:
        next_qprime, next_claim, recomb_chal = sumcheck_verifier.verify(
            claims_int[layer], coeffs_int
        )
    except sumcheck_verifier.SumcheckError as e:
        raise GKRError(f"layer {layer}: {e}") from e

    sub_claims = []
    for inp in circuit[layer].in_:
        slot = circuit.out_slot(inp, layer)
        if qprimes_int[inp][slot] != next_qprime:
            raise GKRError(f"layer {layer}: qPrime mismatch into layer {inp}")
        sub_claims.append(claims_int[inp][slot])

    expected = circuit[layer].gate.eval_scalar(sub_claims)

    eq_evals = [
        multilin.eq_eval_scalar(qp, next_qprime) for qp in qprimes_int[layer]
    ]
    eq_eval = eval_univariate(eq_evals, recomb_chal)

    from ..fields import scalar

    expected = scalar.mul(expected, eq_eval)
    if expected != next_claim:
        raise GKRError(f"layer {layer}: final claim mismatch")
