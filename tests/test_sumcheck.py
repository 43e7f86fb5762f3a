"""Sumcheck protocol round-trips (parity: sumcheck/prover_test.go:42-94).

bn-sweep property tests: Prove -> Verify with the cipher-gate fixture and
the multi-claim identity fixture; prover/verifier challenge equality; final
claim consistency gate(finalClaims[1:]) * eq == finalClaim."""

import pytest

from gkr_mimc_tpu.fields import scalar
from gkr_mimc_tpu.poly import multilin
from gkr_mimc_tpu.poly.lagrange import eval_univariate
from gkr_mimc_tpu.sumcheck import prover, testing, verifier
from gkr_mimc_tpu.utils.convert import rows_to_ints


def _run_roundtrip(xs, claims_int, qprimes_int, gate):
    qp = testing.to_device_qprimes(qprimes_int)
    cl = testing.to_device_claims(claims_int)
    scp = prover.prove(xs, qp, cl, gate)

    coeffs_int = rows_to_ints(scp.coeffs)
    chals, final_claim, recomb = verifier.verify(claims_int, coeffs_int)

    # prover's challenges must equal the verifier's (transcript parity)
    assert rows_to_ints(scp.challenges) == chals

    # final claim consistency
    fc = rows_to_ints(scp.final_claims)
    g = gate.eval_scalar(fc[1:])
    eq_evals = [multilin.eq_eval_scalar(q, chals) for q in qprimes_int]
    eqv = eval_univariate(eq_evals, recomb)
    assert scalar.mul(g, eqv) == final_claim
    assert fc[0] == eqv
    return scp, chals


@pytest.mark.parametrize("bn", [1, 2, 3])
def test_cipher_gate_roundtrip(bn):
    xs, claims_int, qprimes_int, gate = testing.initialize_cipher_gate_instance(bn)
    _run_roundtrip(xs, claims_int, qprimes_int, gate)


@pytest.mark.parametrize("n_claims", [2, 10])
def test_multi_claim_roundtrip(n_claims):
    bn = 3
    xs, claims_int, qprimes_int, gate = testing.initialize_multi_instance(bn, n_claims)
    _run_roundtrip(xs, claims_int, qprimes_int, gate)


def test_rejects_bad_claim():
    bn = 2
    xs, claims_int, qprimes_int, gate = testing.initialize_cipher_gate_instance(bn)
    qp = testing.to_device_qprimes(qprimes_int)
    cl = testing.to_device_claims(claims_int)
    scp = prover.prove(xs, qp, cl, gate)
    coeffs_int = rows_to_ints(scp.coeffs)
    with pytest.raises(verifier.SumcheckError):
        verifier.verify([scalar.add(claims_int[0], 1)], coeffs_int)


def test_claim_matches_direct_evaluation():
    """The proven (RLC-combined) claim equals the direct O(2^bn) sum
    (sumcheck/prover_test.go cross-check vs Evaluation)."""
    bn = 2
    xs, claims_int, qprimes_int, gate = testing.initialize_multi_instance(bn, 3)
    vals = list(range(1 << bn))
    combined = testing.evaluation_scalar(gate, qprimes_int, claims_int, [vals, vals])
    # verifier recombines claims with the same RLC
    from gkr_mimc_tpu.sumcheck.verifier import recombine_multi_claims

    expected, _ = recombine_multi_claims(claims_int)
    assert combined == expected
