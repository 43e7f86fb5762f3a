"""GKR proof <-> flat field-element vector, in the reference wire format.

The reference serializes proofs only to cross its hint boundary
(prover/gadget/hints.go:236-317); that layout — sumcheck coefficients per
layer, then claims, then qPrimes, all in layer order with values in
regular (non-Montgomery) form — is the de facto interchange format, kept
here bit-compatible for cross-checking against the Go implementation.

Size bookkeeping mirrors GkrProverHint.NbOutputs (hints.go:76-116) and the
bN recovery loop from the hint input size (hints.go:80-95).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..circuits.circuit import Circuit
from ..gkr.prover import GKRProof
from ..sumcheck.prover import SumcheckProof
from ..utils.convert import ints_to_rows, rows_to_ints


def bn_from_input_size(circuit: Circuit, n_inputs: int) -> int:
    """Recover bN from a `qPrime || inputs || outputs` vector length
    (hints.go:80-95): n = (1<<bN)*(arity+1) + bN."""
    arity = circuit.input_arity()
    bn = 0
    while True:
        size = (1 << bn) * (arity + 1) + bn
        if size == n_inputs:
            return bn
        if size > n_inputs:
            raise ValueError(
                f"input size {n_inputs} matches no bN for arity {arity}"
            )
        bn += 1


def proof_size(circuit: Circuit, bn: int) -> int:
    """Number of field elements in the serialized proof
    (GkrProverHint.NbOutputs, hints.go:97-115)."""
    sumcheck_size = 0
    claims_size = 0
    qprime_size = 0
    for layer in circuit:
        if layer.gate is not None:
            sumcheck_size += bn * (layer.gate.degree + 2)
        claims_size += len(layer.out)
        qprime_size += bn * len(layer.out)
    qprime_size += bn  # the output layer's initial qPrime
    return sumcheck_size + claims_size + qprime_size


def proof_to_vec(circuit: Circuit, proof: GKRProof) -> list[int]:
    """Flatten: all sumcheck coeffs (layer order, round-major), then all
    claims, then all qPrimes (hints.go:236-271). Values are regular-form
    ints."""
    out: list[int] = []
    for p in proof.sumcheck_proofs:
        if p is not None:
            for rnd in rows_to_ints(p.coeffs):
                out.extend(rnd)
    for c in proof.claims:
        if c is not None and c.shape[0]:
            out.extend(rows_to_ints(c))
    for q in proof.qprimes:
        if q is not None and q.shape[0]:
            for qs in rows_to_ints(q):
                out.extend(qs)
    return out


def proof_from_vec(circuit: Circuit, bn: int, vec: list[int]) -> GKRProof:
    """Inverse of proof_to_vec; sizes come from the circuit description
    (GkrProofFromVec, hints.go:275-317). Returns a device-resident
    GKRProof suitable for gkr.verifier.verify."""
    if len(vec) != proof_size(circuit, bn):
        raise ValueError(
            f"vector has {len(vec)} elements, expected {proof_size(circuit, bn)}"
        )
    nlayers = len(circuit)
    cursor = 0

    def take(n: int) -> list[int]:
        nonlocal cursor
        chunk = vec[cursor : cursor + n]
        cursor += n
        return chunk

    sumcheck_proofs: list = [None] * nlayers
    for l, layer in enumerate(circuit):
        if layer.gate is None:
            continue
        ncoeffs = layer.gate.degree + 2
        rounds = [take(ncoeffs) for _ in range(bn)]
        coeffs = jnp.asarray(ints_to_rows(rounds))
        # challenges/final_claims are prover-private; the verifier
        # recomputes challenges from the coefficients (sumcheck/verifier).
        sumcheck_proofs[l] = SumcheckProof(coeffs, None, None)

    claims: list = [None] * nlayers
    for l, layer in enumerate(circuit):
        vals = take(len(layer.out))
        claims[l] = jnp.asarray(
            ints_to_rows(vals) if vals else np.zeros((0, 16), dtype=np.uint32)
        )

    qprimes: list = [None] * nlayers
    for l, layer in enumerate(circuit):
        nq = len(layer.out) if l != nlayers - 1 else 1
        qs = [take(bn) for _ in range(nq)]
        qprimes[l] = jnp.asarray(
            ints_to_rows(qs) if qs else np.zeros((0, bn, 16), dtype=np.uint32)
        )

    if cursor != len(vec):
        raise ValueError("the vector was not completely read")
    return GKRProof(sumcheck_proofs, claims, qprimes)
