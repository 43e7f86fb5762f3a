"""Standalone gadget proof verification (no SNARK wrapper).

Parity with prover/gadget/verify.go:15-75 at the transcript level: the
reference verifier (1) recomputes KrsGkr = KrsGkrPub + KrsGkrPriv from the
public witness and the proof, (2) re-derives the initial randomness ρ from
that point and checks it against the public input, then (3) runs a 4-term
pairing check binding everything into Groth16. Steps (1)-(2) are
reproduced exactly here (same MSM split, same Keccak derivation); for the
standalone gadget (no outer SNARK) this verifier then re-runs the full
GKR transcript verification directly — the check the reference performs
inside the SNARK as constraints (snark/gkr AssertValid, gadget.go:115).

The SUCCINCT verification — the actual 4-term pairing check against
sigma-marked keys — lives in the full Groth16 pipeline: wrap the workload
with gadget.incircuit.GadgetCircuit and verify with gadget.groth16.verify
(prover/gadget/verify.go:59-70 parity, tests/test_groth16.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..circuits.circuit import Circuit
from ..gkr import verifier as gkr_verifier
from ..utils.convert import ints_to_rows
from . import bn254_g1 as g1
from .gadget import GadgetProof, expand_qprime
from .io_store import IoStore
from .serialize import proof_from_vec
from .setup import GadgetSetup


class GadgetVerifyError(Exception):
    pass


def verify_gadget(
    circuit: Circuit,
    setup: GadgetSetup,
    proof: GadgetProof,
    io_store: IoStore,
) -> None:
    """Raise GadgetVerifyError / gkr.GKRError if anything is inconsistent.

    `io_store` is the statement: the claimed (inputs -> hash) batch. In the
    SNARK those values are witness wires; standalone they must be given to
    the verifier explicitly."""
    scalars = io_store.dump_for_multiexp()
    mask = io_store.multiexp_public_mask()
    pub = [s for s, m in zip(scalars, mask) if m]

    # KrsGkr = pub MSM + KrsGkrPriv (verify.go:38-44)
    krs = g1.add(g1.msm(setup.pub_k_gkr, pub), proof.krs_gkr_priv)
    rho = g1.derive_randomness_from_point(krs)
    if rho != proof.initial_randomness:
        raise GadgetVerifyError(
            "initial randomness does not match the io commitment"
        )

    qprime_ints = expand_qprime(rho, proof.bn)
    gkr_proof = proof_from_vec(circuit, proof.bn, proof.proof_vec)

    inputs = [
        jnp.asarray(ints_to_rows(col).T) for col in io_store.inputs_for_verifier()
    ]
    outputs = jnp.asarray(ints_to_rows(io_store.outputs_for_verifier()).T)
    qprime = jnp.asarray(ints_to_rows(qprime_ints))
    gkr_verifier.verify(circuit, gkr_proof, inputs, outputs, qprime)
