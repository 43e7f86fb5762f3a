"""SNARK-integration layer (the prover/gadget analog).

Two tiers of capability:

  * the standalone batch-hashing gadget: record MiMC updates
    (`GkrGadget.update_hasher` / `update_hasher_batch`), then `close()`
    pads the batch, commits to the ios (G1 MSM + Keccak -> initial
    randomness rho), proves the whole batch with the TPU GKR prover, and
    serializes the proof in the reference's hint wire format;
    `verify.verify_gadget` checks the commitment, rho derivation and the
    full GKR transcript.

  * the full Groth16 pipeline (incircuit + groth16): wrap a user circuit
    with `GadgetCircuit` (WrapCircuitUsingGkr analog), Compile -> Setup ->
    Solve -> Prove -> Verify with the split-K multiexp, sigma-marked keys
    and the 4-term pairing check of prover/gadget/{cs,setup,solution,
    prove,verify}.go.

Host crypto: bn254_g1/bn254_g2/tower/pairing + keccak, with the batch-heavy
paths in the native C++ runtime (native/bn254.cpp).
"""

from .gadget import GadgetProof, GkrGadget, expand_qprime
from .groth16 import (
    GadgetGroth16Proof,
    Groth16ProvingKey,
    Groth16VerifyError,
    Groth16VerifyingKey,
)
from .incircuit import GadgetCircuit, InCircuitGkrGadget, Solution
from .io_store import IoStore
from .serialize import bn_from_input_size, proof_from_vec, proof_size, proof_to_vec
from .setup import GadgetSetup, dummy_setup
from .verify import GadgetVerifyError, verify_gadget

__all__ = [
    "GadgetCircuit",
    "GadgetGroth16Proof",
    "GadgetProof",
    "GadgetSetup",
    "GadgetVerifyError",
    "GkrGadget",
    "Groth16ProvingKey",
    "Groth16VerifyError",
    "Groth16VerifyingKey",
    "InCircuitGkrGadget",
    "IoStore",
    "Solution",
    "bn_from_input_size",
    "dummy_setup",
    "expand_qprime",
    "proof_from_vec",
    "proof_size",
    "proof_to_vec",
    "verify_gadget",
]
