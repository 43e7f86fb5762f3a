"""SNARK-integration layer (the prover/gadget analog).

The batch-hashing gadget API: record MiMC updates (`GkrGadget.update_hasher`
/ `update_hasher_batch`), then `close()` pads the batch, commits to the ios
(G1 MSM + Keccak → initial randomness ρ), proves the whole batch with the
TPU GKR prover, and serializes the proof in the reference's hint wire
format. `verify.verify_gadget` checks the commitment, ρ derivation, and the
full GKR transcript.

Modules: gadget (pipeline), io_store, serialize (wire format), setup
(σ-marked commitment keys), verify, bn254_g1 + keccak (host crypto).
"""

from .gadget import GadgetProof, GkrGadget, expand_qprime
from .io_store import IoStore
from .serialize import bn_from_input_size, proof_from_vec, proof_size, proof_to_vec
from .setup import GadgetSetup, dummy_setup
from .verify import GadgetVerifyError, verify_gadget

__all__ = [
    "GadgetProof",
    "GkrGadget",
    "GadgetSetup",
    "GadgetVerifyError",
    "IoStore",
    "bn_from_input_size",
    "dummy_setup",
    "expand_qprime",
    "proof_from_vec",
    "proof_size",
    "proof_to_vec",
    "verify_gadget",
]
