"""Regenerate the pinned golden transcript fixtures.

Run from the repo root:  python tests/golden/generate.py

Status of the cross-check (VERDICT r1 item 5): the Go reference toolchain
is not available in this image, so these vectors are PINNED FROM THIS
IMPLEMENTATION as regression goldens. They are byte-stable across runs
(deterministic inputs, deterministic Fiat-Shamir) and use the reference's
serialization (the hint wire format, prover/gadget/hints.go:236-317, via
gadget.serialize.proof_to_vec), so a Go-side cross-check only requires
running the reference's GkrProofToVec on the same fixtures and diffing.
Known-answer anchors that ARE cross-checked against the reference today:
MimcHash([12]) (hash/hash_test.go:21-26, tests/test_hash.py) and the
deterministic RandomFrArray generator (common/common.go:49-55).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax.numpy as jnp  # noqa: E402

from gkr_mimc_tpu.fields import fr  # noqa: E402
from gkr_mimc_tpu.gadget.serialize import proof_to_vec  # noqa: E402
from gkr_mimc_tpu.gkr import prover as gkr_prover  # noqa: E402
from gkr_mimc_tpu.models.mimc import assign_fused, mimc_circuit  # noqa: E402
from gkr_mimc_tpu.sumcheck import prover, testing  # noqa: E402
from gkr_mimc_tpu.utils.common import random_fr_array  # noqa: E402
from gkr_mimc_tpu.utils.convert import ints_to_rows, rows_to_ints  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "transcripts.json")


def sumcheck_vectors():
    out = {}
    for bn in (1, 2, 3):
        xs, claims_int, qprimes_int, gate = testing.initialize_cipher_gate_instance(bn)
        scp = prover.prove(
            xs,
            testing.to_device_qprimes(qprimes_int),
            testing.to_device_claims(claims_int),
            gate,
        )
        out[f"cipher_bn{bn}"] = {
            "coeffs": [[str(v) for v in row] for row in rows_to_ints(scp.coeffs)],
            "challenges": [str(v) for v in rows_to_ints(scp.challenges)],
            "final_claims": [str(v) for v in rows_to_ints(scp.final_claims)],
        }
    xs, claims_int, qprimes_int, gate = testing.initialize_multi_instance(3, 10)
    scp = prover.prove(
        xs,
        testing.to_device_qprimes(qprimes_int),
        testing.to_device_claims(claims_int),
        gate,
    )
    out["multi_bn3_j10"] = {
        "coeffs": [[str(v) for v in row] for row in rows_to_ints(scp.coeffs)],
        "challenges": [str(v) for v in rows_to_ints(scp.challenges)],
        "final_claims": [str(v) for v in rows_to_ints(scp.final_claims)],
    }
    return out


def gkr_vector():
    bn = 2
    n = 1 << bn
    c = mimc_circuit()
    block = jnp.asarray(fr.encode_mont_ints(random_fr_array(n)))
    state = jnp.asarray(fr.encode_mont_ints(random_fr_array(n)))
    qprime_ints = random_fr_array(bn)
    a = assign_fused(block, state)
    proof = gkr_prover.prove(c, a, jnp.asarray(ints_to_rows(qprime_ints)))
    vec = proof_to_vec(c, proof)
    return {
        "bn": bn,
        "qprime": [str(v) for v in qprime_ints],
        "outputs": [str(v) for v in fr.to_ints(a[93])],
        "proof_vec": [str(v) for v in vec],
    }


def main():
    data = {
        "_provenance": (
            "pinned from gkr_mimc_tpu (deterministic inputs per "
            "common/common.go:49-55); Go cross-check open — serialization "
            "follows prover/gadget/hints.go:236-317"
        ),
        "sumcheck": sumcheck_vectors(),
        "gkr_mimc": gkr_vector(),
    }
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
