"""Golden-transcript regression tests.

The fixtures (tests/golden/transcripts.json) pin full proof transcripts —
round coefficients, Fiat-Shamir challenges, final claims, and the
reference-format serialized GKR proof vector (hint wire layout,
prover/gadget/hints.go:236-317) — for the deterministic fixtures the
reference's own tests use (sumcheck/testing.go:11-57 instances, the
RandomFrArray inputs of common/common.go:49-55).

Provenance: pinned from this implementation (no Go toolchain in the
image); the serialization matches the reference's layout so a Go-side
cross-check is a pure diff. Any unintended transcript change — a kernel
rewrite, a scheduling change, a field-arithmetic regression — fails here.
"""

import json
import os

import jax.numpy as jnp
import pytest

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.gadget.serialize import proof_to_vec
from gkr_mimc_tpu.gkr import prover as gkr_prover
from gkr_mimc_tpu.models.mimc import assign_fused, mimc_circuit
from gkr_mimc_tpu.sumcheck import prover, testing
from gkr_mimc_tpu.utils.common import random_fr_array
from gkr_mimc_tpu.utils.convert import ints_to_rows, rows_to_ints

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "transcripts.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def _fmt_rows(rows):
    return [[str(v) for v in row] for row in rows]


@pytest.mark.parametrize("bn", [1, 2, 3])
def test_cipher_transcripts_pinned(golden, bn):
    xs, claims_int, qprimes_int, gate = testing.initialize_cipher_gate_instance(bn)
    scp = prover.prove(
        xs,
        testing.to_device_qprimes(qprimes_int),
        testing.to_device_claims(claims_int),
        gate,
    )
    want = golden["sumcheck"][f"cipher_bn{bn}"]
    assert _fmt_rows(rows_to_ints(scp.coeffs)) == want["coeffs"]
    assert [str(v) for v in rows_to_ints(scp.challenges)] == want["challenges"]
    assert [str(v) for v in rows_to_ints(scp.final_claims)] == want["final_claims"]


def test_multi_instance_transcript_pinned(golden):
    xs, claims_int, qprimes_int, gate = testing.initialize_multi_instance(3, 10)
    scp = prover.prove(
        xs,
        testing.to_device_qprimes(qprimes_int),
        testing.to_device_claims(claims_int),
        gate,
    )
    want = golden["sumcheck"]["multi_bn3_j10"]
    assert _fmt_rows(rows_to_ints(scp.coeffs)) == want["coeffs"]
    assert [str(v) for v in rows_to_ints(scp.challenges)] == want["challenges"]


def test_gkr_mimc_proof_vec_pinned(golden):
    want = golden["gkr_mimc"]
    bn = want["bn"]
    n = 1 << bn
    c = mimc_circuit()
    block = jnp.asarray(fr.encode_mont_ints(random_fr_array(n)))
    state = jnp.asarray(fr.encode_mont_ints(random_fr_array(n)))
    qprime_ints = random_fr_array(bn)
    assert [str(v) for v in qprime_ints] == want["qprime"]
    a = assign_fused(block, state)
    proof = gkr_prover.prove(c, a, jnp.asarray(ints_to_rows(qprime_ints)))
    assert [str(v) for v in fr.to_ints(a[93])] == want["outputs"]
    assert [str(v) for v in proof_to_vec(c, proof)] == want["proof_vec"]
