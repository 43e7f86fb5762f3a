"""GKR end-to-end tests on the MiMC-91 circuit (parity: gkr/gkr_test.go,
examples/mimc_test.go)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gkr_mimc_tpu.circuits import circuit as circ_mod
from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.gkr import prover as gkr_prover
from gkr_mimc_tpu.gkr import verifier as gkr_verifier
from gkr_mimc_tpu.hashes.mimc import mimc_keyed_permutation
from gkr_mimc_tpu.models.mimc import assign_fused, mimc_circuit
from gkr_mimc_tpu.utils.common import random_fr_array
from gkr_mimc_tpu.utils.convert import ints_to_rows

BN = 2
N = 1 << BN


@pytest.fixture(scope="module")
def setup():
    c = mimc_circuit()
    key_int = random_fr_array(N)
    state_int = random_fr_array(N)
    block = fr.from_ints_mont(key_int)
    state = fr.from_ints_mont(state_int)
    a = assign_fused(block, state)
    return c, key_int, state_int, block, state, a


def test_circuit_form(setup):
    """examples/mimc_test.go:44-54: input layers, arity, sorted Out."""
    c, *_ = setup
    assert c.is_input_layer(0) and c.is_input_layer(1)
    assert c.input_arity() == 2
    for l in c:
        assert l.out == sorted(l.out)
    assert len(c[2].out) == 91  # the multi-instance fan-out


def test_witness_matches_scalar_permutation(setup):
    """examples/mimc_test.go:19-41."""
    c, key_int, state_int, block, state, a = setup
    out_int = fr.to_ints(a[93])
    assert out_int == [
        mimc_keyed_permutation(state_int[i], key_int[i]) for i in range(N)
    ]


def test_generic_assign_matches_fused(setup):
    c, _, _, block, state, a = setup
    a2 = circ_mod.assign(c, [block, state])
    for l in (2, 3, 50, 93):
        assert fr.to_ints(a2[l]) == fr.to_ints(a[l])


def test_gkr_prove_verify_and_negative(setup):
    c, _, _, block, state, a = setup
    qprime_int = random_fr_array(BN)
    qprime = jnp.asarray(ints_to_rows(qprime_int))
    proof = gkr_prover.prove(c, a, qprime)
    gkr_verifier.verify(c, proof, [block, state], a[93], qprime)

    # corrupt one round coefficient -> must be rejected
    bad = np.asarray(proof.sumcheck_proofs[50].coeffs).copy()
    bad[0, 0, 0] ^= 1
    proof.sumcheck_proofs[50].coeffs = jnp.asarray(bad)
    with pytest.raises(gkr_verifier.GKRError):
        gkr_verifier.verify(c, proof, [block, state], a[93], qprime)
