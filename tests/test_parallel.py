"""Sharded prover tests on the virtual 8-device CPU mesh.

The key property (SURVEY.md §4): bit-exact transcript parity between the
single-chip and sharded provers — identical round coefficients, challenges
and final claims.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.parallel import mesh as pmesh
from gkr_mimc_tpu.sumcheck import prover as sc_prover
from gkr_mimc_tpu.sumcheck import testing as sc_testing
from gkr_mimc_tpu.utils.convert import ints_to_rows


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should force 8 host devices"
    return pmesh.make_mesh(8)


def _assert_same_proof(a, b):
    assert np.array_equal(np.asarray(a.coeffs), np.asarray(b.coeffs))
    assert np.array_equal(np.asarray(a.challenges), np.asarray(b.challenges))
    assert np.array_equal(np.asarray(a.final_claims), np.asarray(b.final_claims))


def test_shard_roundtrip(mesh8):
    x = fr.from_ints_mont(list(range(64)))
    xs = pmesh.shard_table(x, mesh8)
    back = pmesh.unshard_table(xs)
    assert np.array_equal(np.asarray(back), np.asarray(x))


def test_sharded_sumcheck_matches_single(mesh8):
    bn = 4
    xs, claims_int, qprimes_int, gate = sc_testing.initialize_cipher_gate_instance(bn)
    qp = sc_testing.to_device_qprimes(qprimes_int)
    cl = sc_testing.to_device_claims(claims_int)

    single = sc_prover.prove(xs, qp, cl, gate)
    sharded = pmesh.prove_sharded(
        [pmesh.shard_table(x, mesh8) for x in xs], qp, cl, gate, mesh8
    )
    _assert_same_proof(single, sharded)


def test_sharded_multiclaim_matches_single(mesh8):
    bn = 4
    xs, claims_int, qprimes_int, gate = sc_testing.initialize_multi_instance(bn, 3)
    qp = sc_testing.to_device_qprimes(qprimes_int)
    cl = sc_testing.to_device_claims(claims_int)

    single = sc_prover.prove(xs, qp, cl, gate)
    sharded = pmesh.prove_sharded(
        [pmesh.shard_table(x, mesh8) for x in xs], qp, cl, gate, mesh8
    )
    _assert_same_proof(single, sharded)


def test_sharded_gkr_matches_single(mesh8):
    from gkr_mimc_tpu.circuits import circuit as circ_mod
    from gkr_mimc_tpu.gkr import prover as gkr_prover
    from gkr_mimc_tpu.gkr import verifier as gkr_verifier
    from gkr_mimc_tpu.models.mimc import assign_fused, mimc_circuit
    from gkr_mimc_tpu.utils.common import random_fr_array

    bn = 4
    n = 1 << bn
    c = mimc_circuit()
    block = fr.from_ints_mont(random_fr_array(n))
    state = fr.from_ints_mont(random_fr_array(n))
    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))

    a_single = assign_fused(block, state)
    p_single = gkr_prover.prove(c, a_single, qprime)

    block_sh = pmesh.shard_table(block, mesh8)
    state_sh = pmesh.shard_table(state, mesh8)
    a_sh = pmesh.assign_sharded_mimc(block_sh, state_sh)
    p_sh = pmesh.prove_gkr_sharded(c, a_sh, qprime, mesh8)

    for l in range(len(c)):
        if p_single.sumcheck_proofs[l] is None:
            assert p_sh.sumcheck_proofs[l] is None
            continue
        _assert_same_proof(p_single.sumcheck_proofs[l], p_sh.sumcheck_proofs[l])

    # and the sharded proof verifies against the unsharded tables
    gkr_verifier.verify(c, p_sh, [block, state], a_single[93], qprime)
