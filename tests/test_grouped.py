"""Grouped prover: G independent instances in one walk.

The grouped prover amortizes the sequential Fiat-Shamir latency (the
per-round MiMC challenge hash) across G transcript lanes — the TPU-native
throughput mode for production serving. Its correctness contract: every
group lane's proof is BIT-IDENTICAL to the single-instance prover run on
that lane's inputs (the group axis is pure batching, never
transcript-visible).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.gkr import prover as gkr_prover
from gkr_mimc_tpu.gkr import verifier as gkr_verifier
from gkr_mimc_tpu.models.mimc import assign_fused, mimc_circuit
from gkr_mimc_tpu.sumcheck import prover as sc_prover
from gkr_mimc_tpu.sumcheck import testing as sc_testing
from gkr_mimc_tpu.utils.common import random_fr_array
from gkr_mimc_tpu.utils.convert import ints_to_rows, rows_to_ints


def _group_tables(tables):
    """list of G (16, N) -> (16, G, N)."""
    return jnp.stack(tables, axis=1)


def test_grouped_sumcheck_matches_singles():
    bn, g = 3, 3
    singles = []
    xs_g, qp_g, cl_g = [], [], []
    for i in range(g):
        xs, claims_int, qprimes_int, gate = sc_testing.initialize_cipher_gate_instance(bn)
        # vary the instances: shift inputs and qprimes per group
        xs = [fr.from_ints_mont([(v + 7 * i) for v in range(1 << bn)]) for _ in xs]
        qprimes_int = [[(q + i + 1) for q in qprimes_int[0]]]
        claims_int = [claims_int[0] + i]
        qp = sc_testing.to_device_qprimes(qprimes_int)
        cl = sc_testing.to_device_claims(claims_int)
        singles.append(sc_prover.prove(xs, qp, cl, gate))
        xs_g.append(xs)
        qp_g.append(qp)
        cl_g.append(cl)

    xs_grouped = [
        _group_tables([xs_g[i][t] for i in range(g)]) for t in range(2)
    ]
    qprimes_grouped = jnp.stack(qp_g, axis=2)  # (J, bn, G, 16)
    claims_grouped = jnp.stack(cl_g, axis=2)  # (16, J, G)
    grouped = sc_prover.prove(xs_grouped, qprimes_grouped, claims_grouped, gate)

    for i in range(g):
        assert rows_to_ints(grouped.coeffs[:, :, i]) == rows_to_ints(
            singles[i].coeffs
        )
        assert rows_to_ints(grouped.challenges[:, i]) == rows_to_ints(
            singles[i].challenges
        )
        assert rows_to_ints(grouped.final_claims[:, i]) == rows_to_ints(
            singles[i].final_claims
        )


def test_grouped_gkr_walk_matches_singles_and_verifies():
    bn, g = 2, 2
    n = 1 << bn
    c = mimc_circuit()

    blocks, states, qprimes = [], [], []
    for i in range(g):
        blocks.append(fr.from_ints_mont(random_fr_array(n + i)[i:]))
        states.append(fr.from_ints_mont(random_fr_array(n + 2 * i)[2 * i:]))
        qprimes.append(jnp.asarray(ints_to_rows(random_fr_array(bn + i)[i:])))

    # singles
    single_proofs = []
    for i in range(g):
        a = assign_fused(blocks[i], states[i])
        single_proofs.append(gkr_prover.prove(c, a, qprimes[i]))

    # grouped
    block_g = _group_tables(blocks)
    state_g = _group_tables(states)
    qprime_g = jnp.stack(qprimes, axis=1)  # (bn, G, 16)
    a_g = assign_fused(block_g, state_g)
    proof_g = gkr_prover.prove(c, a_g, qprime_g)

    for i in range(g):
        sliced = gkr_verifier.slice_group(proof_g, i)
        for l in range(len(c)):
            ps, pg = single_proofs[i].sumcheck_proofs[l], sliced.sumcheck_proofs[l]
            if ps is None:
                assert pg is None
                continue
            assert rows_to_ints(pg.coeffs) == rows_to_ints(ps.coeffs)
            assert rows_to_ints(pg.challenges) == rows_to_ints(ps.challenges)

    gkr_verifier.verify_grouped(
        c, proof_g, [block_g, state_g], a_g[93], qprime_g
    )


def test_grouped_verify_rejects_tamper():
    bn, g = 2, 2
    n = 1 << bn
    c = mimc_circuit()
    block_g = _group_tables(
        [fr.from_ints_mont(random_fr_array(n)) for _ in range(g)]
    )
    state_g = _group_tables(
        [fr.from_ints_mont(random_fr_array(n)) for _ in range(g)]
    )
    qprime_g = jnp.stack(
        [jnp.asarray(ints_to_rows(random_fr_array(bn))) for _ in range(g)], axis=1
    )
    a_g = assign_fused(block_g, state_g)
    proof_g = gkr_prover.prove(c, a_g, qprime_g)
    # corrupt group 1's layer-50 coefficients
    p = proof_g.sumcheck_proofs[50]
    bad = p.coeffs.at[0, 0, 1, 0].add(1)
    proof_g.sumcheck_proofs[50] = type(p)(bad, p.challenges, p.final_claims)
    with pytest.raises(gkr_verifier.GKRError, match="group 1"):
        gkr_verifier.verify_grouped(
            c, proof_g, [block_g, state_g], a_g[93], qprime_g
        )
