"""Checkpoint/recompute assignment: bit-parity with the fully-resident
witness, span regeneration, and proof equality through the GKR walk.

Capacity analog of the reference's pool sizing (poly/pool.go:13-14);
the walk itself is circuit/assignment.go:9-64 + gkr/prover.go:21-91."""

import jax.numpy as jnp
import numpy as np

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.gkr import prover as gkr_prover
from gkr_mimc_tpu.models.checkpoint import CheckpointedAssignment
from gkr_mimc_tpu.models.mimc import assign_fused, mimc_circuit
from gkr_mimc_tpu.utils.common import random_fr_array
from gkr_mimc_tpu.utils.convert import ints_to_rows


def _inputs(bn, grouped=None):
    n = 1 << bn
    total = n * (grouped or 1)
    block = fr.from_ints_mont(random_fr_array(total))
    state = fr.from_ints_mont(random_fr_array(total + 3)[3:])
    if grouped:
        block = block.reshape(fr.L, grouped, n)
        state = state.reshape(fr.L, grouped, n)
    return block, state


def test_witness_parity_all_layers():
    block, state = _inputs(6)
    full = assign_fused(block, state)
    ck = CheckpointedAssignment(block, state, stride=13)
    assert len(ck) == len(full) == 94
    for j in range(94):
        assert bool(
            jnp.all(fr.canonicalize(ck[j]) == fr.canonicalize(full[j]))
        ), f"layer {j} diverges"


def test_witness_parity_small_stride_and_grouped():
    block, state = _inputs(4, grouped=2)
    full = assign_fused(block, state)
    ck = CheckpointedAssignment(block, state, stride=5)
    for j in (3, 7, 47, 92, 93):
        assert bool(
            jnp.all(fr.canonicalize(ck[j]) == fr.canonicalize(full[j]))
        ), f"layer {j} diverges"


def test_proof_bit_identical_through_walk():
    bn = 6
    block, state = _inputs(bn)
    c = mimc_circuit()
    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))
    p1 = gkr_prover.prove(c, assign_fused(block, state), qprime)
    p2 = gkr_prover.prove(c, CheckpointedAssignment(block, state), qprime)
    for l in (2, 3, 50, 93):
        assert (
            np.asarray(p1.sumcheck_proofs[l].coeffs)
            == np.asarray(p2.sumcheck_proofs[l].coeffs)
        ).all(), l
        assert (
            np.asarray(p1.sumcheck_proofs[l].challenges)
            == np.asarray(p2.sumcheck_proofs[l].challenges)
        ).all(), l


def test_tables_are_dropped_after_read():
    block, state = _inputs(4)
    ck = CheckpointedAssignment(block, state, stride=13)
    t = ck[50]
    assert t is not None
    # cipher tables are single-use: the cache entry is gone after the read
    assert 50 not in ck._cache
