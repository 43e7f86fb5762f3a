"""GMiMC and Poseidon GKR circuits through the standard GKR walk
(BASELINE.md north-star config 3; the reference has no circuits for these —
hash/gmimc.go and hash/poseidon.go are hash-primitive-only)."""

import jax.numpy as jnp
import pytest

from gkr_mimc_tpu.circuits import circuit as circ_mod
from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.gkr import prover as gkr_prover
from gkr_mimc_tpu.gkr import verifier as gkr_verifier
from gkr_mimc_tpu.models import gmimc as gm
from gkr_mimc_tpu.models import poseidon as ps
from gkr_mimc_tpu.utils.common import random_fr_array
from gkr_mimc_tpu.utils.convert import ints_to_rows


def _batch_col(cols, i):
    return [c[i] for c in cols]


@pytest.mark.parametrize("t", [2, 4])
def test_gmimc_gkr_roundtrip(t):
    bn = 2
    n = 1 << bn
    c = gm.gmimc_circuit(t)
    blocks_int = [random_fr_array(n) for _ in range(t)]
    state_int = [random_fr_array(n) for _ in range(t)]
    blocks = [fr.from_ints_mont(b) for b in blocks_int]
    inputs = gm.gmimc_inputs(
        blocks, fr.from_ints_mont(state_int[gm.initial_word(t)])
    )
    a = circ_mod.assign(c, inputs)

    # witness output == scalar permutation word 0 (hash/gmimc.go semantics)
    expected = [
        gm.permutation_word_scalar(t, _batch_col(state_int, i), _batch_col(blocks_int, i))
        for i in range(n)
    ]
    assert fr.to_ints(a[-1]) == expected

    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))
    proof = gkr_prover.prove(c, a, qprime)
    gkr_verifier.verify(c, proof, inputs, a[-1], qprime)


def test_poseidon_gkr_roundtrip_reduced_rounds():
    """Full protocol round-trip on a reduced-round Poseidon (RF=2, RP=3):
    the circuit builder and walk are round-count-generic, so this exercises
    every layer kind (full/partial S-box, MDS LinearGate, fan-out) cheaply."""
    t, rf, rp = 2, 2, 3
    bn = 2
    n = 1 << bn
    c = ps.poseidon_circuit(t, rf, rp)
    blocks_int = [random_fr_array(n) for _ in range(t)]
    states_int = [random_fr_array(n) for _ in range(t)]
    blocks = [fr.from_ints_mont(b) for b in blocks_int]
    states = [fr.from_ints_mont(s) for s in states_int]
    inputs = ps.poseidon_inputs(blocks, states)
    a = circ_mod.assign(c, inputs)

    expected = [
        ps.permutation_word_scalar(
            t, rf, rp, _batch_col(states_int, i), _batch_col(blocks_int, i)
        )
        for i in range(n)
    ]
    assert fr.to_ints(a[-1]) == expected

    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))
    proof = gkr_prover.prove(c, a, qprime)
    gkr_verifier.verify(c, proof, inputs, a[-1], qprime)


def test_poseidon_full_config_prove_and_verify():
    """End-to-end prove+verify at the PRODUCTION config (t=2, RF=8, RP=82 —
    the reference's PoseidonT2, hash/poseidon.go:150-157): witness parity
    plus the full 395-layer GKR walk and verification."""
    t, rf, rp = 2, 8, 82
    bn = 1
    n = 1 << bn
    c = ps.poseidon_circuit(t, rf, rp)
    blocks_int = [random_fr_array(n) for _ in range(t)]
    states_int = [random_fr_array(n) for _ in range(t)]
    inputs = ps.poseidon_inputs(
        [fr.from_ints_mont(b) for b in blocks_int],
        [fr.from_ints_mont(s) for s in states_int],
    )
    a = circ_mod.assign(c, inputs)
    expected = [
        ps.permutation_word_scalar(
            t, rf, rp, _batch_col(states_int, i), _batch_col(blocks_int, i)
        )
        for i in range(n)
    ]
    assert fr.to_ints(a[-1]) == expected

    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))
    proof = gkr_prover.prove(c, a, qprime)
    gkr_verifier.verify(c, proof, inputs, a[-1], qprime)


def test_gmimc_full_state_proving():
    """All t output words proven and verified (VERDICT r1 item 7: packaged
    full-state proving, not just word 0)."""
    t, bn = 2, 2
    n = 1 << bn
    blocks_int = [random_fr_array(n) for _ in range(t)]
    states_int = [random_fr_array(n) for _ in range(t)]
    blocks = [fr.from_ints_mont(b) for b in blocks_int]
    states = [fr.from_ints_mont(s) for s in states_int]
    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))

    results = gm.prove_full_state(t, blocks, states, qprime)
    gm.verify_full_state(t, blocks, states, qprime, results)

    # every word's witness output matches the scalar permutation
    for w, (c, a, proof) in enumerate(results):
        expected = [
            gm.permutation_word_scalar(
                t, _batch_col(states_int, i), _batch_col(blocks_int, i), w
            )
            for i in range(n)
        ]
        assert fr.to_ints(a[-1]) == expected


def test_poseidon_full_state_proving():
    t, rf, rp, bn = 2, 2, 3, 2
    n = 1 << bn
    blocks_int = [random_fr_array(n) for _ in range(t)]
    states_int = [random_fr_array(n) for _ in range(t)]
    blocks = [fr.from_ints_mont(b) for b in blocks_int]
    states = [fr.from_ints_mont(s) for s in states_int]
    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))

    results = ps.prove_full_state(t, rf, rp, blocks, states, qprime)
    ps.verify_full_state(t, blocks, states, qprime, results)

    for w, (c, a, proof) in enumerate(results):
        expected = [
            ps.permutation_word_scalar(
                t, rf, rp, _batch_col(states_int, i), _batch_col(blocks_int, i), w
            )
            for i in range(n)
        ]
        assert fr.to_ints(a[-1]) == expected


def test_gadget_with_gmimc_circuit():
    """The gadget's full close() pipeline (pad -> commit -> rho -> prove ->
    serialize -> verify) over a NON-MiMC circuit via the generic push_io
    API (VERDICT r1 item 7: 'gadget close() working with a non-MiMC
    circuit')."""
    from gkr_mimc_tpu.gadget import GkrGadget, verify_gadget

    t = 2
    c = gm.gmimc_circuit(t)
    g = GkrGadget(circuit=c)
    # 3 entries -> padded to 4; inputs are (block0, block1, state_word)
    for i in range(3):
        blocks = [7 * i + 1, 9 * i + 2]
        state = [0, 0]
        out = gm.permutation_word_scalar(t, state, blocks, 0)
        g.push_io([blocks[0], blocks[1], state[gm.initial_word(t)]], out)
    proof = g.close()
    verify_gadget(c, g.make_setup(), proof, g.io_store)
