"""Hash layer tests: known-answer vector, scalar-vs-device equivalence for
MiMC/GMiMC/Poseidon (parity targets: hash/hash_test.go:21-27 and the
reference hash semantics)."""

import random

import jax
import pytest

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.fields.bn254 import P
from gkr_mimc_tpu.hashes import mimc
from gkr_mimc_tpu.hashes.gmimc import GMIMC_T2, GMIMC_T4, GMIMC_T8
from gkr_mimc_tpu.hashes.poseidon import POSEIDON_T2, POSEIDON_T4, POSEIDON_T8

random.seed(7)
VALS = [random.randrange(P) for _ in range(16)]


def test_mimc_known_answer():
    """The reference's hard-coded vector (hash/hash_test.go:21-27)."""
    assert (
        mimc.mimc_hash([12])
        == 1808205620575546259657963589762746470347087906694759866517376279978241663265
    )


def test_mimc_device_hash_matches_scalar():
    msgs = VALS[:3]
    got = jax.jit(mimc.mimc_hash_device)(fr.from_ints_mont(msgs))
    assert fr.to_int(got) == mimc.mimc_hash(msgs)


def test_mimc_batched_permutation():
    ks, ms = VALS[:8], VALS[8:16]
    got = jax.jit(mimc.mimc_keyed_permutation_device)(
        fr.from_ints_mont(ms), fr.from_ints_mont(ks)
    )
    assert fr.to_ints(got) == [
        mimc.mimc_keyed_permutation(m, k) for m, k in zip(ms, ks)
    ]


def test_mimc_hash_batch():
    import jax.numpy as jnp

    msgs = jnp.stack(
        [fr.from_ints_mont(VALS[:3]), fr.from_ints_mont(VALS[3:6])], axis=2
    )  # (16, 3, 2)
    got = jax.jit(mimc.mimc_hash_batch)(msgs)
    assert fr.to_ints(got) == [mimc.mimc_hash(VALS[:3]), mimc.mimc_hash(VALS[3:6])]


def test_hashes_run_scalar():
    """Smoke parity with hash/hash_test.go:11-19 (all hashers execute)."""
    inputs = [0] * 10
    for h in (GMIMC_T2, GMIMC_T4, GMIMC_T8, POSEIDON_T2, POSEIDON_T4, POSEIDON_T8):
        h.hash(inputs)
    mimc.mimc_hash(inputs)


@pytest.mark.parametrize(
    "hasher",
    [GMIMC_T2, GMIMC_T4, GMIMC_T8, POSEIDON_T2, POSEIDON_T4, POSEIDON_T8],
    ids=["gmimc2", "gmimc4", "gmimc8", "poseidon2", "poseidon4", "poseidon8"],
)
def test_device_hashers_match_scalar(hasher):
    """Device == scalar for every production width, with a message length
    that exercises multi-block absorption and zero padding."""
    msg = VALS[: hasher.t + 3]
    got = jax.jit(hasher.hash_batch)(fr.from_ints_mont(msg)[:, :, None])
    assert fr.to_ints(got) == [hasher.hash(msg)]
