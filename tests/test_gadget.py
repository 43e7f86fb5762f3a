"""Gadget-layer tests (parity: prover/gadget/*_test.go at the transcript
level; the Groth16 pairing side is out of the TPU core, SURVEY.md §2.11)."""

import pytest

from gkr_mimc_tpu.gadget import (
    GadgetVerifyError,
    GkrGadget,
    IoStore,
    bn_from_input_size,
    proof_from_vec,
    proof_size,
    proof_to_vec,
    verify_gadget,
)
from gkr_mimc_tpu.gadget import bn254_g1 as g1
from gkr_mimc_tpu.gadget.keccak import keccak256
from gkr_mimc_tpu.gkr.verifier import GKRError
from gkr_mimc_tpu.hashes.mimc import mimc_hash, mimc_update
from gkr_mimc_tpu.utils.common import random_fr_array


def test_keccak_known_vectors():
    # Ethereum-style (legacy) Keccak-256, not NIST SHA3
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # cross the rate boundary
    assert keccak256(b"x" * 136) != keccak256(b"x" * 137)


def test_g1_group_law_and_msm():
    g = g1.to_jac(g1.GEN)
    assert g1.on_curve(g)
    # EIP-196 known point: 2G
    assert g1.to_affine(g1.scalar_mul(g, 2)) == (
        1368015179489954701390400359078579693043519447331113978918064868415326638035,
        9918110051302171585080402603319702774565515993150576347155970296011118125764,
    )
    assert g1.is_inf(g1.scalar_mul(g, g1.R))
    # Pippenger MSM == naive sum
    pts = [g1.scalar_mul(g, 3 * i + 1) for i in range(23)]
    scalars = [(i * i) ^ 0xF45C9DF123F for i in range(23)]
    naive = g1.INF
    for p, s in zip(pts, scalars):
        naive = g1.add(naive, g1.scalar_mul(p, s))
    assert g1.to_affine(g1.msm(pts, scalars)) == g1.to_affine(naive)


def test_update_hasher_matches_mimc_hash():
    """UpdateHasher chains must reproduce MimcHash exactly
    (gadget_api.go:9-29 completes Miyaguchi-Preneel outside GKR)."""
    gadget = GkrGadget()
    msgs = random_fr_array(5)
    state = 0
    for m in msgs:
        state = gadget.update_hasher(state, m)
    assert state == mimc_hash(msgs)
    assert gadget.io_store.index == 5


def test_update_hasher_batch_matches_scalar():
    gadget = GkrGadget()
    states = random_fr_array(6)
    msgs = random_fr_array(6)[::-1]
    got = gadget.update_hasher_batch(states, msgs)
    assert got == [mimc_update(s, m) for s, m in zip(states, msgs)]


def test_proof_size_and_bn_recovery():
    gadget = GkrGadget()
    c = gadget.circuit
    for bn in (0, 1, 3, 7):
        n_inputs = (1 << bn) * (c.input_arity() + 1) + bn
        assert bn_from_input_size(c, n_inputs) == bn
    # MiMC-91: 92 gate layers of degree 7 (91 cipher + 1 identity);
    # hand-count the serialized size at bn=2 (hints.go:97-115)
    bn = 2
    sumcheck = sum(bn * (l.gate.degree + 2) for l in c if l.gate is not None)
    claims = sum(len(l.out) for l in c)
    qprimes = bn * claims + bn
    assert proof_size(c, bn) == sumcheck + claims + qprimes


@pytest.fixture(scope="module")
def closed_gadget():
    gadget = GkrGadget()
    # 3 chained updates -> padded to 4 (2 public entries, 1 private)
    state = 0
    msgs = random_fr_array(3)
    for i, m in enumerate(msgs):
        state = gadget.update_hasher(state, m, public=i < 2)
    # pad first (idempotent in close()) so the setup is sized for the
    # padded io partition, padding entries being private
    gadget._pad()
    setup = gadget.make_setup()
    proof = gadget.close(setup=setup, check=True)
    return gadget, setup, proof


def test_close_and_verify_roundtrip(closed_gadget):
    gadget, setup, proof = closed_gadget
    assert proof.bn == 2
    assert len(proof.proof_vec) == proof_size(gadget.circuit, proof.bn)
    verify_gadget(gadget.circuit, setup, proof, gadget.io_store)


def test_serialize_roundtrip(closed_gadget):
    gadget, _, proof = closed_gadget
    gp = proof_from_vec(gadget.circuit, proof.bn, proof.proof_vec)
    assert proof_to_vec(gadget.circuit, gp) == proof.proof_vec


def test_verify_rejects_tampered_randomness(closed_gadget):
    gadget, setup, proof = closed_gadget
    import dataclasses

    bad = dataclasses.replace(
        proof, initial_randomness=(proof.initial_randomness + 1) % g1.R
    )
    with pytest.raises(GadgetVerifyError):
        verify_gadget(gadget.circuit, setup, bad, gadget.io_store)


def test_verify_rejects_tampered_proof(closed_gadget):
    gadget, setup, proof = closed_gadget
    import dataclasses

    vec = list(proof.proof_vec)
    vec[0] = (vec[0] + 1) % g1.R
    bad = dataclasses.replace(proof, proof_vec=vec)
    with pytest.raises((GKRError, Exception)):
        verify_gadget(gadget.circuit, setup, bad, gadget.io_store)


def test_verify_rejects_tampered_io(closed_gadget):
    gadget, setup, proof = closed_gadget
    tampered = IoStore(input_arity=2)
    for i in range(gadget.io_store.index):
        out = gadget.io_store.outputs[i]
        tampered.push(
            [gadget.io_store.inputs[0][i], gadget.io_store.inputs[1][i]],
            out if i else (out + 1) % g1.R,
            gadget.io_store.public[i],
        )
    with pytest.raises((GadgetVerifyError, GKRError)):
        verify_gadget(gadget.circuit, setup, proof, tampered)
