"""The Groth16 layer: RecordingCS, setup/prove/verify, the gadget pipeline.

Mirrors the reference's integration tests (prover/gadget/prover_test.go:
42-79 green path, solver_test.go fixSolution semantics, setup_test.go key
splitting) over the eager-tracing R1CS.
"""

import dataclasses

import pytest

from gkr_mimc_tpu.fields import scalar
from gkr_mimc_tpu.gadget import bn254_g1 as g1
from gkr_mimc_tpu.gadget import groth16 as G
from gkr_mimc_tpu.snark.r1cs import RecordingCS, UnsatisfiedConstraint


def _tiny_r1cs():
    """rho placeholder + one public output + a few private muls."""
    cs = RecordingCS()
    rho_seed = g1.derive_randomness_from_point(g1.INF)
    cs.public_input(rho_seed)
    out = cs.public_input(147)
    x = cs.witness(3)
    y = cs.witness(7)
    t = cs.mul(x, y)
    t2 = cs.mul(t, cs.add(x, cs.constant(4)))
    cs.assert_is_equal(t2, out)
    return cs, rho_seed


def test_recording_cs_semantics():
    cs, _ = _tiny_r1cs()
    r1cs = cs.compile()
    r1cs.check()
    assert r1cs.n_public == 2
    assert len(r1cs.constraints) == 3  # 2 muls + 1 assert
    # wire layout: [1, publics..., privates...]
    assert r1cs.wires[0] == 1
    assert r1cs.wires[2] == 147

    # unsatisfied asserts raise eagerly
    cs2 = RecordingCS()
    a = cs2.witness(1)
    with pytest.raises(UnsatisfiedConstraint):
        cs2.assert_is_equal(a, cs2.constant(2))


def test_recording_cs_linear_ops_free():
    cs = RecordingCS()
    a = cs.witness(5)
    b = cs.witness(6)
    c = cs.add(a, cs.mul(cs.constant(3), b))  # constant mul + add: free
    assert c.value == 23
    assert cs.nb_constraints == 0
    d = cs.mul(c, c)
    assert d.value == 23 * 23
    assert cs.nb_constraints == 1
    # the LC of c spans both wires
    assert len(c.lc) == 2


def test_groth16_roundtrip_and_tampering():
    cs, rho_seed = _tiny_r1cs()
    r1cs = cs.compile()
    n_priv = r1cs.n_wires - r1cs.n_public - 1
    partition = ([], [], [2], [r1cs.n_public + 1 + i for i in range(n_priv)])
    pk, vk = G.setup(r1cs, partition)
    proof = G.prove(r1cs, pk, g1.INF, rho_seed)
    G.verify(proof, vk, [rho_seed, 147])

    with pytest.raises(G.Groth16VerifyError):
        G.verify(proof, vk, [rho_seed, 148])  # wrong public input

    bad = dataclasses.replace(
        proof, krs_gkr_priv=g1.scalar_mul(g1.to_jac(g1.GEN), 99)
    )
    with pytest.raises(G.Groth16VerifyError):
        G.verify(bad, vk, [rho_seed, 147])

    bad = dataclasses.replace(proof, ar=g1.scalar_mul(proof.ar, 2))
    with pytest.raises(G.Groth16VerifyError):
        G.verify(bad, vk, [rho_seed, 147])

    bad = dataclasses.replace(proof, initial_randomness=0)
    with pytest.raises(G.Groth16VerifyError):
        G.verify(bad, vk, [rho_seed, 147])


def test_proof_randomness():
    """Proof blinding is sampled fresh per proof (prove.go:161-167
    SetRandom): two proofs of the SAME witness under the same keys must
    differ (hiding) while both verify; an injected seed reproduces."""
    cs, rho_seed = _tiny_r1cs()
    r1cs = cs.compile()
    n_priv = r1cs.n_wires - r1cs.n_public - 1
    partition = ([], [], [2], [r1cs.n_public + 1 + i for i in range(n_priv)])
    pk, vk = G.setup(r1cs, partition, seed=b"test-setup")
    p1 = G.prove(r1cs, pk, g1.INF, rho_seed)
    p2 = G.prove(r1cs, pk, g1.INF, rho_seed)
    assert g1.to_affine(p1.ar) != g1.to_affine(p2.ar)
    assert g1.to_affine(p1.krs) != g1.to_affine(p2.krs)
    G.verify(p1, vk, [rho_seed, 147])
    G.verify(p2, vk, [rho_seed, 147])
    # seed injection is reproducible (the test/DummySetup flavor)
    p3 = G.prove(r1cs, pk, g1.INF, rho_seed, seed=b"fixed")
    p4 = G.prove(r1cs, pk, g1.INF, rho_seed, seed=b"fixed")
    assert g1.to_affine(p3.ar) == g1.to_affine(p4.ar)
    # real setup: toxic waste differs run to run
    pk2, vk2 = G.setup(r1cs, partition)
    pk3, _ = G.setup(r1cs, partition)
    assert g1.to_affine(pk2.alpha1) != g1.to_affine(pk3.alpha1)
    G.verify(G.prove(r1cs, pk2, g1.INF, rho_seed), vk2, [rho_seed, 147])


def test_sigma_marking_blocks_key_mixing():
    """The sigma marking (setup.go:133-146): a commitment computed with
    the UNMARKED generator-derived keys fails the pairing even though the
    randomness re-derivation (which only sees the point) passes."""
    cs, rho_seed = _tiny_r1cs()
    x_extra = cs.witness(42)
    y_extra = cs.witness(5)
    cs.assert_is_equal(cs.mul(x_extra, y_extra), cs.constant(210))
    r1cs = cs.compile()
    n_pub = r1cs.n_public
    # treat the last two private wires as "GKR" wires
    priv_wires = list(range(n_pub + 1, r1cs.n_wires))
    priv_gkr = priv_wires[-2:]
    priv_not_gkr = priv_wires[:-2]
    partition = ([], priv_gkr, [2], priv_not_gkr)
    pk, vk = G.setup(r1cs, partition)

    # honest: commitment with the sigma-marked keys
    z = r1cs.wires
    krs_gkr_priv = G._msm(pk.priv_k_gkr_sigma, [z[w] for w in priv_gkr])
    rho = g1.derive_randomness_from_point(krs_gkr_priv)
    # rebuild the full witness with the real rho in wire 1
    cs2, _ = _rebuild_with_rho(rho)
    x_extra = cs2.witness(42)
    y_extra = cs2.witness(5)
    cs2.assert_is_equal(cs2.mul(x_extra, y_extra), cs2.constant(210))
    r1cs2 = cs2.compile()
    proof = G.prove(r1cs2, pk, krs_gkr_priv, rho)
    G.verify(proof, vk, [rho, 147])

    # adversarial: same scalars but keys WITHOUT the sigma mark — the
    # re-derived rho matches (it only hashes the point) but the 4-term
    # pairing rejects
    k_unmarked = [
        g1.scalar_mul(pt, pow(17, g1.R - 2, g1.R))
        for pt in pk.priv_k_gkr_sigma
    ]
    bad_commit = G._msm(k_unmarked, [z[w] for w in priv_gkr])
    rho_bad = g1.derive_randomness_from_point(bad_commit)
    cs3, _ = _rebuild_with_rho(rho_bad)
    x_extra = cs3.witness(42)
    y_extra = cs3.witness(5)
    cs3.assert_is_equal(cs3.mul(x_extra, y_extra), cs3.constant(210))
    r1cs3 = cs3.compile()
    bad_proof = G.prove(r1cs3, pk, bad_commit, rho_bad)
    with pytest.raises(G.Groth16VerifyError):
        G.verify(bad_proof, vk, [rho_bad, 147])


def _rebuild_with_rho(rho):
    cs = RecordingCS()
    cs.public_input(rho)
    out = cs.public_input(147)
    x = cs.witness(3)
    y = cs.witness(7)
    t = cs.mul(x, y)
    t2 = cs.mul(t, cs.add(x, cs.constant(4)))
    cs.assert_is_equal(t2, out)
    return cs, rho


def test_fix_solution_semantics():
    """solution.go:52-82: placeholder (1, 0, c != 0) + wires[1] == 0 gets
    patched to (1, c, c) / wires[1] = c; anything else errors."""
    from gkr_mimc_tpu.gadget.incircuit import Solution

    s = Solution(wires=[1, 0, 5], abc=[(2, 3, 6), (1, 0, 77)])
    s.fix_solution()
    assert s.abc[-1] == (1, 77, 77)
    assert s.wires[1] == 77

    s = Solution(wires=[1, 0, 5], abc=[(1, 1, 77)])  # b != 0
    with pytest.raises(ValueError):
        s.fix_solution()
    s = Solution(wires=[1, 9, 5], abc=[(1, 0, 77)])  # wire1 set
    with pytest.raises(ValueError):
        s.fix_solution()


def test_gadget_pipeline_public_after_witness():
    """Regression: a user circuit that allocates a public input AFTER a
    witness makes the compile remap non-identity; the commitment step must
    translate the canonical key-partition wire ids back to raw trace ids
    (a mismatch produced a wrong rho and failed verification)."""
    from gkr_mimc_tpu.gadget.incircuit import GadgetCircuit, setup
    from gkr_mimc_tpu.hashes.mimc import mimc_keyed_permutation

    x_val = 21
    h_val = mimc_keyed_permutation(x_val, 0)

    def define(cs, gadget):
        x = cs.witness(x_val)  # raw wire BEFORE the public input below
        out = cs.public_input((h_val + 2 * 0 + x_val) % scalar.P)
        h = gadget.update_hasher(cs, cs.constant(0), x)
        cs.assert_is_equal(h, out)

    circ = GadgetCircuit(define)
    compiled = circ.compile()
    assert compiled.r1cs.n_public == 2  # rho + the user's public output
    pk, vk = setup(compiled)
    proof, public_values = circ.prove(compiled, pk, vk)
    G.verify(proof, vk, public_values)


def test_gadget_pipeline_end_to_end():
    """Compile -> Setup -> Solve -> Prove -> Verify on a 1-hash circuit
    (the analog of prover/gadget/prover_test.go:42-79). bn == 0 keeps the
    in-circuit verifier small enough for CI."""
    from gkr_mimc_tpu.gadget.incircuit import GadgetCircuit, setup
    from gkr_mimc_tpu.hashes.mimc import mimc_keyed_permutation

    def define(cs, gadget):
        x = cs.witness(12)
        gadget.update_hasher(cs, cs.constant(0), x)

    circ = GadgetCircuit(define)
    compiled = circ.compile()
    assert compiled.bn == 0
    assert compiled.r1cs.n_public == 1  # the InitialRandomness
    # io wires: x and the hash output (the zero state is constant)
    assert len(compiled.pub_gkr) == 0
    assert len(compiled.priv_gkr) == 2

    pk, vk = setup(compiled)
    proof, public_values = circ.prove(compiled, pk, vk)
    assert proof.initial_randomness == public_values[0] != 0
    G.verify(proof, vk, public_values)

    bad = dataclasses.replace(
        proof, krs_gkr_priv=g1.scalar_mul(g1.to_jac(g1.GEN), 123)
    )
    with pytest.raises(G.Groth16VerifyError):
        G.verify(bad, vk, public_values)


def test_gadget_pipeline_batched_hasher():
    """update_hasher_batch (ONE device dispatch for all hash hints) must
    produce the identical constraint structure and a verifying proof —
    this is the path that scales the pipeline to the reference's bench
    sizes (performances_test.go:17-27); see scripts/bench_pipeline.py."""
    from gkr_mimc_tpu.gadget.incircuit import GadgetCircuit, setup
    from gkr_mimc_tpu.utils.common import random_fr_array

    n = 4
    msgs = random_fr_array(n)

    def define_batch(cs, gadget):
        states = [cs.witness(0) for _ in range(n)]
        gadget.update_hasher_batch(
            cs, states, [cs.witness(m) for m in msgs]
        )

    def define_loop(cs, gadget):
        for m in msgs:
            gadget.update_hasher(cs, cs.witness(0), cs.witness(m))

    circ_b = GadgetCircuit(define_batch)
    circ_l = GadgetCircuit(define_loop)
    comp_b = circ_b.compile()
    comp_l = circ_l.compile()
    assert len(comp_b.r1cs.constraints) == len(comp_l.r1cs.constraints)
    assert comp_b.bn == 2

    pk, vk = setup(comp_b, seed=b"batch-hasher-test")
    proof, public_values = circ_b.prove(comp_b, pk, vk)
    G.verify(proof, vk, public_values)
