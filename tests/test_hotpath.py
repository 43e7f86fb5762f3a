"""Head-round / donation / edge-size coverage for the sumcheck prover.

The TPU bench runs the unrolled head rounds (tables larger than
2**TAIL_BITS); CPU tests at bn <= 4 normally exercise only the masked-scan
tail. Shrinking TAIL_BITS to 2 forces the head-round code path — per-size
jitted programs, donation bookkeeping, head+tail packaging — onto the CPU
suite (VERDICT r1 gap; reference sweep: sumcheck/prover_test.go:42-94 runs
bn 0..14).
"""

import subprocess
import sys

import pytest

from gkr_mimc_tpu.fields import scalar
from gkr_mimc_tpu.poly import multilin
from gkr_mimc_tpu.poly.lagrange import eval_univariate
from gkr_mimc_tpu.sumcheck import prover, testing, verifier
from gkr_mimc_tpu.utils.convert import rows_to_ints


@pytest.fixture
def small_tail(monkeypatch):
    monkeypatch.setattr(prover, "TAIL_BITS", 2)
    yield


def _roundtrip(xs, claims_int, qprimes_int, gate):
    qp = testing.to_device_qprimes(qprimes_int)
    cl = testing.to_device_claims(claims_int)
    scp = prover.prove(xs, qp, cl, gate)
    coeffs_int = rows_to_ints(scp.coeffs)
    chals, final_claim, recomb = verifier.verify(claims_int, coeffs_int)
    assert rows_to_ints(scp.challenges) == chals
    fc = rows_to_ints(scp.final_claims)
    g = gate.eval_scalar(fc[1:])
    eq_evals = [multilin.eq_eval_scalar(q, chals) for q in qprimes_int]
    assert scalar.mul(g, eval_univariate(eq_evals, recomb)) == final_claim
    return scp


@pytest.mark.parametrize("bn", list(range(0, 9)))
def test_cipher_sweep_with_head_rounds(bn, small_tail):
    """bn 0..8 with TAIL_BITS=2: bn >= 3 runs real unrolled head rounds."""
    xs, claims_int, qprimes_int, gate = testing.initialize_cipher_gate_instance(bn)
    _roundtrip(xs, claims_int, qprimes_int, gate)


def test_bn0_empty_proof(small_tail):
    """bn=0: no rounds at all — the proof is empty, the claim is checked
    directly against the single evaluation (edge the reference covers by
    its bn-0 sweep start)."""
    xs, claims_int, qprimes_int, gate = testing.initialize_cipher_gate_instance(0)
    scp = _roundtrip(xs, claims_int, qprimes_int, gate)
    assert scp.coeffs.shape[0] == 0
    assert scp.challenges.shape[0] == 0


def test_multi_claim_with_head_rounds(small_tail):
    xs, claims_int, qprimes_int, gate = testing.initialize_multi_instance(5, 7)
    _roundtrip(xs, claims_int, qprimes_int, gate)


def test_head_tail_transcripts_agree():
    """The same instance proven with TAIL_BITS=2 (head+tail split) and the
    default all-tail path must emit IDENTICAL proofs — the split is pure
    scheduling, never transcript-visible."""
    bn = 6
    xs, claims_int, qprimes_int, gate = testing.initialize_cipher_gate_instance(bn)
    qp = testing.to_device_qprimes(qprimes_int)
    cl = testing.to_device_claims(claims_int)

    old = prover.TAIL_BITS
    try:
        prover.TAIL_BITS = 2
        with_head = prover.prove(xs, qp, cl, gate)
        prover.TAIL_BITS = 12
        all_tail = prover.prove(xs, qp, cl, gate)
    finally:
        prover.TAIL_BITS = old

    assert rows_to_ints(with_head.coeffs) == rows_to_ints(all_tail.coeffs)
    assert rows_to_ints(with_head.challenges) == rows_to_ints(all_tail.challenges)
    assert rows_to_ints(with_head.final_claims) == rows_to_ints(
        all_tail.final_claims
    )


def test_gkr_walk_with_head_rounds(small_tail):
    """Full MiMC GKR walk at bn=4 with TAIL_BITS=2: per-layer sumchecks
    run head rounds, the verifier must still accept."""
    import jax.numpy as jnp

    from gkr_mimc_tpu.fields import fr
    from gkr_mimc_tpu.gkr import prover as gkr_prover
    from gkr_mimc_tpu.gkr import verifier as gkr_verifier
    from gkr_mimc_tpu.models.mimc import assign_fused, mimc_circuit
    from gkr_mimc_tpu.utils.common import random_fr_array
    from gkr_mimc_tpu.utils.convert import ints_to_rows

    bn = 4
    n = 1 << bn
    c = mimc_circuit()
    block = jnp.asarray(fr.encode_mont_ints(random_fr_array(n)))
    state = jnp.asarray(fr.encode_mont_ints(random_fr_array(n)))
    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))
    a = assign_fused(block, state)
    proof = gkr_prover.prove(c, a, qprime)
    gkr_verifier.verify(c, proof, [block, state], a[93], qprime)


PALLAS_AB_SCRIPT = r"""
import os, sys, json
import jax.numpy as jnp
from gkr_mimc_tpu.sumcheck import prover, testing
from gkr_mimc_tpu.utils.convert import rows_to_ints
out = {}
# bn=13 engages the fast single-pass eq build alongside the round kernels
for label, (bn, nc) in {"single": (13, 1), "multi": (13, 9)}.items():
    if nc == 1:
        xs, claims_int, qprimes_int, gate = testing.initialize_cipher_gate_instance(bn)
    else:
        xs, claims_int, qprimes_int, gate = testing.initialize_multi_instance(bn, nc)
    qp = testing.to_device_qprimes(qprimes_int)
    cl = testing.to_device_claims(claims_int)
    scp = prover.prove(xs, qp, cl, gate)
    out[label] = {
        "coeffs": [[str(v) for v in row] for row in rows_to_ints(scp.coeffs)],
        "chals": [str(v) for v in rows_to_ints(scp.challenges)],
    }
print(json.dumps(out))
"""


@pytest.mark.skipif(
    "GKR_TPU_TEST" not in __import__("os").environ,
    reason="needs a real TPU (set GKR_TPU_TEST=1)",
)
def test_pallas_vs_portable_bit_equal():
    """On a real TPU: the Pallas kernel path and the portable XLA path must
    emit bit-identical proofs (run as subprocesses so each traces its own
    programs)."""
    import json
    import os

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "axon"
    outs = []
    for disable in ("0", "1"):
        env["GKR_PALLAS_DISABLE"] = disable
        r = subprocess.run(
            [sys.executable, "-c", PALLAS_AB_SCRIPT],
            capture_output=True,
            text=True,
            env=env,
            timeout=1800,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(json.loads(r.stdout.strip().splitlines()[-1]))
    assert outs[0] == outs[1]


def test_monolith_matches_per_round():
    """Subprocess wrapper: XLA:CPU deterministically aborts compiling this
    test's (tiny, bn=6) monolith programs when run after the rest of the
    suite — reproduced three times at jax compiler.py
    backend_compile_and_load / executable.serialize with 122 GB RAM free
    and a fresh cache, and never in isolation, surviving clear_caches +
    gc + cache-write guards. Process isolation is the only reliable cure;
    the assertions are unchanged (_monolith_matches_per_round_impl)."""
    import os

    env = dict(os.environ)
    env["GKR_HOTPATH_SUBPROC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    preamble = (
        "import os\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_compilation_cache_dir',"
        " os.environ.get('JAX_COMPILATION_CACHE_DIR'))\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)\n"
    )
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            preamble
            + "from tests.test_hotpath import _monolith_matches_per_round_impl"
            "\n_monolith_matches_per_round_impl()\nprint('MONOLITH_OK')",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=3600,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert "MONOLITH_OK" in r.stdout


def _monolith_matches_per_round_impl():
    """The whole-layer monolith program (GKR_MONOLITH=1, the TPU default —
    one dispatch per layer) must produce bit-identical transcripts to the
    per-round program chain for every claim class, single and grouped."""
    import os

    class _EnvPatch:
        def setenv(self, k, v):
            os.environ[k] = v

    monkeypatch = _EnvPatch()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gkr_mimc_tpu.circuits.gates import CipherGate, IdentityGate
    from gkr_mimc_tpu.fields import fr
    from gkr_mimc_tpu.sumcheck import prover as sp
    from gkr_mimc_tpu.utils.common import random_fr_array
    from gkr_mimc_tpu.utils.convert import ints_to_rows

    bn, n = 6, 64

    def tabs(k, seed):
        vals = random_fr_array(k * n + seed)[seed:]
        return fr.from_ints_mont(vals).reshape(fr.L, k, n)

    cases = []
    cg = CipherGate(145646)
    x = tabs(2, 1)
    qp1 = jnp.asarray(ints_to_rows(random_fr_array(bn)))[None]  # (1, bn, 16)
    cases.append((cg, [x[:, 0], x[:, 1]], qp1, None))  # output layer (J=0)
    claims1 = fr.from_ints_mont(random_fr_array(1)).reshape(fr.L, 1)
    cases.append((cg, [x[:, 0], x[:, 1]], qp1, claims1))  # 1 claim
    ig = IdentityGate()
    qp3 = jnp.stack(
        [jnp.asarray(ints_to_rows(random_fr_array(bn + j)[j:])) for j in range(3)]
    )
    claims3 = fr.from_ints_mont(random_fr_array(3)).reshape(fr.L, 3)
    cases.append((ig, [x[:, 0]], qp3, claims3))  # multi-claim identity

    for gate, xs, qp, claims in cases:
        monkeypatch.setenv("GKR_MONOLITH", "0")
        ref = sp.prove(xs, qp, claims, gate)
        monkeypatch.setenv("GKR_MONOLITH", "1")
        got = sp.prove(xs, qp, claims, gate)
        for a, b in (
            (ref.coeffs, got.coeffs),
            (ref.challenges, got.challenges),
            (ref.final_claims, got.final_claims),
        ):
            assert (
                np.asarray(jax.device_get(a)) == np.asarray(jax.device_get(b))
            ).all(), gate.name

    # grouped (G=2) single-claim cipher
    g = 2
    xg = tabs(4, 2).reshape(fr.L, 2, g, n)
    qpg = jnp.stack(
        [jnp.asarray(ints_to_rows(random_fr_array(bn + j)[j:])) for j in range(g)],
        axis=1,
    )[None]  # (1, bn, G, 16)
    claimsg = fr.from_ints_mont(random_fr_array(g)).reshape(fr.L, 1, g)
    monkeypatch.setenv("GKR_MONOLITH", "0")
    ref = sp.prove([xg[:, 0], xg[:, 1]], qpg, claimsg, cg)
    monkeypatch.setenv("GKR_MONOLITH", "1")
    got = sp.prove([xg[:, 0], xg[:, 1]], qpg, claimsg, cg)
    for a, b in (
        (ref.coeffs, got.coeffs),
        (ref.challenges, got.challenges),
        (ref.final_claims, got.final_claims),
    ):
        assert (
            np.asarray(jax.device_get(a)) == np.asarray(jax.device_get(b))
        ).all(), "grouped"
