"""Multi-process DCN-analog test (SURVEY.md §2.10 multi-host row): two
coordinator+worker processes, 4 virtual CPU devices each, build a global
8-device mesh, shard the witness with `shard_table_global` (each process
materializes only its addressable shards), run the full sharded GKR walk,
and assert the transcript is bit-identical to the single-process prover.

Cross-process collectives ride jaxlib's Gloo CPU backend — the CI stand-in
for DCN."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

BN = 4

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gkr_mimc_tpu_jax_cache")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]; bn = int(sys.argv[4])
    sys.path.insert(0, sys.argv[5])

    import numpy as np
    import jax.numpy as jnp
    from gkr_mimc_tpu.fields import fr
    from gkr_mimc_tpu.models.mimc import mimc_circuit
    from gkr_mimc_tpu.parallel import mesh as pmesh
    from gkr_mimc_tpu.parallel import multihost
    from gkr_mimc_tpu.utils.common import random_fr_array
    from gkr_mimc_tpu.utils.convert import ints_to_rows

    multihost.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    mesh = multihost.make_global_mesh()
    assert mesh.shape[pmesh.AXIS] == 8

    n = 1 << bn
    c = mimc_circuit()
    block_ints = random_fr_array(n)
    state_ints = random_fr_array(n)

    def fill_of(vals):
        def fill(d, m):
            idx = [d + 8 * k for k in range(m)]
            return ints_to_rows([vals[i] for i in idx]).T
        return fill

    block = multihost.shard_table_global(mesh, n, fill_of(block_ints))
    state = multihost.shard_table_global(mesh, n, fill_of(state_ints))
    a = pmesh.assign_sharded_mimc(block, state)
    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))
    proof = pmesh.prove_gkr_sharded(c, a, qprime, mesh)

    if pid == 0:
        out = {}
        for l in (2, 3, 93):
            out[f"coeffs{l}"] = np.asarray(jax.device_get(proof.sumcheck_proofs[l].coeffs))
            out[f"chals{l}"] = np.asarray(jax.device_get(proof.sumcheck_proofs[l].challenges))
        np.savez(os.path.join(outdir, "transcript.npz"), **out)
    print(f"worker {pid} done", flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_transcript_parity(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wfile = tmp_path / "worker.py"
    wfile.write_text(WORKER)
    port = _free_port()

    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(wfile), str(pid), str(port), str(tmp_path), str(BN), repo],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    # single-process reference (this process: 8 virtual devices, 1 host)
    import jax
    import jax.numpy as jnp

    from gkr_mimc_tpu.fields import fr
    from gkr_mimc_tpu.gkr import prover as gkr_prover
    from gkr_mimc_tpu.models.mimc import assign_fused, mimc_circuit
    from gkr_mimc_tpu.utils.common import random_fr_array
    from gkr_mimc_tpu.utils.convert import ints_to_rows

    n = 1 << BN
    c = mimc_circuit()
    block = fr.from_ints_mont(random_fr_array(n))
    state = fr.from_ints_mont(random_fr_array(n))
    a = assign_fused(block, state)
    qprime = jnp.asarray(ints_to_rows(random_fr_array(BN)))
    ref = gkr_prover.prove(c, a, qprime)

    got = np.load(tmp_path / "transcript.npz")
    for l in (2, 3, 93):
        rc = np.asarray(jax.device_get(ref.sumcheck_proofs[l].coeffs))
        rh = np.asarray(jax.device_get(ref.sumcheck_proofs[l].challenges))
        assert (got[f"coeffs{l}"] == rc).all(), f"layer {l} coeffs diverge"
        assert (got[f"chals{l}"] == rh).all(), f"layer {l} challenges diverge"
