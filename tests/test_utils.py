"""Profiling harness + multi-host helpers (single-process on the virtual
8-device mesh; real DCN runs reuse the identical code paths)."""

import numpy as np
import jax

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.parallel import mesh as pmesh
from gkr_mimc_tpu.parallel import multihost
from gkr_mimc_tpu.utils import profiling


def test_timer_and_phase_report():
    profiling.phase_report(reset=True)
    with profiling.timed("unit-phase", verbose=False) as t:
        x = jax.numpy.ones((8,))
        t.sync_on(x * 2)
    assert t.elapsed_ms is not None and t.elapsed_ms >= 0
    rep = profiling.phase_report(reset=True)
    assert rep["unit-phase"]["count"] == 1
    assert rep["unit-phase"]["total_ms"] == t.elapsed_ms


def test_profile_trace_writes(tmp_path, monkeypatch):
    with profiling.profile_trace("unit", root=str(tmp_path)) as p:
        jax.numpy.arange(4).sum().block_until_ready()
    files = list((tmp_path / "unit").rglob("*"))
    assert p is not None and files, "trace directory should be populated"
    monkeypatch.setenv("GKR_PROFILE", "0")
    with profiling.profile_trace("off", root=str(tmp_path)) as p2:
        pass
    assert p2 is None


def test_multihost_initialize_noop_single_process():
    multihost.initialize()  # must not raise in a single-process run
    rep = multihost.process_local_report()
    assert rep["process_count"] == 1
    assert rep["global_devices"] >= 8


def test_shard_table_global_matches_device_put():
    mesh = multihost.make_global_mesh()
    d = mesh.shape[pmesh.AXIS]
    n = 8 * d
    x = fr.from_ints_mont(list(range(n)))
    want = pmesh.shard_table(x, mesh)

    x_np = np.asarray(x)

    def fill(shard, m):
        idx = shard + d * np.arange(m)
        return x_np[:, idx]

    got = multihost.shard_table_global(mesh, n, fill)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    # and it round-trips through the unshard view
    assert np.array_equal(np.asarray(pmesh.unshard_table(got)), x_np)


def test_prove_sharded_on_global_arrays():
    from gkr_mimc_tpu.sumcheck import prover as sc_prover
    from gkr_mimc_tpu.sumcheck import testing as sc_testing

    mesh = multihost.make_global_mesh()
    d = mesh.shape[pmesh.AXIS]
    bn = 4
    xs, claims_int, qprimes_int, gate = sc_testing.initialize_cipher_gate_instance(bn)
    qp = sc_testing.to_device_qprimes(qprimes_int)
    cl = sc_testing.to_device_claims(claims_int)
    single = sc_prover.prove(xs, qp, cl, gate)

    def make_global(x):
        x_np = np.asarray(x)

        def fill(shard, m):
            return x_np[:, shard + d * np.arange(m)]

        return multihost.shard_table_global(mesh, x_np.shape[1], fill)

    sharded = pmesh.prove_sharded([make_global(x) for x in xs], qp, cl, gate, mesh)
    assert np.array_equal(np.asarray(single.coeffs), np.asarray(sharded.coeffs))
    assert np.array_equal(
        np.asarray(single.challenges), np.asarray(sharded.challenges)
    )


def test_random_fr_array_offset_contiguous():
    """The offset generator slices one deterministic stream — chunked
    batches (bench GKR_BENCH_TOTAL_LOG2) consume RandomFrArray(total)."""
    import numpy as np

    from gkr_mimc_tpu.utils.common import random_fr_array, random_fr_array_np

    whole = random_fr_array_np(32)
    parts = np.concatenate(
        [random_fr_array_np(8, offset=o) for o in (0, 8, 16, 24)]
    )
    assert np.array_equal(whole, parts)
    assert [int(v) for v in whole[:6]] == random_fr_array(6)


def test_precompile_enumeration_covers_walk():
    """The AOT precompiler enumerates one round program per (gate, size),
    the tails, eq builds and verify programs — and dedupes the shared
    claim-class programs."""
    from gkr_mimc_tpu.models.mimc import mimc_circuit
    from gkr_mimc_tpu.utils import precompile

    c = mimc_circuit()
    jobs = precompile.enumerate_jobs(c, 5)
    labels = [l for l, _ in jobs]
    assert len(labels) == len(set(labels))  # deduped
    assert "make_eq[J=91,91]" in labels
    assert "make_eq[J=1,0]" in labels  # output layer (no claims)
    assert any(l.startswith("tail[CipherGate") for l in labels)
    assert "evaluate" in labels

    grouped = precompile.enumerate_jobs(c, 5, include_verify=True, group=4)
    # grouped mode skips the (single-instance) verifier programs
    assert "evaluate" not in [l for l, _ in grouped]


def test_random_fr_device_matches_host_generator():
    """The on-device deterministic generator (one iota + limb square + xor,
    zero host transfer) is bit-exact with the host encoder of the
    reference's RandomFrArray (common/common.go:49-55)."""
    import jax
    import jax.numpy as jnp

    from gkr_mimc_tpu.fields import fr
    from gkr_mimc_tpu.utils.common import random_fr_array_np, random_fr_device

    f = jax.jit(lambda off: random_fr_device(256, off))
    for off in (0, 1, 77, 1 << 20, (1 << 22) * 3):
        dev = np.asarray(f(jnp.uint32(off)))
        ref = fr.encode_uint64_array(random_fr_array_np(256, offset=off))
        assert (dev == ref).all(), off
