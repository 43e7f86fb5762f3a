#!/usr/bin/env python
"""End-to-end GKR-MiMC prover benchmark.

Measures MiMC hashes proven per second: deterministic inputs (the
reference's RandomFrArray generator) -> witness assignment -> full 94-layer
GKR proof -> batched host/device verification, on whatever backend JAX
provides (the real TPU under the driver; CPU elsewhere).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline model (the reference publishes no numbers, BASELINE.md): the Go
prover's work is ~10.5k Montgomery muls per hash (92 layers x ~2x2^bn
elements halving x (9 gate evals x 6 muls + 3 fold muls) / 2^bn hashes);
a 64-core EPYC sustains ~2G 4x64 Montgomery muls/s (~30ns/mul/core via
gnark-crypto's asm path), giving ~190k hashes/s of pure field math with
zero parallelization overhead. We charge ourselves a conservative 300k
hashes/s baseline (headroom for the reference's real-world efficiency);
override with GKR_BASELINE_HASHES. The >=10x north-star claim
(BASELINE.json) is measured against this documented model.
"""

import json
import os
import sys
import time
from functools import partial

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # CPU AOT cache entries are machine-specific (SIGILL risk across
        # hosts; see utils/cachesafe.machine_scoped_cpu_cache_dir)
        from gkr_mimc_tpu.utils.cachesafe import machine_scoped_cpu_cache_dir

        os.environ["JAX_COMPILATION_CACHE_DIR"] = machine_scoped_cpu_cache_dir()
    else:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/gkr_mimc_tpu_jax_cache"

import jax

# the axon sitecustomize clobbers JAX_PLATFORMS env — honor an explicit
# CPU request via config (must happen before backend init)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.gkr import prover as gkr_prover
from gkr_mimc_tpu.gkr import verifier as gkr_verifier
from gkr_mimc_tpu.models.mimc import assign_fused, mimc_circuit
from gkr_mimc_tpu.utils import precompile
from gkr_mimc_tpu.utils.common import (
    random_fr_array,
    random_fr_array_np,
    random_fr_device,
)
from gkr_mimc_tpu.utils.convert import ints_to_rows

EPYC_BASELINE_HASHES_PER_SEC = float(
    os.environ.get("GKR_BASELINE_HASHES", 300_000.0)
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def force(proof):
    """Force completion of the async dispatch chain with a real
    device->host copy: block_until_ready is unreliable through the axon
    tunnel (the round-1 measurement artifact, STATUS_r02)."""
    import numpy as _np

    _np.asarray(jax.device_get(proof.sumcheck_proofs[2].coeffs))


# deterministic inputs, bit-exact with common/common.go:49-55, generated
# ON DEVICE (one iota + 16-bit-limb square + xor; zero host transfer)
@partial(jax.jit, static_argnums=(0,))
def _gen_input_jit(n: int, offset):
    return fr.to_mont(random_fr_device(n, jnp.uint32(offset)))


_concat_last = jax.jit(lambda *xs: jnp.concatenate(xs, axis=-1))

# to_mont's portable mul materializes (16, 16, n) outer-product planes —
# ~16x the table size — so one fused gen program above 2^20 elements
# overflows HBM (observed: G=4 x bn=20 OOM at generation). Chunk the
# stream instead; values are identical (the generator is index-based).
GEN_CHUNK = 1 << 20


def _gen_input(n: int, offset: int):
    # validate BEFORE the int -> traced-uint32 conversion: a wrapped index
    # would silently diverge from the host generator (advisor r3)
    assert offset + n <= (1 << 32), (offset, n)
    if n <= GEN_CHUNK:
        return _gen_input_jit(n, offset)
    parts = [
        _gen_input_jit(GEN_CHUNK, offset + i) for i in range(0, n, GEN_CHUNK)
    ]
    return _concat_last(*parts)


def measure_fs_hash_ms(reps: int = 40) -> float:
    """MEASURED per-hash Fiat-Shamir latency: a chain of `reps` dependent
    9-word transcript hashes inside one jit (exactly how the prover's
    round loop consumes them), with the tunnel round-trip (the fixed cost
    of the final device->host fetch, ~30 ms on axon) measured separately
    and subtracted — at 20 reps it inflated the per-hash figure ~2.5x."""
    import numpy as _np

    from gkr_mimc_tpu.hashes.mimc import mimc_hash_device

    rng = _np.random.default_rng(7)
    msgs = jnp.asarray(rng.integers(0, 1 << 13, size=(16, 9), dtype=_np.uint32))

    @jax.jit
    def chain(m):
        h = None
        for _ in range(reps):
            h = mimc_hash_device(m)
            m = jnp.broadcast_to(h[:, None], (16, 9))
        return h

    tip = jax.jit(lambda m: chain(m)[:1])
    rtp = jax.jit(lambda i: jnp.full((1,), i, jnp.uint32))
    # warm BOTH probe programs (an unwarmed slice compile inside the timed
    # loop once inflated this measurement ~3x)
    _np.asarray(jax.device_get(tip(msgs)))
    _np.asarray(jax.device_get(rtp(jnp.uint32(0))))
    t0 = time.time()
    for _ in range(3):
        _np.asarray(jax.device_get(tip(msgs)))
    t_mid = time.time()
    for k in range(3):
        _np.asarray(jax.device_get(rtp(jnp.uint32(k))))
    t_end = time.time()
    round_trip = (t_end - t_mid) / 3
    per_chain = (t_mid - t0) / 3 - round_trip
    return max(per_chain, 0.0) / reps * 1e3


def report_layer_roofline(bn: int):
    """Per-layer ms vs roofline: time ONE cipher-layer sumcheck through the
    production path (the unit the 92-layer walk repeats). Roofline model:
    HBM traffic / 820 GB/s (v5e) — the Gruen round kernel reads S+x0+x1
    once and writes the two folded halves, so a full layer (sum over
    halving rounds) moves ~2x the round-1 bytes; the FS-hash chain
    (bn x the MEASURED per-hash latency) is a protocol latency floor on
    top, amortized only by grouped lanes."""
    import numpy as _np

    from gkr_mimc_tpu.circuits.gates import CipherGate
    from gkr_mimc_tpu.sumcheck import prover as sp

    n = 1 << bn
    rng = _np.random.default_rng(7)

    def tab():
        t = rng.integers(0, 1 << 16, size=(16, n), dtype=_np.uint32)
        t[15] &= 0x1FFF  # valid field elements (< p)
        return jnp.asarray(t)

    x0, x1 = tab(), tab()
    gate = CipherGate(145646)
    qprimes = jnp.asarray(
        rng.integers(0, 1 << 13, size=(1, bn, 16), dtype=_np.uint32)
    )
    claims = jnp.asarray(rng.integers(0, 1 << 13, size=(16, 1), dtype=_np.uint32))

    def layer():
        p, c, f = sp._prove_rounds(gate, gate.params(), [x0, x1], qprimes, claims)
        return p

    _np.asarray(jax.device_get(layer()))  # warm
    t0 = time.time()
    reps = 6
    for _ in range(reps):
        out = layer()
    _np.asarray(jax.device_get(out))
    wall = time.time() - t0
    # subtract the fixed device->host round trip (~30 ms on the axon
    # tunnel) the final fetch pays — at 3 reps it inflated per-layer ~10ms
    rt_probe = jnp.zeros((1,), jnp.uint32) + jnp.uint32(1)
    t1 = time.time()
    for _ in range(3):
        _np.asarray(jax.device_get(rt_probe))
    round_trip = (time.time() - t1) / 3
    per_layer_ms = max(wall - round_trip, 0.0) / reps * 1e3
    # reads S (n/2) + x0 + x1 (2n), writes folded x0+x1 (n); halving rounds
    # sum to ~2x round 1
    bytes_moved = 2 * (3.5 + 1) * (n // 2) * 64
    hbm_ms = bytes_moved / 820e9 * 1e3
    fs_hash_ms = measure_fs_hash_ms()
    fs_ms = bn * fs_hash_ms
    log(
        f"# per-layer (cipher sumcheck, bn={bn}): {per_layer_ms:.1f} ms | "
        f"rooflines: HBM {hbm_ms:.1f} ms + FS-chain floor {fs_ms:.1f} ms "
        f"({fs_hash_ms:.2f} ms/hash measured) "
        f"(compute-bound gap: {per_layer_ms / (hbm_ms + fs_ms):.1f}x)"
    )


def bench_sharded(bn: int):
    """Sharded-prover bench over all visible devices (GKR_BENCH_SHARDED=1):
    the TPU-native analog of the reference's multi-core scaling
    (SURVEY.md §2.10); runs on the virtual CPU mesh or a real pod slice."""
    import jax.numpy as jnp

    from gkr_mimc_tpu.parallel import mesh as pmesh
    from gkr_mimc_tpu.utils.common import random_fr_array

    n = 1 << bn
    m = pmesh.make_mesh()
    d = len(jax.devices())
    c = mimc_circuit()
    block = pmesh.shard_table(fr.from_ints_mont(random_fr_array(n)), m)
    state = pmesh.shard_table(fr.from_ints_mont(random_fr_array(n)), m)
    a = pmesh.assign_sharded_mimc(block, state)
    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))

    t0 = time.time()
    proof = pmesh.prove_gkr_sharded(c, a, qprime, m)
    force(proof)
    log(f"# sharded warmup (compile+run): {time.time()-t0:.1f}s")
    t0 = time.time()
    proof = pmesh.prove_gkr_sharded(c, a, qprime, m)
    force(proof)
    dt = time.time() - t0
    hps = n / dt
    log(f"# sharded prove bn={bn} D={d}: {dt:.2f}s -> {hps:,.0f} hashes/s")
    print(json.dumps({
        "metric": f"mimc_hashes_proven_per_sec_sharded_bn{bn}_d{d}",
        "value": round(hps, 1),
        "unit": "hashes/s",
        "vs_baseline": round(hps / EPYC_BASELINE_HASHES_PER_SEC, 3),
    }))


def bench_grouped(bn: int, group: int, verify: bool):
    """Grouped-prover throughput bench: G independent bn-sized proofs in
    one walk (the sequential per-round Fiat-Shamir hash advances all G
    transcript lanes in lockstep, so the group costs ~the wall-clock of
    one instance). G * 2^bn total hashes proven."""
    import jax.numpy as jnp

    from gkr_mimc_tpu.gkr import verifier as gkr_verifier_mod

    n = 1 << bn
    c = mimc_circuit()
    t0 = time.time()
    n_ok, fails = precompile.warm(c, bn, include_verify=False, group=group)
    log(f"# precompile(grouped): {n_ok} programs ({len(fails)} failed) in "
        f"{time.time()-t0:.1f}s")

    # per-lane generation (lane g = stream offsets [g*n, (g+1)*n) for the
    # block, [(G+g)*n, ...) for the state): one (16, n) program per lane
    # keeps the to_mont intermediates bounded (see GEN_CHUNK)
    _stack_lanes = jax.jit(lambda *xs: jnp.stack(xs, axis=1))
    block = _stack_lanes(*[_gen_input(n, g * n) for g in range(group)])
    state = _stack_lanes(
        *[_gen_input(n, (group + g) * n) for g in range(group)]
    )
    import numpy as _np
    _np.asarray(jax.device_get(block[:, :1, :1]))  # warm the transfer path

    qprime = jnp.stack(
        [
            jnp.asarray(ints_to_rows(random_fr_array(bn + g)[g:]))
            for g in range(group)
        ],
        axis=1,
    )  # (bn, G, 16)

    # grouped full-bn lanes exceed HBM with a fully-resident witness
    # (G x 6.3 GB at bn=20); the checkpoint/recompute assignment keeps
    # ~23/94 tables live at identical transcripts
    from gkr_mimc_tpu.models.checkpoint import CheckpointedAssignment

    use_ckpt = os.environ.get("GKR_BENCH_CKPT", "1") == "1"

    def run():
        a = (
            CheckpointedAssignment(block, state)
            if use_ckpt
            else assign_fused(block, state)
        )
        proof = gkr_prover.prove(c, a, qprime)
        return a[93], proof

    t0 = time.time()
    out_table, proof = run()
    force(proof)
    log(f"# grouped warmup (compile+run): {time.time()-t0:.1f}s")
    out_table = proof = None
    t0 = time.time()
    out_table, proof = run()
    force(proof)
    dt = time.time() - t0
    total = group * n
    hps = total / dt
    log(f"# grouped prove bn={bn} G={group}: {dt:.2f}s -> {hps:,.0f} hashes/s")

    if verify:
        t0 = time.time()
        gkr_verifier_mod.verify_grouped(
            c, proof, [block, state], out_table, qprime
        )
        log(f"# grouped verify (all {group} groups): {time.time()-t0:.1f}s OK")

    print(json.dumps({
        "metric": f"mimc_hashes_proven_per_sec_grouped_bn{bn}_g{group}",
        "value": round(hps, 1),
        "unit": "hashes/s",
        "vs_baseline": round(hps / EPYC_BASELINE_HASHES_PER_SEC, 3),
    }))


def bench_chunked(bn: int, total_log2: int, verify: bool):
    """North-star scale: prove 2^total_log2 hashes as sequential 2^bn
    chunks (BASELINE.md: '2^22 MiMC hashes proven with verified bit-exact
    GKR proof'); one chunk's HBM is freed before the next. The input
    stream is the single deterministic RandomFrArray sequence, chunked."""
    import jax.numpy as jnp

    n = 1 << bn
    chunks = 1 << (total_log2 - bn)
    c = mimc_circuit()
    t0 = time.time()
    n_ok, fails = precompile.warm(c, bn, include_verify=verify)
    log(f"# precompile: {n_ok} programs ({len(fails)} failed) in "
        f"{time.time()-t0:.1f}s")
    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))

    # inputs generated on device (no upload); prove dispatch is async, so
    # chunk k+1's device work overlaps chunk k's host-side verification
    def run_chunk(ci):
        block = _gen_input(n, ci * n)
        state = _gen_input(n, (chunks + ci) * n)
        a = assign_fused(block, state)
        proof = gkr_prover.prove(c, a, qprime)
        return block, state, a[93], proof

    t0 = time.time()
    force(run_chunk(0)[3])
    log(f"# warmup (residual compile+run): {time.time()-t0:.1f}s")

    t0 = time.time()
    n_verified = 0
    prev = run_chunk(0)
    for ci in range(1, chunks + 1):
        nxt = run_chunk(ci) if ci < chunks else None  # dispatch next first
        block, state, out_table, proof = prev
        if verify:
            gkr_verifier.verify(c, proof, [block, state], out_table, qprime)
            n_verified += 1
        else:
            force(proof)
        prev = nxt
    dt = time.time() - t0
    total = chunks * n
    hps = total / dt
    log(f"# chunked prove 2^{total_log2} = {chunks} x 2^{bn}: {dt:.1f}s "
        f"-> {hps:,.0f} hashes/s ({n_verified}/{chunks} chunks verified)")
    print(json.dumps({
        "metric": f"mimc_hashes_proven_per_sec_total2e{total_log2}_bn{bn}",
        "value": round(hps, 1),
        "unit": "hashes/s",
        "vs_baseline": round(hps / EPYC_BASELINE_HASHES_PER_SEC, 3),
    }))


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    # TPU default: ONE bn=23 proof of 2^23 MiMC hashes — a superset of the
    # north-star config (BASELINE.md config 5 is 2^22) via the
    # checkpoint/recompute witness (~2^24-capacity analog of the
    # reference's pool, poly/pool.go:13-14). Bigger proofs amortize the
    # per-layer Fiat-Shamir latency floor over more hashes: measured 208k
    # (bn=20) -> 263k (bn=22) -> 283k hashes/s (bn=23); bn=24 would need
    # ~20 GB of span+checkpoint residency (> 16 GB HBM) under the
    # single-level checkpoint scheme.
    default_bn = 23 if on_tpu else 8
    bn = int(os.environ.get("GKR_BENCH_BN", default_bn))
    n = 1 << bn
    verify = os.environ.get("GKR_BENCH_VERIFY", "1") == "1"

    if os.environ.get("GKR_BENCH_SHARDED") == "1":
        bench_sharded(bn)
        return
    group = int(os.environ.get("GKR_BENCH_GROUP", "0"))
    if group > 1:
        bench_grouped(bn, group, verify)
        return
    total_log2 = int(os.environ.get("GKR_BENCH_TOTAL_LOG2", "0"))
    if total_log2 > bn:
        bench_chunked(bn, total_log2, verify)
        return

    c = mimc_circuit()

    # parallel AOT warm of every walk/verify program (persistent-cached)
    t0 = time.time()
    n_ok, fails = precompile.warm(c, bn, include_verify=verify)
    log(f"# precompile: {n_ok} programs ({len(fails)} failed) in "
        f"{time.time()-t0:.1f}s")

    # deterministic inputs, bit-exact with common/common.go:49-55,
    # generated on device (both streams start at offset 0, as round 2 did)
    block = _gen_input(n, 0)
    state = jnp.array(block)  # same generator stream, independent buffer
    # warm the device->host transfer path (the first fetch on a tunneled
    # backend pays a large one-time setup cost)
    import numpy as _np
    _np.asarray(jax.device_get(block[:, :1]))

    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))

    # bn >= 22 exceeds HBM with a fully-resident witness (25 GB): use the
    # checkpoint/recompute assignment (bit-identical transcripts)
    use_ckpt = os.environ.get(
        "GKR_BENCH_CKPT", "1" if bn >= 21 else "0"
    ) == "1"
    if use_ckpt:
        from gkr_mimc_tpu.models.checkpoint import CheckpointedAssignment

    def run():
        # return only the output table + proof: the other 93 assignment
        # tables (6.3 GB at bn=20) must be freed before the next run, or
        # two live assignments exceed HBM
        if use_ckpt:
            a = CheckpointedAssignment(block, state)
        else:
            a = assign_fused(block, state)
        proof = gkr_prover.prove(c, a, qprime)
        return a[93], proof

    # warmup (remaining compiles, all cached persistently)
    t0 = time.time()
    out_table, proof = run()
    force(proof)
    warm = time.time() - t0
    log(f"# warmup (residual compile+run): {warm:.1f}s")

    out_table = proof = None  # free HBM before the timed run
    t0 = time.time()
    out_table, proof = run()
    force(proof)
    dt = time.time() - t0
    hashes_per_sec = n / dt
    log(f"# prove bn={bn}: {dt*1e3:.1f} ms -> {hashes_per_sec:,.0f} hashes/s")
    if on_tpu:
        report_layer_roofline(bn)

    if verify:
        t0 = time.time()
        gkr_verifier.verify(c, proof, [block, state], out_table, qprime)
        log(f"# verify (cold): {time.time()-t0:.1f}s OK")
        t0 = time.time()
        gkr_verifier.verify(c, proof, [block, state], out_table, qprime)
        log(f"# verify (hot): {time.time()-t0:.2f}s OK")

    print(json.dumps({
        "metric": f"mimc_hashes_proven_per_sec_bn{bn}",
        "value": round(hashes_per_sec, 1),
        "unit": "hashes/s",
        "vs_baseline": round(hashes_per_sec / EPYC_BASELINE_HASHES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
