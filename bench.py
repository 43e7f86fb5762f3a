#!/usr/bin/env python
"""End-to-end GKR-MiMC prover benchmark.

Measures MiMC hashes proven per second: deterministic inputs (the
reference's RandomFrArray generator) -> witness assignment -> full 94-layer
GKR proof -> host verification, on whatever backend JAX provides (the real
TPU under the driver; CPU elsewhere).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against an estimated single-EPYC throughput of the
reference Go prover. The reference publishes no numbers (BASELINE.md);
300k hashes/s is our good-faith estimate for `gkr.Prove`+`Assign` at
bn=20 on a 64-core EPYC (sumcheck/prover_test.go harness workloads).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gkr_mimc_tpu_jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.gkr import prover as gkr_prover
from gkr_mimc_tpu.gkr import verifier as gkr_verifier
from gkr_mimc_tpu.models.mimc import assign_fused, mimc_circuit
from gkr_mimc_tpu.utils.common import random_fr_array, random_fr_array_np
from gkr_mimc_tpu.utils.convert import ints_to_rows

EPYC_BASELINE_HASHES_PER_SEC = 300_000.0


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    default_bn = 17 if on_tpu else 8
    bn = int(os.environ.get("GKR_BENCH_BN", default_bn))
    n = 1 << bn
    verify = os.environ.get("GKR_BENCH_VERIFY", "1") == "1"

    c = mimc_circuit()

    # deterministic inputs, bit-exact with common/common.go:49-55
    key_np = random_fr_array_np(n)
    state_np = random_fr_array_np(n)
    to_mont = jax.jit(fr.to_mont)
    block = to_mont(jnp.asarray(fr.encode_uint64_array(key_np)))
    state = to_mont(jnp.asarray(fr.encode_uint64_array(state_np)))
    block.block_until_ready()

    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))

    def run():
        a = assign_fused(block, state)
        proof = gkr_prover.prove(c, a, qprime)
        proof.sumcheck_proofs[2].coeffs.block_until_ready()
        return a, proof

    # warmup (compiles, cached persistently)
    t0 = time.time()
    a, proof = run()
    warm = time.time() - t0
    print(f"# warmup (compile+run): {warm:.1f}s", file=sys.stderr)

    t0 = time.time()
    a, proof = run()
    dt = time.time() - t0
    hashes_per_sec = n / dt
    print(f"# prove bn={bn}: {dt*1e3:.1f} ms -> {hashes_per_sec:,.0f} hashes/s",
          file=sys.stderr)

    if verify:
        t0 = time.time()
        gkr_verifier.verify(c, proof, [block, state], a[93], qprime)
        print(f"# verify: {time.time()-t0:.1f}s OK", file=sys.stderr)

    print(json.dumps({
        "metric": f"mimc_hashes_proven_per_sec_bn{bn}",
        "value": round(hashes_per_sec, 1),
        "unit": "hashes/s",
        "vs_baseline": round(hashes_per_sec / EPYC_BASELINE_HASHES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
