"""Micro-timing of ONE grouped cipher-layer sumcheck at full bn vs the
single-instance layer: isolates whether grouped throughput loss lives in
the per-layer program or in the walk/checkpoint plumbing."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gkr_mimc_tpu_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gkr_mimc_tpu.sumcheck import prover as sp
from gkr_mimc_tpu.circuits.gates import CipherGate


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(leaves[0]))


def rand_tab(shape, seed):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 1 << 16, size=shape, dtype=np.uint32)
    t[15] &= 0x1FFF
    return jnp.asarray(t)


def time_layer(bn, g, reps=3):
    n = 1 << bn
    gate = CipherGate(145646)
    if g == 0:  # single
        x0, x1 = rand_tab((16, n), 2), rand_tab((16, n), 3)
        qprimes = rand_tab((16, 1, bn), 11).transpose(1, 2, 0)
        claims = rand_tab((16, 1), 13)
    else:
        x0, x1 = rand_tab((16, g, n), 2), rand_tab((16, g, n), 3)
        qprimes = rand_tab((16, 1, bn, g), 11).transpose(1, 2, 3, 0)
        claims = rand_tab((16, 1, g) if g else (16, 1), 13)

    def layer():
        p, c, f = sp._prove_rounds(gate, gate.params(), [x0, x1], qprimes, claims)
        return p

    t0 = time.perf_counter()
    force(layer())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = layer()
    force(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"bn={bn} G={g or 1}: {dt:.1f} ms/layer (first call {compile_s:.1f}s)",
          flush=True)
    return dt


if __name__ == "__main__":
    bn = int(os.environ.get("MBN", "20"))
    for g in [int(v) for v in os.environ.get("MG", "0,4").split(",")]:
        time_layer(bn, g)
