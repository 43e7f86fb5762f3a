"""FS-hash kernel latency vs unroll factor, measured two ways:
  * in-program: 20 data-dependent hashes chained inside ONE jit (how the
    prover runs it — the hash is a sub-kernel of each round program)
  * standalone: one pallas program per hash, chained across dispatches
    (isolates the per-program tunnel/dispatch overhead)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    unroll = os.environ.get("GKR_FS_UNROLL", "7")
    from gkr_mimc_tpu.ops import kernels as K

    rng = np.random.default_rng(7)
    msgs = jnp.asarray(rng.integers(0, 1 << 16, size=(16, 9), dtype=np.uint32))

    CHAIN = 20

    @jax.jit
    def chain(m):
        for _ in range(CHAIN):
            h = K.mimc_hash_fs(m)
            m = h[:, None] * jnp.ones((1, 9), jnp.uint32)
        return h

    np.asarray(jax.device_get(chain(msgs)))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = chain(msgs)
    np.asarray(jax.device_get(out))
    dt = (time.perf_counter() - t0) / (reps * CHAIN)
    print(f"fs_hash unroll={unroll} in-program: {dt*1e3:.3f} ms/hash")

    out = K.mimc_hash_fs(msgs)
    np.asarray(jax.device_get(out))
    t0 = time.perf_counter()
    for _ in range(20):
        out = K.mimc_hash_fs(out[:, None] * jnp.ones((1, 9), jnp.uint32))
    np.asarray(jax.device_get(out))
    dt = (time.perf_counter() - t0) / 20
    print(f"fs_hash unroll={unroll} standalone dispatch: {dt*1e3:.3f} ms/hash")

    g = 8

    @jax.jit
    def chain_g(m):
        for _ in range(CHAIN):
            h = K.mimc_hash_fs_g(m)
            m = h[:, None, :] * jnp.ones((1, 9, 1), jnp.uint32)
        return h

    msgs_g = jnp.asarray(
        rng.integers(0, 1 << 16, size=(16, 9, g), dtype=np.uint32)
    )
    np.asarray(jax.device_get(chain_g(msgs_g)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chain_g(msgs_g)
    np.asarray(jax.device_get(out))
    dt = (time.perf_counter() - t0) / (reps * CHAIN)
    print(f"fs_hash_g G={g} unroll={unroll} in-program: {dt*1e3:.3f} ms/hash")


if __name__ == "__main__":
    main()
