"""Per-kernel microbenchmark on the real TPU.

Times the three hot kernels (cipher partial-evals, fold, FS hash) at the
sizes a bn=20 layer walk actually dispatches, plus raw dispatch overhead.
All timings force completion with device_get (block_until_ready is
unreliable through the tunnel — STATUS_r02 environment notes).

Usage: python scripts/micro_kernels.py [sizes...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.ops import kernels as K


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    for l in leaves:
        # fetch ONE element only (device_get of the whole leaf would drag
        # the full buffer through the tunnel and dominate the timing)
        tiny = l[(slice(0, 1),) * l.ndim]
        np.asarray(jax.device_get(tiny))


def timeit(fn, *args, reps=5):
    force(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    force(outs[-1])
    return (time.perf_counter() - t0) / reps


def rand_tab(n, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [20, 17, 14]
    ark = fr.from_int_mont(145646)
    print(f"devices: {jax.devices()}")

    for bn in sizes:
        n = 1 << bn
        eq, x0, x1 = rand_tab(n, 1), rand_tab(n, 2), rand_tab(n, 3)
        t_pe = timeit(lambda: K.cipher_partial_evals(eq, x0, x1, ark, 9))
        t_fold = timeit(
            lambda: K.fold_tables([eq, x0, x1], fr.from_int_mont(12345), 3)
        )
        # per-layer table cost model: sum over rounds (halving sizes)
        print(
            f"bn={bn}: cipher_pe(n=2^{bn})={t_pe*1e3:8.2f} ms   "
            f"fold3={t_fold*1e3:8.2f} ms"
        )

    msgs = rand_tab(9, 7)
    t_h = timeit(lambda: K.mimc_hash_fs(msgs), reps=20)
    print(f"mimc_hash_fs(K=9) = {t_h*1e3:8.3f} ms")

    # dispatch overhead: a trivial jitted op round-trip
    tiny = jnp.zeros((16, 256), jnp.uint32)
    f = jax.jit(lambda x: x + 1)
    t_d = timeit(lambda: f(tiny), reps=50)
    print(f"tiny dispatch+sync = {t_d*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
