"""Timing: coefficient-form PE vs v1 at bn=20 (g=1) and g=8 x bn=17."""

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
    for l in jax.tree_util.tree_leaves(x):
        np.asarray(jax.device_get(l[(slice(0, 1),) * l.ndim]))


def timeit(fn, *args, reps=5):
    force(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    force(outs[-1])
    return (time.perf_counter() - t0) / reps


def rand_tab(n, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))


def main():
    n = 1 << 20
    eq, x0, x1 = rand_tab(n, 1), rand_tab(n, 2), rand_tab(n, 3)
    ark1 = fr.from_int_mont(145646).reshape(16, 1)

    @jax.jit
    def coeff_g1(eq, x0, x1, ark):
        acc = K.cipher_coeff_acc(eq, x0, x1, ark, 1)
        return K.finish_coeff_acc(acc, 8, 7)

    t = timeit(lambda: coeff_g1(eq, x0, x1, ark1))
    print(f"coeff pe g=1 n=2^20: {t*1e3:8.2f} ms")

    ark8 = jnp.broadcast_to(ark1, (16, 8))

    @jax.jit
    def coeff_g8(eq, x0, x1, ark):
        acc = K.cipher_coeff_acc(eq, x0, x1, ark, 8)
        return K.finish_coeff_acc(acc, 8, 7)

    t = timeit(lambda: coeff_g8(eq, x0, x1, ark8))
    print(f"coeff pe g=8 x 2^17 (same total): {t*1e3:8.2f} ms")

    @jax.jit
    def ident_g1(eq, x0):
        acc = K.identity_coeff_acc(eq, x0, 1)
        return K.finish_coeff_acc(acc, 2, 1)

    t = timeit(lambda: ident_g1(eq, x0))
    print(f"coeff identity g=1 n=2^20: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
