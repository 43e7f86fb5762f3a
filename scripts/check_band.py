"""TPU parity + timing check: fold_tables_band ≡ fold_tables_gm bit-exactly
(same product, same REDC), and its speedup. Run on the real TPU."""

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

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.ops import kernels as K
from gkr_mimc_tpu.utils.common import random_fr_array

REPS = 32


def valid_tab(shape, off=0):
    n = int(np.prod(shape))
    v = fr.from_ints_mont(random_fr_array(n + off)[off:])
    return v.reshape((fr.L,) + tuple(shape))


def main():
    bn = int(os.environ.get("MBN", "18"))
    n = 1 << bn
    for g in (1, 4):
        x0 = valid_tab((g * n,), 0)
        x1 = valid_tab((g * n,), 1)
        rr = valid_tab((g,), 3).reshape(fr.L, g)

        ref = K.fold_tables_gm([x0, x1], rr, 2, g)
        got = K.fold_tables_band([x0, x1], rr, 2, g)
        for a, b in zip(ref, got):
            ca = np.asarray(jax.device_get(jax.jit(fr.canonicalize)(a)))
            cb = np.asarray(jax.device_get(jax.jit(fr.canonicalize)(b)))
            assert (ca == cb).all(), f"band fold mismatch at g={g}"
        print(f"g={g}: band fold bit-exact", flush=True)

        def chain(fold_f):
            @jax.jit
            def run(a, b, r):
                for _ in range(REPS):
                    fa, fb = fold_f([a, b], r, 2, g)
                    a = jnp.concatenate([fa, fa], axis=-1)
                    b = jnp.concatenate([fb, fb], axis=-1)
                return fa
            return run

        for name, f in (("gm  ", K.fold_tables_gm), ("band", K.fold_tables_band)):
            prog = chain(f)
            np.asarray(jax.device_get(prog(x0, x1, rr)[:, :1]))
            t0 = time.perf_counter()
            np.asarray(jax.device_get(prog(x0, x1, rr)[:, :1]))
            dt = (time.perf_counter() - t0) / REPS * 1e3
            print(f"g={g} fold_{name}: {dt:.2f} ms/fold (2 tables, 2^{bn})",
                  flush=True)


if __name__ == "__main__":
    main()
