"""Device-time measurement of grouped Gruen round components at G=1 vs G=4.

Method: chain `reps` dependent invocations inside ONE jit program and
fetch only a (16,1) slice — standalone per-call timing through the axon
tunnel is dominated by output download (~150 MB/s), which inflated the
first version of this micro by 10-100x."""

import os
import sys
import time
from functools import partial

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


def tiny(x):
    return np.asarray(jax.device_get(x.reshape(fr.L, -1)[:, :1]))


def bench(label, prog, *args):
    t0 = time.perf_counter()
    tiny(prog(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    tiny(prog(*args))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{label}: {dt:.2f} ms/op (first {c:.1f}s)", flush=True)


def valid_tab(shape, off=0):
    n = int(np.prod(shape))
    v = fr.from_ints_mont(random_fr_array(n + off)[off:])
    return v.reshape((fr.L,) + tuple(shape))


def main():
    bn = int(os.environ.get("MBN", "20"))
    n = 1 << bn
    # tunnel round-trip: the fixed cost every force() pays
    z = jnp.zeros((fr.L, 4), jnp.uint32) + jnp.uint32(1)
    tiny(z)
    t0 = time.perf_counter()
    for _ in range(10):
        tiny(z)
    print(f"tunnel round-trip: {(time.perf_counter()-t0)/10*1e3:.1f} ms",
          flush=True)
    for g in (1, 4):
        print(f"--- G={g} bn={bn}", flush=True)
        x0 = valid_tab((g * n,), 0)
        x1 = valid_tab((g * n,), 1)
        s = valid_tab((g * (n // 2),), 2)
        ark = jnp.broadcast_to(
            fr.from_ints_mont([145646]).reshape(fr.L, 1), (fr.L, g)
        )
        rr = valid_tab((g,), 3).reshape(fr.L, g)

        # PE round 1 (fixed size, REPS independent calls summed)
        @jax.jit
        def pe_chain(s, x0, x1, ark):
            acc = None
            for i in range(REPS):
                a = K.cipher_gruen_acc(s, x0, x1, ark, g)
                acc = a if acc is None else acc + a
            return acc

        bench(f"gruen_acc[{2**bn} x{g}]", pe_chain, s, x0, x1, ark)

        # fold round 1: REPS dependent folds at FIXED size (re-concat)
        @jax.jit
        def fold_chain(x0, x1, rr):
            a, b = x0, x1
            for i in range(REPS):
                fa, fb = K.fold_tables_gm([a, b], rr, 2, g)
                a = jnp.concatenate([fa, fa], axis=-1)
                b = jnp.concatenate([fb, fb], axis=-1)
            return a

        bench(f"fold2[{2**bn} x{g}]", fold_chain, x0, x1, rr)

        # FS hash chain
        msgs = valid_tab((9 * g,), 4).reshape(fr.L, 9, g)

        @jax.jit
        def fs_chain(m):
            h = None
            for _ in range(REPS):
                h = K.mimc_hash_fs_g(m) if g > 1 else K.mimc_hash_fs(m[:, :, 0])
                m = jnp.broadcast_to(h.reshape(fr.L, 1, g), (fr.L, 9, g))
            return h

        bench(f"fs_hash[{g}]", fs_chain, msgs)

        # finish
        acc0 = K.cipher_gruen_acc(s, x0, x1, ark, g)

        @jax.jit
        def fin_chain(a):
            out = None
            for i in range(REPS):
                q = K.finish_gruen_acc(a + jnp.uint32(i))
                out = q if out is None else fr.add(out, q)
            return out

        bench(f"finish[{g}]", fin_chain, acc0)


if __name__ == "__main__":
    main()
