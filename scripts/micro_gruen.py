"""Component timings: gruen kernel vs direct coeff kernel, folds, suffix
build, FS hash — standalone (dispatch-inflated but comparable)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.ops import kernels as K
from gkr_mimc_tpu.sumcheck import prover as sp


def force(x):
    for l in jax.tree_util.tree_leaves(x):
        np.asarray(jax.device_get(l[(slice(0, 1),) * l.ndim]))


def timeit(fn, reps=5):
    force(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    force(outs[-1])
    return (time.perf_counter() - t0) / reps


def rand_tab(shape, seed):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 1 << 16, size=shape, dtype=np.uint32)
    if shape[0] == 16:
        t[15] &= 0x1FFF
    else:
        t[..., 15] &= 0x1FFF
    return jnp.asarray(t)


def main():
    bn = 20
    n = 1 << bn
    eq, x0, x1 = rand_tab((16, n), 1), rand_tab((16, n), 2), rand_tab((16, n), 3)
    s = eq[:, : n // 2]
    ark = fr.from_int_mont(145646).reshape(16, 1)

    t = timeit(lambda: K.cipher_coeff_acc(eq, x0, x1, ark, 1))
    print(f"coeff_acc  (direct) n=2^20: {t*1e3:8.2f} ms")
    t = timeit(lambda: K.cipher_gruen_acc(s, x0, x1, ark, 1))
    print(f"gruen_acc           n=2^20: {t*1e3:8.2f} ms")

    r = rand_tab((16,), 9)
    t = timeit(lambda: K.fold_tables_gm([eq, x0, x1], r, 3, 1))
    print(f"fold 3 tables       n=2^20: {t*1e3:8.2f} ms")
    t = timeit(lambda: K.fold_tables_gm([x0, x1], r, 2, 1))
    print(f"fold 2 tables       n=2^20: {t*1e3:8.2f} ms")

    q = rand_tab((1, bn, 16), 11)

    @jax.jit
    def suffix(qq):
        return sp._suffix_tables(qq[0], bn - 8)[0]

    t = timeit(lambda: suffix(q))
    print(f"suffix build        n=2^20: {t*1e3:8.2f} ms")

    from gkr_mimc_tpu.poly import multilin

    @jax.jit
    def eqbuild(qq):
        return multilin.eq_table(qq[0])

    t = timeit(lambda: eqbuild(q))
    print(f"old eq build        n=2^20: {t*1e3:8.2f} ms")

    from bench import measure_fs_hash_ms  # noqa

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


if __name__ == "__main__":
    main()
