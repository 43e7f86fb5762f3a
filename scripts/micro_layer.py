"""Layer-level cost decomposition at bn=20 on the real TPU.

Times: fold3, PE at two block sizes, the FS hash, and a whole single-layer
cipher sumcheck (the production _prove_rounds path) — to separate kernel
time from dispatch/orchestration overhead.
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
        tiny = l[(slice(0, 1),) * l.ndim]
        np.asarray(jax.device_get(tiny))


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
    bn = int(os.environ.get("MBN", "20"))
    n = 1 << bn
    ark = fr.from_int_mont(145646)
    r = fr.from_int_mont(12345)
    eq, x0, x1 = rand_tab(n, 1), rand_tab(n, 2), rand_tab(n, 3)

    t = timeit(lambda: K.fold_tables([eq, x0, x1], r, 3))
    print(f"fold3   n=2^{bn}: {t*1e3:8.2f} ms")
    t = timeit(lambda: K.cipher_partial_evals(eq, x0, x1, ark, 9))
    print(f"pe9     n=2^{bn}: {t*1e3:8.2f} ms")

    msgs = rand_tab(9, 7)
    t = timeit(lambda: K.mimc_hash_fs(msgs), reps=20)
    print(f"fs_hash unroll={os.environ.get('GKR_FS_UNROLL', '7')}: {t*1e3:8.3f} ms")

    # whole single-layer cipher sumcheck through the production path
    from gkr_mimc_tpu.circuits.gates import CipherGate
    from gkr_mimc_tpu.sumcheck import prover as sp

    gate = CipherGate(145646)
    qprimes = jnp.asarray(
        np.stack([np.asarray(rand_tab(bn, 11)).T], axis=0)
    )  # (1, bn, 16)
    claims = rand_tab(1, 13)

    def layer():
        p, c, f = sp._prove_rounds(gate, gate.params(), [x0, x1], qprimes, claims)
        return p

    t = timeit(layer, reps=3)
    print(f"layer sumcheck (prod path) bn={bn}: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
