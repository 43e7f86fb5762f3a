"""Layer-level cost decomposition at bn=20 on the real TPU.

Times every component of the per-layer walk: witness kernel, eq build,
coefficient-form PE, fold, FS hash, the masked tail program, and the whole
single-layer cipher sumcheck — to locate the dominant cost precisely.
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
    part = int(os.environ.get("MPART", "0"))
    bn = int(os.environ.get("MBN", "20"))
    n = 1 << bn
    ark = fr.from_int_mont(145646)
    ark_g = jnp.broadcast_to(ark.reshape(16, 1), (16, 1))
    r = fr.from_int_mont(12345)
    eq, x0, x1 = rand_tab(n, 1), rand_tab(n, 2), rand_tab(n, 3)

    from gkr_mimc_tpu.models.mimc import assign_fused

    if part:
        run_part2(bn, eq, x0, x1)
        return

    t = timeit(lambda: assign_fused(x0, x1)[93], reps=3)
    print(f"witness (91 tables) n=2^{bn}: {t*1e3:8.2f} ms", flush=True)

    from gkr_mimc_tpu.sumcheck import prover as sp

    qprimes = jnp.asarray(
        np.random.default_rng(11).integers(0, 1 << 16, (1, bn, 16), np.uint32)
    )
    claims = rand_tab(1, 13)
    t = timeit(lambda: sp._make_eq_jit(qprimes, claims), reps=5)
    print(f"eq build (1 claim) n=2^{bn}: {t*1e3:8.2f} ms", flush=True)

    t = timeit(lambda: K.cipher_coeff_acc(eq, x0, x1, ark_g, 1))
    print(f"coeff PE acc n=2^{bn}: {t*1e3:8.2f} ms", flush=True)
    acc = K.cipher_coeff_acc(eq, x0, x1, ark_g, 1)
    t = timeit(lambda: K.finish_coeff_acc(acc, 8, 7))
    print(f"finish acc: {t*1e3:8.2f} ms", flush=True)

    t = timeit(lambda: K.fold_tables_gm([eq, x0, x1], r, 3, 1))
    print(f"fold3 (gm) n=2^{bn}: {t*1e3:8.2f} ms", flush=True)

    msgs = rand_tab(9, 7)

    @jax.jit
    def chain(m):
        for _ in range(10):
            h = K.mimc_hash_fs(m)
            m = h[:, None] * jnp.ones((1, 9), jnp.uint32)
        return h

    t = timeit(chain, msgs, reps=5) / 10
    print(f"fs_hash (in-program): {t*1e3:8.3f} ms", flush=True)

    run_part2(bn, eq, x0, x1)


def run_part2(bn, eq, x0, x1):
    import numpy as np
    from gkr_mimc_tpu.sumcheck import prover as sp

    qprimes = jnp.asarray(
        np.random.default_rng(11).integers(0, 1 << 16, (1, bn, 16), np.uint32)
    )
    claims = rand_tab(1, 13)
    # one full round at 2^bn through _round_step_coeff (PE+finish+hash+fold)
    from gkr_mimc_tpu.circuits.gates import CipherGate

    gate = CipherGate(145646)
    gp = gate.params()

    @jax.jit
    def round_coeff(e, a, b):
        return sp._round_step_coeff("cipher", gate, gp, e, [a, b], False)

    t = timeit(round_coeff, eq, x0, x1, reps=5)
    print(f"round (coeff, full) n=2^{bn}: {t*1e3:8.2f} ms", flush=True)

    # masked tail program (8 rounds at <=2^8)
    eq_s, x0_s, x1_s = rand_tab(256, 21), rand_tab(256, 22), rand_tab(256, 23)
    t = timeit(
        lambda: sp._tail_jit_keep(gate, gate.params(), eq_s, [x0_s, x1_s]),
        reps=5,
    )
    print(f"tail program (8 masked rounds): {t*1e3:8.2f} ms", flush=True)

    def layer():
        p, c, f = sp._prove_rounds(gate, gate.params(), [x0, x1], qprimes, claims)
        return p

    t = timeit(layer, reps=3)
    print(f"layer sumcheck (prod path) bn={bn}: {t*1e3:8.2f} ms", flush=True)

    # identity fan-out layer (91 claims)
    from gkr_mimc_tpu.circuits.gates import IdentityGate

    ig = IdentityGate()
    qp91 = jnp.asarray(
        np.random.default_rng(31).integers(0, 1 << 16, (91, bn, 16), np.uint32)
    )
    cl91 = rand_tab(91, 33)

    def layer91():
        p, c, f = sp._prove_rounds(ig, ig.params(), [x0], qp91, cl91)
        return p

    t = timeit(layer91, reps=3)
    print(f"fan-out layer (91 claims) bn={bn}: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
