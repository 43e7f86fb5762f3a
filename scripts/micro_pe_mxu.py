"""A/B: cipher partial-eval kernel with MXU-REDC mul vs the current one.

Also validates value equality of the two kernels on the same inputs, and
times the MXU-mul standalone vs fc.mul.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.fields.bn254 import L
from gkr_mimc_tpu.ops import fieldcore as fc
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


# --- v2 PE kernel: same structure, MXU mul ---------------------------------


def _cipher_pe_kernel2(m1_ref, m2_ref, ark_ref, eqb_ref, eqt_ref, x0b_ref,
                       x0t_ref, x1b_ref, x1t_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    m1, m2 = m1_ref[:], m2_ref[:]
    ark = ark_ref[:]
    eq_b, eq_t = eqb_ref[:], eqt_ref[:]
    x0_b, x0_t = x0b_ref[:], x0t_ref[:]
    x1_b, x1_t = x1b_ref[:], x1t_ref[:]

    d_eq = fc.sub(eq_t, eq_b)
    d_x0 = fc.sub(x0_t, x0_b)
    d_x1 = fc.sub(x1_t, x1_b)

    n_evals = o_ref.shape[1]
    eq_c, x0_c, x1_c = eq_b, x0_b, x1_b
    for t in range(n_evals):
        if t == 1:
            eq_c, x0_c, x1_c = eq_t, x0_t, x1_t
        elif t > 1:
            eq_c = fc.add(eq_c, d_eq)
            x0_c = fc.add(x0_c, d_x0)
            x1_c = fc.add(x1_c, d_x1)
        g = fc.pow7_mxu(fc.add(fc.add(x1_c, ark), x0_c), m1, m2)
        prod = fc.mul_mxu(eq_c, g, m1, m2)
        limbs, over = K._blocksum(prod)
        o_ref[0:L, pl.ds(t, 1)] += limbs
        o_ref[L : L + 1, pl.ds(t, 1)] += over


@partial(jax.jit, static_argnums=(4, 5))
def cipher_partial_evals2(eq, x0, x1, ark, n_evals: int, block: int):
    n = eq.shape[-1]
    mid = n // 2
    b = min(block, mid)
    nb = mid // b

    def bot(i):
        return (0, i)

    def top(i):
        return (0, i + nb)

    acc = pl.pallas_call(
        _cipher_pe_kernel2,
        out_shape=jax.ShapeDtypeStruct((L + 1, n_evals), jnp.uint32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((32, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L + 1, n_evals), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(jnp.asarray(fc.REDC_M1), jnp.asarray(fc.REDC_M2), ark.reshape(L, 1),
      eq, eq, x0, x0, x1, x1)
    return K._finish_evals(acc)


def main():
    bn = int(os.environ.get("MBN", "20"))
    n = 1 << bn
    ark = fr.from_int_mont(145646)
    eq, x0, x1 = rand_tab(n, 1), rand_tab(n, 2), rand_tab(n, 3)

    # correctness: same values as the v1 kernel
    small = 1 << 12
    v1 = K.cipher_partial_evals(eq[:, :small], x0[:, :small], x1[:, :small], ark, 9)
    v2 = cipher_partial_evals2(eq[:, :small], x0[:, :small], x1[:, :small], ark, 9, 512)
    ok = bool(jnp.all(fr.canonicalize(v1) == fr.canonicalize(v2)))
    print(f"value match v1 vs v2: {ok}")

    t1 = timeit(lambda: K.cipher_partial_evals(eq, x0, x1, ark, 9))
    print(f"pe v1 (b=512)  n=2^{bn}: {t1*1e3:8.2f} ms")
    for blk in (512, 1024, 2048):
        t2 = timeit(lambda: cipher_partial_evals2(eq, x0, x1, ark, 9, blk))
        print(f"pe v2 (b={blk:4d}) n=2^{bn}: {t2*1e3:8.2f} ms   ({t1/t2:.2f}x)")


if __name__ == "__main__":
    main()
