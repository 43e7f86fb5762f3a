"""Raw per-op throughput inside Pallas kernels on the real TPU.

Measures uint32 multiply / add / shift / roll / where / f32 multiply and an
MXU dot at the shapes the field core uses, to pin the cost model that the
round-3 kernel redesign optimizes against.

Each kernel runs R dependent iterations of the op over a (16, B) block with
a grid over N/B blocks; the op count is R * grid * vregs-per-block so the
derived "lane-ops/s" is directly comparable across ops.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, B, N = 16, int(__import__("os").environ.get("MB", 2048)), 1 << 19
R = int(__import__("os").environ.get("MR", 256))  # dependent reps per block


def force(x):
    tiny = x[(slice(0, 1),) * x.ndim]
    np.asarray(jax.device_get(tiny))


def timeit(fn, *args, reps=10):
    force(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    force(outs[-1])
    return (time.perf_counter() - t0) / reps


def make_bench(body, dtype=jnp.uint32):
    def kern(x_ref, y_ref, o_ref):
        x = x_ref[:]
        y = y_ref[:]
        for _ in range(R):
            x = body(x, y)
        o_ref[:] = x

    @jax.jit
    def run(x, y):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((L, N), dtype),
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec((L, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(x, y)

    return run


def lane_ops_rate(t, ops_per_iter=1):
    total = R * N * L * ops_per_iter  # scalar lane-ops
    return total / t / 1e12


def main():
    rng = np.random.default_rng(0)
    xu = jnp.asarray(rng.integers(0, 1 << 16, size=(L, N), dtype=np.uint32))
    yu = jnp.asarray(rng.integers(1, 1 << 16, size=(L, N), dtype=np.uint32))
    xf = jnp.asarray(rng.random(size=(L, N), dtype=np.float32))
    yf = jnp.asarray(rng.random(size=(L, N), dtype=np.float32))

    cases = [
        ("u32 mul", make_bench(lambda x, y: x * y), xu, yu),
        ("u32 add", make_bench(lambda x, y: x + y), xu, yu),
        ("u32 mul+add", make_bench(lambda x, y: x * y + y), xu, yu),
        ("u32 and+shr", make_bench(lambda x, y: (x & y) + (x >> 16)), xu, yu),
        ("u32 where", make_bench(lambda x, y: jnp.where(x > y, x, y)), xu, yu),
        ("u32 roll", make_bench(lambda x, y: pltpu.roll(x, 1, 0) + y), xu, yu),
        ("f32 fma", make_bench(lambda x, y: x * y + y, jnp.float32), xf, yf),
        ("i32<->f32", make_bench(
            lambda x, y: x.astype(jnp.int32).astype(jnp.float32).astype(
                jnp.int32).astype(jnp.uint32) + y), xu, yu),
    ]
    for name, fn, x, y in cases:
        t = timeit(fn, x, y)
        print(f"{name:12s}: {t*1e3:7.3f} ms -> {lane_ops_rate(t):6.3f} T lane-ops/s")

    # MXU dot inside pallas at the REDC constant-product shape:
    # (32, 64) matrix x (32, B) block in f32 (exact for 8-bit pieces)
    M = jnp.asarray(rng.integers(0, 256, size=(64, 32)).astype(np.float32))

    def dot_kern(m_ref, x_ref, o_ref):
        x = x_ref[:]
        m = m_ref[:]
        acc = jnp.zeros((64, B), jnp.float32)
        for _ in range(R):
            acc = acc + jax.lax.dot_general(
                m, x, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc

    @jax.jit
    def dot_run(m, x):
        return pl.pallas_call(
            dot_kern,
            out_shape=jax.ShapeDtypeStruct((64, N), jnp.float32),
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec((64, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((32, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((64, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(m, x)

    x32 = jnp.asarray(rng.integers(0, 256, size=(32, N)).astype(np.float32))
    t = timeit(dot_run, M, x32)
    macs = R * (N // B) * 64 * 32 * B
    print(f"{'f32 dot 64x32':12s}: {t*1e3:7.3f} ms -> {macs/t/1e12:6.3f} T MAC/s")


if __name__ == "__main__":
    main()
