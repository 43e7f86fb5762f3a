"""Decompose the in-kernel field-mul cost: schoolbook product vs MXU REDC
vs carry chains, measured as dependent-mul chains inside ONE Pallas kernel
(grid over 2^20 lanes, K chained muls per block) so per-dispatch overhead
amortizes away. This picks the round-4 PE step-change with data instead of
op-count guesses.

Variants:
  mul_mxu   : current production mul (VPU schoolbook + MXU REDC)
  mul_vpu   : pure-VPU mul (schoolbook + scalar-constant REDC)
  school    : schoolbook product + shrink only (no REDC — timing only)
  redc      : the REDC stage only (digits + 2 matmuls + carries)
  sq_mxu    : square_mxu (double_cross schoolbook)
  rolla     : roll-a-first schoolbook variant (1 roll/plane instead of 2)
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

from gkr_mimc_tpu.fields.bn254 import L
from gkr_mimc_tpu.ops import fieldcore as fc

CHAIN = 8


def force(x):
    np.asarray(jax.device_get(x[:1, :1]))


def timeit(fn, *args, reps=10):
    force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / reps


def rand_tab(n, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))


def _schoolbook_only(a, b):
    acc = fc._Acc(a.shape)
    fc._accum_product(a, b, acc)
    t_lo, o1 = fc.shrink_rows(acc.lo, 23, with_over=True)
    t_hi = fc.shrink_rows(fc._add_row0(acc.hi, o1), 23)
    return t_lo ^ t_hi  # keep both alive


def _rolla_schoolbook(a, b):
    """Variant: pre-roll `a` by j each plane; product rows land directly in
    (wrapped) column space — one roll per plane instead of two."""
    n = a.shape[0]
    rid = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    lo_acc = jnp.zeros(a.shape, jnp.uint32)
    hi_acc = jnp.zeros(a.shape, jnp.uint32)
    ar = a
    for j in range(n):
        if j > 0:
            ar = pltpu.roll(ar, 1, 0)  # ar row k = a_{k-j mod 16}
        bj = jnp.broadcast_to(b[j : j + 1], (1,) + a.shape[1:])
        p = ar * bj  # row k -> col k (if k>=j) else col k+16
        plo = p & fc.MASK
        phi = p >> 16  # -> col k+1 (if k>=j) else col k+17
        mlo = rid >= j
        lo_acc = lo_acc + jnp.where(mlo, plo, 0)
        hi_acc = hi_acc + jnp.where(mlo, jnp.zeros_like(plo), plo)
        phir = pltpu.roll(phi, 1, 0)
        mhi = rid >= j + 1
        lo_acc = lo_acc + jnp.where(mhi, phir, 0)
        hi_acc = hi_acc + jnp.where(mhi, jnp.zeros_like(phir), phir)
    t_lo, o1 = fc.shrink_rows(lo_acc, 23, with_over=True)
    t_hi = fc.shrink_rows(fc._add_row0(hi_acc, o1), 23)
    return t_lo, t_hi


def _redc_only(t_lo, t_hi, m1, m2):
    dlo = t_lo & jnp.uint32(0xFF)
    dhi = t_lo >> 8
    dhi = jnp.where(fc._rowid(dhi.shape) == L - 1, dhi & jnp.uint32(0xFF), dhi)
    digits = jnp.concatenate([dlo, dhi], axis=0)
    m_cols = fc._u32(fc._mxu_dot(m1, fc._f32(digits)))
    m_dig = fc.shrink_rows(m_cols, 23, width=8)
    m_dig = jnp.where(fc._rowid(m_dig.shape) == 31, m_dig & jnp.uint32(0xFF), m_dig)
    mp = fc._mxu_dot(m2, fc._f32(m_dig))
    mp_e = fc._u32(mp[:32])
    mp_o = fc._u32(mp[32:])
    c16 = mp_e + (mp_o << 8)
    lo_cols = c16[:L] + t_lo
    _, o3 = fc.carry_rows(lo_cols, 32, with_over=True)
    hi_cols = fc._add_row0(c16[L:] + t_hi, o3)
    return fc.carry_rows(hi_cols, 32)


def make_chain_kernel(body_has_mats: bool, body):
    def kern(*refs):
        if body_has_mats:
            m1, m2, a_ref, b_ref, o_ref = refs
            m1v, m2v = m1[:], m2[:]
        else:
            a_ref, b_ref, o_ref = refs
            m1v = m2v = None
        x = a_ref[:]
        b = b_ref[:]
        for _ in range(CHAIN):
            x = body(x, b, m1v, m2v)
        o_ref[:] = x

    return kern


@partial(jax.jit, static_argnums=(2, 3))
def run_chain(a, b, name: str, block: int):
    n = a.shape[-1]
    bodies = {
        "mul_mxu": lambda x, y, m1, m2: fc.mul_mxu(x, y, m1, m2),
        "mul_vpu": lambda x, y, m1, m2: fc.mul(x, y),
        "school": lambda x, y, m1, m2: _schoolbook_only(x, y),
        "sq_mxu": lambda x, y, m1, m2: fc.square_mxu(x, m1, m2),
        "rolla": lambda x, y, m1, m2: (lambda t: t[0] ^ t[1])(
            _rolla_schoolbook(x, y)
        ),
        "rolla_full": lambda x, y, m1, m2: (lambda t: _redc_only(
            fc.shrink_rows(t[0], 18), fc.shrink_rows(t[1], 18), m1, m2
        ))(_rolla_schoolbook(x, y)),
        "redc": lambda x, y, m1, m2: _redc_only(x, y, m1, m2),
    }
    body = bodies[name]
    has_mats = name != "mul_vpu" and name != "school" and name != "rolla"
    in_specs = []
    args = []
    if has_mats:
        in_specs += [
            pl.BlockSpec((32, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        args += [jnp.asarray(fc.REDC_M1), jnp.asarray(fc.REDC_M2)]
    in_specs += [
        pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args += [a, b]
    return pl.pallas_call(
        make_chain_kernel(has_mats, body),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=(n // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(*args)


def main():
    n = 1 << int(os.environ.get("MBN", "20"))
    a, b = rand_tab(n, 1), rand_tab(n, 2)
    block = int(os.environ.get("MBLOCK", "512"))
    names = os.environ.get(
        "MNAMES", "mul_mxu,mul_vpu,school,redc,sq_mxu,rolla,rolla_full"
    ).split(",")
    # correctness spot-check for rolla_full vs mul_mxu
    if "rolla_full" in names:
        small = 1 << 10
        v1 = run_chain(a[:, :small], b[:, :small], "mul_mxu", 512)
        v2 = run_chain(a[:, :small], b[:, :small], "rolla_full", 512)
        from gkr_mimc_tpu.fields import fr

        ok = bool(jnp.all(fr.canonicalize(v1) == fr.canonicalize(v2)))
        print(f"rolla_full == mul_mxu: {ok}")
    for name in names:
        t = timeit(lambda nm=name: run_chain(a, b, nm, block))
        per_mul_ns = t / CHAIN / n * 1e9
        print(
            f"{name:10s} chain{CHAIN} n=2^20 b={block}: {t*1e3:7.2f} ms"
            f"  -> {per_mul_ns:6.3f} ns/mul/elem"
        )


if __name__ == "__main__":
    main()
