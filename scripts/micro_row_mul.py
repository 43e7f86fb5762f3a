"""Prototype: scalar field mul in a (16,16) outer-product layout for the
Fiat-Shamir chain. At (16,1) the current mul wastes 1023/1024 lanes on
every op; the outer product computes all 16 schoolbook planes in ONE
vreg multiply and reduces via a log-shear — target ~3x fewer ops.

Layout: a value is carried as BOTH a column (16,1) and a row (1,16) of
16-bit limbs (the two sum orientations of the product emit either)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.fields.bn254 import L, MASK, NPRIME, P, int_to_limbs
from gkr_mimc_tpu.ops import fieldcore as fc

U32 = jnp.uint32
_NP16 = int_to_limbs(NPRIME)
P_LIMBS = int_to_limbs(P)


def _rid(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _cid(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _rollc(x, s):
    return pltpu.roll(x, s, 1)


def _shear(mat):
    """sheared[i, k] = mat[i, (k - i) mod 16] — log rolls along lanes."""
    rid = _rid(mat.shape)
    for s in (1, 2, 4, 8):
        mat = jnp.where((rid & s) != 0, _rollc(mat, s), mat)
    return mat


def _outer16(col, row):
    """(16,1) x (1,16) -> (16,16) product matrix (two single-axis
    broadcasts then one multiply)."""
    a2 = jnp.broadcast_to(col, (L, L))
    b2 = jnp.broadcast_to(row, (L, L))
    return a2 * b2


def _reduce_cols(prod, want_row=True, want_col=False):
    """prod[i,j] (< 2**32 full products) contributes lo->col i+j,
    hi->col i+j+1. Returns 32 columns as (lo16, hi16) in row layout:
    value = sum lo16[k] 2^(16k) + 2^256 * sum hi16[k] 2^(16k)."""
    lo = prod & jnp.uint32(MASK)
    hi = prod >> 16
    # fold hi into the next column's lo-plane; the lane-15 wrap of each
    # row goes to column i+16, i.e. the high half: track it separately
    hiw = _rollc(hi, 1)
    cid = _cid(prod.shape)
    c = lo + jnp.where(cid == 0, 0, hiw)  # < 2**17
    wrap0 = jnp.where(cid == 0, hiw, 0)  # row i: hi(a_i b_15) -> col i+16
    sh = _shear(c)
    rid = _rid(prod.shape)
    kid = _cid(prod.shape)
    wrapped = kid < rid  # sheared entries with original i+j >= 16
    s_all = jnp.sum(sh.astype(jnp.int32), axis=0, keepdims=True)
    s_hi = jnp.sum(
        jnp.where(wrapped, sh.astype(jnp.int32), 0), axis=0, keepdims=True
    )
    lo16 = (s_all - s_hi).astype(U32)  # cols 0..15, < 2**21
    # high half: wrapped shear entries (col k holds value for col k+16)
    # plus the wrap0 terms (row i -> col i+16): shear wrap0 as well: its
    # entry sits at (i, 0) and belongs to col i+16 -> sheared col i.
    w0 = _shear(wrap0)
    hi16 = (s_hi + jnp.sum(w0.astype(jnp.int32), axis=0, keepdims=True)).astype(
        U32
    )
    return lo16, hi16


def _carry_row(row, bound_bits):
    """carry_rows along the lane axis for a (1,16) redundant row."""
    x = row
    bound = (1 << bound_bits) - 1
    cid = _cid(x.shape)
    while bound > (1 << 16):
        hi = x >> 16
        x = (x & jnp.uint32(MASK)) + jnp.where(cid >= 1, _rollc(hi, 1), 0)
        bound = MASK + (bound >> 16)
    g = x >> 16
    pr = jnp.where((x & jnp.uint32(MASK)) == MASK, jnp.uint32(1), jnp.uint32(0))
    carry = jnp.where(cid >= 1, _rollc(g, 1), 0)
    prop = jnp.where(cid >= 1, _rollc(pr, 1), 0)
    d = 1
    while d < 16:
        sc = jnp.where(cid >= d, _rollc(carry, d), 0)
        sp = jnp.where(cid >= d, _rollc(prop, d), 0)
        carry = carry | (prop & sc)
        prop = prop & sp
        d *= 2
    return (x + carry) & jnp.uint32(MASK)


def _const_row(limbs):
    cid = _cid((1, L))
    v = jnp.zeros((1, L), U32)
    for k, c in enumerate(limbs):
        if c:
            v = jnp.where(cid == k, jnp.uint32(c), v)
    return v


def _const_col(limbs):
    rid = _rid((L, 1))
    v = jnp.zeros((L, 1), U32)
    for k, c in enumerate(limbs):
        if c:
            v = jnp.where(rid == k, jnp.uint32(c), v)
    return v


def _lo_carry_row(lo_cols):
    """Exact f32 carry-out (>> 256) of a (1,16) redundant row whose value
    is a multiple of 2**256 (cols < 2**23)."""
    cid = _cid((1, L))
    bits = jnp.where(cid >= 9, (16 * cid - 129) << 23, 0)
    w = jax.lax.bitcast_convert_type(bits, jnp.float32)
    s = jnp.sum(lo_cols.astype(jnp.int32).astype(jnp.float32) * w)
    return (s + np.float32(0.5)).astype(jnp.int32).astype(U32)


def mul_row(a_col, a_row, b_row):
    """REDC(a*b): inputs lazy 16-bit-limb reps; returns (col, row) of the
    result. All math on (16,16)/(1,16) tiles."""
    prod = _outer16(a_col, b_row)
    t_lo, t_hi = _reduce_cols(prod)  # rows (1,16) < 2**21
    t_lo = _carry_row(t_lo, 21)  # exact 16-bit limbs (m-product needs them)
    # m = T_lo * NP mod R: outer(NP_col const, t_lo row)
    mprod = _outer16(_const_col(_NP16), t_lo)
    m_lo, _ = _reduce_cols(mprod)  # only the low 16 cols matter (mod R)
    m = _carry_row(m_lo, 21)
    # m * P
    pprod = _outer16(_const_col(P_LIMBS), m)
    p_lo, p_hi = _reduce_cols(pprod)
    o3 = _lo_carry_row(p_lo + t_lo)  # scalar carry of the zero low half
    cid = _cid((1, L))
    hi = p_hi + t_hi + jnp.where(cid == 0, o3, jnp.uint32(0))
    res_row = _carry_row(hi, 22)
    return res_row


def _transpose16(row):
    """(1,16) -> (16,1): shear-based (no native transpose dependency):
    broadcast the row down the sublanes, then select the diagonal."""
    m = jnp.broadcast_to(row, (L, L))
    # rotate row i left by i so the diagonal lands in lane 0
    rid = _rid((L, L))
    for s in (1, 2, 4, 8):
        m = jnp.where((rid & s) != 0, _rollc(m, 16 - s), m)
    return m[:, 0:1]


def pow7_row(x_col, x_row):
    x2r = mul_row(x_col, x_row, x_row)
    x2c = _transpose16(x2r)
    x3r = mul_row(x2c, x2r, x_row)
    x3c = _transpose16(x3r)
    x6r = mul_row(x3c, x3r, x3r)
    x6c = _transpose16(x6r)
    x7r = mul_row(x6c, x6r, x_row)
    return _transpose16(x7r), x7r


CHAIN = 91 * 3  # one permutation's worth of S-boxes


def _chain_kernel_row(x_ref, o_ref):
    xc = x_ref[:, 0:1]
    # build the row layout once from the column input
    m = jnp.broadcast_to(xc, (L, L))
    cid = _cid((L, L))
    for s in (1, 2, 4, 8):
        m = jnp.where((cid & s) != 0, pltpu.roll(m, 16 - s, 0), m)
    xr = m[0:1, :]
    for _ in range(CHAIN // 3):
        xc, xr = pow7_row(xc, xr)
    o_ref[:, 0:1] = xc


def _chain_kernel_col(x_ref, o_ref):
    x = x_ref[:, 0:1]
    for _ in range(CHAIN // 3):
        x = fc.pow7_lat(x)
    o_ref[:, 0:1] = x


def run(kern, x):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((L, 1), U32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def main():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 16, size=(L, 1), dtype=np.uint32)
    x[15] &= 0x1FFF
    x = jnp.asarray(x)

    f_row = jax.jit(lambda v: run(_chain_kernel_row, v))
    f_col = jax.jit(lambda v: run(_chain_kernel_col, v))
    a = np.asarray(jax.device_get(f_row(x)))
    b = np.asarray(jax.device_get(f_col(x)))
    va = fr.to_ints(fr.canonicalize(jnp.asarray(a)))
    vb = fr.to_ints(fr.canonicalize(jnp.asarray(b)))
    print("row == col chain:", va == vb)

    for name, f in (("row", f_row), ("col", f_col)):
        np.asarray(jax.device_get(f(x)))
        t0 = time.perf_counter()
        reps = 30
        out = x
        for _ in range(reps):
            out = f(out)
        np.asarray(jax.device_get(out))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e6:8.1f} us / {CHAIN//3} sboxes "
              f"({dt/(CHAIN//3)*1e6:6.2f} us/sbox)")


if __name__ == "__main__":
    main()
