"""TPU-native BN254 fr arithmetic on 16x16-bit limbs in uint32 lanes.

Design (TPU-first, not a port):

* A batch of field elements is a single ``uint32`` tensor of shape
  ``(16, *batch)`` — **limb-major** so every limb plane is a contiguous
  vector over the batch (hypercube) axis; the batch axes are also the
  sharding axes for multi-chip meshes.

* Elements are kept in **Montgomery form** (radix R = 2**256), matching
  gnark-crypto's `fr.Element` *values* (the reference uses it everywhere,
  e.g. /root/reference/poly/multilin.go:8); the internal radix (16x16 vs
  4x64) is free to differ since only values hit the transcript.

* Multiplication pipeline (all exact):
    1. outer product of limbs (one vector multiply; 16x16->32-bit products
       are exact in uint32 lanes), split into lo/hi 16-bit halves;
    2. column reduction and the two Montgomery constant products (by -p^-1
       mod R and by p) as **constant-matrix f32 matmuls** (operands < 2**16
       / < 2**8, accumulations < 2**24: exact in f32, and they ride the MXU
       on TPU with Precision.HIGHEST);
    3. carry normalization via a two-pass split + Kogge-Stone carry
       lookahead — O(log L) depth vector ops, no sequential limb chains.

* Invariant at every public-API boundary: limbs < 2**16, canonical (< p).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .bn254 import (
    L,
    MASK,
    NPRIME,
    P,
    P_LIMBS,
    R1,
    R2_LIMBS,
    W,
    int_to_limbs,
    limbs_to_int,
)

U32 = jnp.uint32
F32 = jnp.float32
_HIGHEST = jax.lax.Precision.HIGHEST

# ---------------------------------------------------------------------------
# Constant matrices (built once, host-side)
# ---------------------------------------------------------------------------


def _limbs8(x: int, n: int) -> list[int]:
    return [(x >> (8 * i)) & 0xFF for i in range(n)]



def _to_f32(x):
    """uint32 (< 2**24) -> f32, via int32 (Mosaic lacks a direct u32->f32)."""
    return x.astype(jnp.int32).astype(F32)


def _to_u32(x):
    """integer-valued f32 (< 2**31) -> uint32, via int32."""
    return x.astype(jnp.int32).astype(U32)


def _build_colred() -> np.ndarray:
    """(2L, 2*L*L) 0/1 matrix: maps [lo(i,j); hi(i,j)] -> column sums
    cols[k] = sum_{i+j=k} lo[i,j] + sum_{i+j+1=k} hi[i,j]."""
    m = np.zeros((2 * L, 2 * L * L), dtype=np.float32)
    for i in range(L):
        for j in range(L):
            m[i + j, i * L + j] = 1.0
            m[i + j + 1, L * L + i * L + j] = 1.0
    return m


def _build_shift8(const_limbs8: list[int], n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) matrix of the 8-bit schoolbook with a constant:
    out[k] = sum_i in[i] * c8[k - i]."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_in):
        for k in range(n_out):
            d = k - i
            if 0 <= d < len(const_limbs8):
                m[k, i] = const_limbs8[d]
    return m


_COLRED = _build_colred()
_NP8 = _build_shift8(_limbs8(NPRIME, 2 * L), 2 * L, 2 * L)  # m = T_lo * N' mod R
_P8 = _build_shift8(_limbs8(P, 2 * L), 4 * L, 2 * L)  # m * p (8-bit cols)


def mul_consts():
    """The three constant matrices the multiply pipeline contracts with.
    Outside kernels they are embedded as jit constants; Pallas kernels must
    pass them as explicit inputs (pl.BlockSpec full blocks) and thread them
    through via the `consts` argument of mul/square/pow7."""
    return (_COLRED, _NP8, _P8)

# max column value of _NP8 @ x with x < 256: bounded by 32 * 255 * 255 < 2**21
# max column value of _P8  @ x with x < 256: same bound.


def _cmatmul(m: np.ndarray, x):
    """Constant-matrix product over the leading axis: (K_out, K_in) x
    (K_in, *S) -> (K_out, *S), f32, exact for our integer ranges."""
    s = x.shape[1:]
    y = jax.lax.dot_general(
        jnp.asarray(m),
        x.reshape((x.shape[0], -1)),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_HIGHEST,
        preferred_element_type=F32,
    )
    return y.reshape((m.shape[0],) + s)


# ---------------------------------------------------------------------------
# Carry normalization (vectorized, log-depth)
# ---------------------------------------------------------------------------


def _shift_up(x, d, fill=None):
    """out[k] = x[k-d] along axis 0 (zeros/False below)."""
    if d == 0:
        return x
    pad = jnp.zeros((d,) + x.shape[1:], dtype=x.dtype)
    if fill is not None:
        pad = jnp.full((d,) + x.shape[1:], fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0)


def _carry_norm(cols, bound_bits: int, width: int = W):
    """Exact carry normalization of redundant columns.

    cols: (K, *S) uint32, each column < 2**bound_bits (<= 31).
    Returns (K, *S) with every limb < 2**width. The carry out of the top
    column is DROPPED — callers must guarantee the value fits in K limbs.

    Two masked-split passes shrink columns to <= 2**width, then a
    Kogge-Stone carry-lookahead resolves the remaining 0/1 ripple in
    O(log K) vector steps.
    """
    mask = np.uint32((1 << width) - 1)
    bound = (1 << bound_bits) - 1
    x = cols
    while bound > (1 << width):
        x = (x & mask) + _shift_up(x >> width, 1)
        bound = ((1 << width) - 1) + (bound >> width)
    # columns <= 2**width; generate/propagate for the final ripple.
    # All in uint32 0/1 (Mosaic has no bool<->int vector casts).
    g = x >> width  # in {0,1}
    pr = jnp.where((x & mask) == mask, jnp.uint32(1), jnp.uint32(0))
    # exclusive prefix of (g, pr) via Kogge-Stone
    carry = _shift_up(g, 1)
    prop = _shift_up(pr, 1)
    d = 1
    k = x.shape[0]
    while d < k:
        carry = carry | (prop & _shift_up(carry, d))
        prop = prop & _shift_up(prop, d)
        d *= 2
    return (x + carry) & mask


def _carry_norm_with_msb(cols, bound_bits: int):
    """Like _carry_norm but also returns the carry out of the top column
    (0 or 1) — used for >= comparisons via two's-complement adds."""
    ext = jnp.concatenate(
        [cols, jnp.zeros((1,) + cols.shape[1:], dtype=cols.dtype)], axis=0
    )
    out = _carry_norm(ext, bound_bits)
    return out[:-1], out[-1]


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------


def encode_int(x: int) -> np.ndarray:
    """Standard-form (non-Montgomery) limbs of ``x mod P`` as (16,)."""
    return np.array(int_to_limbs(x % P), dtype=np.uint32)


def encode_ints(xs) -> np.ndarray:
    out = np.empty((L, len(xs)), dtype=np.uint32)
    for i, x in enumerate(xs):
        out[:, i] = encode_int(x)
    return out


def encode_mont_int(x: int) -> np.ndarray:
    return np.array(int_to_limbs((x % P) * R1 % P), dtype=np.uint32)


def encode_mont_ints(xs) -> np.ndarray:
    out = np.empty((L, len(xs)), dtype=np.uint32)
    for i, x in enumerate(xs):
        out[:, i] = encode_mont_int(x)
    return out


def encode_uint64_array(vals: np.ndarray) -> np.ndarray:
    """Vectorized standard-form limbs for a numpy uint64 array (any shape) —
    bulk input path (the reference's deterministic RandomFrArray inputs are
    uint64, common/common.go:49-55)."""
    vals = np.asarray(vals, dtype=np.uint64)
    out = np.zeros((L,) + vals.shape, dtype=np.uint32)
    for i in range(4):
        out[i] = ((vals >> np.uint64(W * i)) & np.uint64(MASK)).astype(np.uint32)
    return out


def decode_ints(arr) -> list[int]:
    arr = np.asarray(arr)
    flat = arr.reshape(L, -1)
    return [limbs_to_int(flat[:, i]) for i in range(flat.shape[1])]


def const_mont(x: int, batch_ndim: int = 0) -> jnp.ndarray:
    limbs = np.array(int_to_limbs(x * R1 % P), dtype=np.uint32)
    return jnp.asarray(limbs.reshape((L,) + (1,) * batch_ndim))


def zeros(batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((L,) + tuple(batch_shape), dtype=U32)


def one(batch_shape=()) -> jnp.ndarray:
    limbs = np.array(int_to_limbs(R1), dtype=np.uint32)
    return jnp.broadcast_to(
        jnp.asarray(limbs.reshape((L,) + (1,) * len(tuple(batch_shape)))),
        (L,) + tuple(batch_shape),
    )


# ---------------------------------------------------------------------------
# Public arithmetic
# ---------------------------------------------------------------------------

# Lazy representation: every tensor holds a representative in [0, 2p) with
# limbs < 2**16 (2p < 2**255). REDC is closed on [0,2p) x [0,2p) -> [0,2p)
# since (2p)^2 < R*p, so `mul` needs no trailing conditional subtraction;
# `add`/`sub` close via a single compare-subtract against 2p. Values are
# canonicalized ((< p)) only at protocol boundaries (proof export, device
# equality) — host decode (`to_ints`) reduces mod p anyway.

_TWOP = 2 * P
_TWOP_LIMBS = int_to_limbs(_TWOP)

# adding this == subtracting C (mod 2**256), for C in {p, 2p}
def _negc_np(c_limbs):
    return np.array(
        [(MASK ^ c_limbs[k]) + (1 if k == 0 else 0) for k in range(L)],
        dtype=np.uint32,
    )


_NEGP = _negc_np(P_LIMBS)
_NEG2P = _negc_np(_TWOP_LIMBS)


def _cond_sub(a, negc):
    """Subtract the constant iff a >= constant (a, constant < 2**256)."""
    cols = a + jnp.asarray(negc.reshape((L,) + (1,) * (a.ndim - 1)))  # <= 2**17
    s, ge = _carry_norm_with_msb(cols, 17)
    return jnp.where(ge.astype(jnp.bool_)[None], s, a)


def _cond_sub_p(a):
    return _cond_sub(a, _NEGP)


def canonicalize(a):
    """Lazy representative [0,2p) -> canonical [0,p)."""
    return _cond_sub(a, _NEGP)


def add(a, b):
    """Modular addition on lazy representatives: (a+b) in [0, 2p)."""
    cols = a + b  # <= 2**17; a+b < 4p < 2**257... carries overflow limb 15?
    # a + b < 4p < 2**257: the value may exceed 2**256? 4p < 2**255.6: no.
    s = _carry_norm(cols, 17)
    return _cond_sub(s, _NEG2P)


_TWOP_NP = np.array(_TWOP_LIMBS, dtype=np.uint32)


def sub(a, b):
    """Modular subtraction on lazy representatives: result in [0, 2p).

    a - b + 2p is computed in one pass: cols = a + (~b) + 2p + 1; the value
    lies in (0, 4p) < 2**256 so the top carry is exactly the +2**256 wrap.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    nd = len(shape) - 1
    bb = jnp.broadcast_to(b, shape)
    c = np.array(
        [_TWOP_LIMBS[k] + (1 if k == 0 else 0) for k in range(L)],
        dtype=np.uint32,
    )
    cols = a + (np.uint32(MASK) ^ bb) + jnp.asarray(c.reshape((L,) + (1,) * nd))
    # cols <= 3*(2**16 - 1) + 1 < 2**18; value = a - b + 2p + 2**256
    s = _carry_norm(cols, 18)  # the +2**256 drops with the top carry
    return _cond_sub(s, _NEG2P)


def neg(a):
    return sub(zeros(a.shape[1:]), a)


def _split8(limbs16):
    """(K, *S) 16-bit limbs -> (2K, *S) interleaved 8-bit pieces (f32)."""
    lo = limbs16 & np.uint32(0xFF)
    hi = limbs16 >> 8
    st = jnp.stack([lo, hi], axis=1)  # (K, 2, *S)
    return _to_f32(st.reshape((2 * limbs16.shape[0],) + limbs16.shape[1:]))


def _skew_cols(prod_planes):
    """Column sums of an outer-product tensor via the skew trick.

    prod_planes: (16, 16, *S) uint32 "partial product" planes where entry
    (i, j) contributes to column i+j; every entry < 2**16 (callers split
    32-bit products into lo/hi planes first). Returns (32, *S) column sums
    (each < 2**21) using ONE pad + reshape + two masked axis reductions —
    flat element (i*16 + k') for k' = (i+j) sits at row i, col (i+j) mod 16
    of a (17, 16) view after padding 16 zero rows, with the q <= r half
    holding columns < 16 and the q > r half columns >= 16.

    This keeps the whole multiply on the VPU in uint32 — measured ~100x
    faster on TPU than dense f32 matmul column reduction.
    """
    s = prod_planes.shape[2:]
    padded = jnp.concatenate(
        [prod_planes, jnp.zeros((L, 1) + s, dtype=prod_planes.dtype)], axis=1
    )  # (16, 17, *S): one zero pad per row -> flat index i*17 + j = i*16 + (i+j)
    grid = padded.reshape((L + 1, L) + s)  # (17, 16, *S)
    q = jax.lax.broadcasted_iota(jnp.int32, (L + 1, L) + (1,) * len(s), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (L + 1, L) + (1,) * len(s), 1)
    gi = grid.astype(jnp.int32)
    low = jnp.sum(jnp.where(q <= r, gi, 0), axis=0)  # cols 0..15
    high = jnp.sum(jnp.where(q > r, gi, 0), axis=0)  # cols 16..31
    return jnp.concatenate([low, high], axis=0).astype(U32)


# 16-bit limb constants for the REDC constant products (scalar literals:
# they embed directly in kernels, no captured arrays).
_NP16 = int_to_limbs(NPRIME)


def _const_mul_planes(x, c_limbs):
    """Partial-product planes of x (16 limbs) times a 16-limb constant:
    returns (lo_planes, hi_planes), each (16, 16, *S) with entry (i, j) =
    lo/hi of x[i] * c[j]. The constant limbs are embedded as scalar
    literals (one vector multiply per limb), so Pallas kernels need no
    captured constant arrays."""
    cols = [x * np.uint32(cj) for cj in c_limbs]  # each (16, *S)
    prod = jnp.stack(cols, axis=1)  # (16, 16, *S), entry (i, j) = x_i * c_j
    lo = prod & MASK
    hi = prod >> W
    return lo, hi


def mul(a, b, consts=None):
    """Montgomery product REDC(a*b) on lazy reps (< 2p). Broadcasts.

    Pure uint32 VPU pipeline: outer product -> skew column reduction ->
    Kogge-Stone carries; REDC constant products likewise. No matmuls, no
    captured constant arrays (Pallas kernels call this directly)."""
    del consts  # retained for API compat; no longer needed
    # 1. T = a*b: outer product planes + skew column sums.
    prod = a[:, None] * b[None, :]  # (16, 16, *S) exact 32-bit products
    t_cols = _skew_cols(prod & MASK) + _shift_up(_skew_cols(prod >> W), 1)
    t = _carry_norm(t_cols, 22)  # T < p^2: 32 limbs < 2**16

    # 2. m = (T mod R) * (-p^-1) mod R (keep columns < 16 only).
    tlo = t[:L]
    mlo, mhi = _const_mul_planes(tlo, _NP16)
    m_cols = _skew_cols(mlo)[:L] + _shift_up(_skew_cols(mhi)[:L], 1)
    m = _carry_norm(m_cols, 22)  # truncated mod R

    # 3. T + m*p, then >> 256.
    plo, phi = _const_mul_planes(m, P_LIMBS)
    mp_cols = _skew_cols(plo) + _shift_up(_skew_cols(phi), 1)
    tot = _carry_norm(mp_cols + t, 23)  # (T + m*p) < 2**510: fits 32 limbs
    # result = (T + m*p)/R < p + (2p)^2/R < 2p: valid lazy rep.
    return tot[L:]


def square(a, consts=None):
    return mul(a, a, consts)


def pow7(a, consts=None):
    """x^7 via the reference S-box chain (hash/poseidon.go:129-135)."""
    x2 = square(a, consts)
    x3 = mul(x2, a, consts)
    x6 = square(x3, consts)
    return mul(x6, a, consts)


def to_mont(a_std):
    r2 = jnp.asarray(
        np.array(R2_LIMBS, dtype=np.uint32).reshape((L,) + (1,) * (a_std.ndim - 1))
    )
    return mul(a_std, r2)


def from_mont(a):
    one_std = jnp.zeros((L,) + (1,) * (a.ndim - 1), dtype=U32).at[0].set(1)
    return mul(a, one_std)


def eq(a, b):
    """Value equality (canonicalizes the lazy representatives first)."""
    return jnp.all(canonicalize(a) == canonicalize(b), axis=0)


def select(pred, a, b):
    return jnp.where(jnp.asarray(pred)[None], a, b)


def _redc_wide(cols):
    """REDC of a redundant 16-column value (cols < 2**31, i.e. the raw
    uint32 sum of up to 2**15 canonical elements): returns the canonical
    16-limb representative of  value * R^-1  mod p.

    Used by reduce_sum: summing Montgomery elements gives (sum)*R; REDC
    drops to plain form and a final multiply by R^2 restores Montgomery.
    """
    return _redc_wide_ext(cols, None)


def _redc_wide_ext(cols, extra_over):
    """REDC of cols (16 redundant uint32 columns < 2**31) plus an optional
    extra overflow row (value * 2**256, < 2**28) — the finishing step for
    kernel-side block accumulators."""
    v, o = _carry_norm_with_msb(cols, 31)  # value = v + o*2**256, o < 2**16
    if extra_over is not None:
        o = o + extra_over  # < 2**29
    s = cols.shape[1:]
    # m = (value mod R) * (-p^-1) mod R
    mlo, mhi = _const_mul_planes(v, _NP16)
    m_cols = _skew_cols(mlo)[:L] + _shift_up(_skew_cols(mhi)[:L], 1)
    m = _carry_norm(m_cols, 22)
    # tot = value + m*p  (multiple of R); result = tot >> 256 < p + 2**16
    plo, phi = _const_mul_planes(m, P_LIMBS)
    mp_cols = _skew_cols(plo) + _shift_up(_skew_cols(phi), 1)
    vcols = jnp.concatenate(
        [v, o[None], jnp.zeros((L - 1,) + s, dtype=U32)], axis=0
    )
    tot = _carry_norm(mp_cols + vcols, 30)
    return tot[L:]  # < p + V/R < 2p: valid lazy rep


def _skew_cols_k(prod_planes):
    """Generalized _skew_cols for (K, K, *S) planes: entry (i, j) belongs
    to column i+j; returns (2K, *S) column sums. Exact for entries whose
    per-column sums stay below 2**32."""
    k = prod_planes.shape[0]
    s = prod_planes.shape[2:]
    padded = jnp.concatenate(
        [prod_planes, jnp.zeros((k, 1) + s, dtype=prod_planes.dtype)], axis=1
    )
    grid = padded.reshape((k + 1, k) + s)
    q = jax.lax.broadcasted_iota(jnp.int32, (k + 1, k) + (1,) * len(s), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (k + 1, k) + (1,) * len(s), 1)
    gi = grid.astype(jnp.int32)
    low = jnp.sum(jnp.where(q <= r, gi, 0), axis=0)
    high = jnp.sum(jnp.where(q > r, gi, 0), axis=0)
    return jnp.concatenate([low, high], axis=0).astype(U32)


def _redc_once_wide(c):
    """One wide REDC pass: c (K, *S) redundant 16-bit-basis columns
    (< 2**31) -> columns of (value + m*p)/R, i.e. value*R^-1 mod p,
    bounded by value/R + p, as exact 16-bit limbs."""
    s = c.shape[1:]
    kk = c.shape[0]
    v = _carry_norm(
        jnp.concatenate([c, jnp.zeros((2,) + s, dtype=U32)], axis=0), 31
    )  # (kk+2, *S) exact 16-bit limbs
    mlo, mhi = _const_mul_planes(v[:L], _NP16)
    m_cols = _skew_cols(mlo)[:L] + _shift_up(_skew_cols(mhi)[:L], 1)
    m = _carry_norm(m_cols, 22)
    plo, phi = _const_mul_planes(m, P_LIMBS)
    mp_cols = _skew_cols(plo) + _shift_up(_skew_cols(phi), 1)  # (32, *S)
    n_tot = max(kk + 2, 32)

    def pad_to(x, n):
        return jnp.concatenate(
            [x, jnp.zeros((n - x.shape[0],) + s, dtype=U32)], axis=0
        )

    tot = _carry_norm(pad_to(v, n_tot) + pad_to(mp_cols, n_tot), 23)
    return tot[L:]  # value/R, (n_tot-16) exact 16-bit limbs


def redc_extra_wide(cols):
    """REDC of an arbitrarily wide redundant value: cols (K, *S) uint32
    16-bit-basis columns (each < 2**31, K >= 16, value < R * 2**240ish).
    Returns the (16, *S) lazy representative of value * R^-1 mod p.

    Runs REDC twice (each pass divides by R and shrinks by 16 columns)
    then one Montgomery multiply by R^2 to net a single R^-1 — the
    finishing step for deferred-reduction accumulators whose entries are
    full 512-bit products (ops/kernels.py coefficient-form partial evals).
    """
    k = cols.shape[0]
    s = cols.shape[1:]
    assert k >= 16
    t = _redc_once_wide(cols)  # ~ (K-14, *S)
    t2 = _redc_once_wide(t)  # (max(K-14+2,32)-16, *S): < 2p once K <= 46
    t2 = t2[:L]  # the value fits 16 limbs (< 2p) for our input ranges
    # two REDCs net R^-2; one Montgomery multiply by R^2 restores R^-1
    return mul(t2, _r2_tensor(len(s)))


def redc_wide_plain3(cols):
    """Three wide REDC passes with NO Montgomery correction: cols (K, *S)
    with value < R^3 * 2p -> the PLAIN-form lazy representative (< 2p) of
    value * R^-3 mod p. The finishing step for the Gruen-path deferred
    accumulators, whose entries carry three Montgomery factors (weights *
    un-REDCed raw products); the caller folds the remaining correction
    into its constant multiply (ops/kernels.py finish_gruen_acc)."""
    t = _redc_once_wide(cols)
    t = _redc_once_wide(t)
    t = _redc_once_wide(t)
    return t[:L]


def _r2_tensor(batch_ndim):
    return jnp.asarray(
        np.array(R2_LIMBS, dtype=np.uint32).reshape((L,) + (1,) * batch_ndim)
    )


def reduce_sum(x, axis):
    """Modular sum along batch axis `axis` (0 == tensor axis 1).

    Strategy: raw uint32 chunk sums (exact while chunk <= 2**15 since
    canonical limbs < 2**16), one wide REDC + R^2 multiply to return to
    canonical Montgomery form, then a small pairwise modular tree for the
    remaining factor. One pass over the data instead of log(n)."""
    ax = axis + 1
    n = x.shape[ax]
    # largest power-of-two chunk <= 2**15 dividing n
    c = 1
    while n % (c * 2) == 0 and (c * 2) <= (1 << 15):
        c *= 2
    if c > 4:
        xs = x.reshape(x.shape[:ax] + (n // c, c) + x.shape[ax + 1 :])
        raw = jnp.sum(xs, axis=ax + 1, dtype=U32)  # cols < 2**31
        # normalize each redundant column vector back to Montgomery form
        plain = _redc_wide(raw.reshape((L, -1))).reshape(raw.shape)
        x = mul(plain, _r2_tensor(x.ndim - 1))
        n = n // c
    while n > 1:
        half = n // 2
        lo = jax.lax.slice_in_dim(x, 0, half, axis=ax)
        hi = jax.lax.slice_in_dim(x, half, 2 * half, axis=ax)
        s = add(lo, hi)
        if n % 2:
            rest = jax.lax.slice_in_dim(x, 2 * half, n, axis=ax)
            s = jnp.concatenate([s, rest], axis=ax)
            n = half + 1
        else:
            n = half
        x = s
    return jnp.squeeze(x, axis=ax)


# ---------------------------------------------------------------------------
# Host-side decode of Montgomery tensors (tests / transcripts)
# ---------------------------------------------------------------------------


def to_ints(a) -> list[int]:
    """Montgomery limb tensor (16, *S) -> canonical ints, entirely on host
    (device_get + Python-int decode; never dispatches device ops)."""
    from .bn254 import RINV

    arr = np.asarray(jax.device_get(a)).reshape(L, -1)
    return [limbs_to_int(arr[:, i]) * RINV % P for i in range(arr.shape[1])]


def to_int(a) -> int:
    return to_ints(a)[0]


def from_ints_mont(xs) -> jnp.ndarray:
    return jnp.asarray(encode_mont_ints(xs))


def from_int_mont(x: int) -> jnp.ndarray:
    return jnp.asarray(encode_mont_int(x))
