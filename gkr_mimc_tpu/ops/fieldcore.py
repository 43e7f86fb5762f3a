"""In-kernel BN254 fr arithmetic for Pallas TPU kernels.

This is the speed-of-light field core used INSIDE pl.pallas_call bodies.
It differs from fields/fr.py (the portable XLA path) in two ways:

* limb-plane accumulation uses `pltpu.roll` + iota masks — native vreg
  rotates — instead of concatenate-based shifts (measured ~60x faster on
  v5e: rotate+select are register ops, concatenation materializes memory);
* values are processed as (16, B) blocks (limb-major, B lanes) with NO
  intermediate (16,16,B) outer-product tensors: partial-product planes are
  generated limb-by-limb and folded into two 16-row column accumulators on
  the fly.

Same number system as fields/fr.py: 16x16-bit limbs in uint32 lanes,
Montgomery radix 2**256, lazy representatives in [0, 2p).

All functions assume 2-D (16, B) operands (or (16, T, B) where noted) and
are only guaranteed to lower under Mosaic (use fields/fr.py elsewhere).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ..fields.bn254 import L, MASK, NPRIME, P, P_LIMBS, int_to_limbs

U32 = jnp.uint32
W = 16
_NP16 = int_to_limbs(NPRIME)
_TWOP_LIMBS = int_to_limbs(2 * P)


def _rowid(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _roll(x, off):
    return pltpu.roll(x, off, 0)


def _shift_rows(x, d):
    """out[k] = x[k-d] (zeros below): roll + mask, no concatenation."""
    if d == 0:
        return x
    r = _roll(x, d % x.shape[0]) if d < x.shape[0] else jnp.zeros_like(x)
    return jnp.where(_rowid(x.shape) >= d, r, 0)


class _Acc:
    """Two 16-row column accumulators (columns 0-15 and 16-31)."""

    def __init__(self, shape):
        self.lo = jnp.zeros(shape, U32)
        self.hi = jnp.zeros(shape, U32)
        self._rid = _rowid(shape)

    def add_plane(self, plane, off, lo_only=False):
        """Accumulate a 16-row plane whose row i is column (i + off)."""
        if off == 0:
            self.lo = self.lo + plane
            return
        if off == L:
            if not lo_only:
                self.hi = self.hi + plane
            return
        r = _roll(plane, off)
        m = self._rid >= off
        self.lo = self.lo + jnp.where(m, r, 0)
        if not lo_only:
            self.hi = self.hi + jnp.where(m, jnp.zeros_like(r), r)


def _accum_product(a, b, acc, lo_only=False, double_cross=False):
    """Accumulate the schoolbook partial products of a*b into acc.

    b may equal a (squaring): with double_cross=True only planes j >= i are
    generated, with cross terms doubled (saves ~40% of the multiplies)."""
    n = a.shape[0]
    if not double_cross:
        for j in range(n):
            bj = b[j : j + 1]  # (1, ...)
            if bj.shape != (1,) + a.shape[1:]:
                # two-step broadcast: lanes first, then the multiply's
                # sublane broadcast (Mosaic can't broadcast both at once)
                bj = jnp.broadcast_to(bj, (1,) + a.shape[1:])
            p = a * bj  # (16, ...): row i = a_i * b_j -> col i+j
            acc.add_plane(p & MASK, j, lo_only)
            acc.add_plane(p >> W, j + 1, lo_only)
        return
    # squaring: pairs (i, j) with i < j doubled, diagonal once.
    # plane_j rows i<j: 2*a_i*a_j; row j: a_j^2; rows i>j: zero.
    rid = acc._rid
    for j in range(n):
        p = a * a[j : j + 1]
        keep = rid <= j
        dbl = rid < j
        p = jnp.where(keep, p, 0)
        lo = p & MASK
        hi = p >> W
        lo = jnp.where(dbl, lo << 1, lo)  # < 2**17
        hi = jnp.where(dbl, hi << 1, hi)
        acc.add_plane(lo, j, lo_only)
        acc.add_plane(hi, j + 1, lo_only)


def _accum_const(x, c_limbs, acc, lo_only=False):
    """Accumulate x * constant (16 scalar limb literals) into acc."""
    for j in range(L):
        c = int(c_limbs[j])
        if c == 0:
            continue
        p = x * np.uint32(c)
        acc.add_plane(p & MASK, j, lo_only)
        acc.add_plane(p >> W, j + 1, lo_only)


def _accum_const_fused(x, c_limbs, acc, lo_only=False):
    """_accum_const with the fused 17-bit planes of _accum_product_fused:
    one add_plane per constant limb plus a single closed-form correction
    for the wrapped hi(x_15 * c_j) terms."""
    for j in range(L):
        c = int(c_limbs[j])
        if c == 0:
            continue
        p = x * np.uint32(c)
        cpl = (p & MASK) + _roll(p >> W, 1)
        acc.add_plane(cpl, j, lo_only)
    cvec = _const_vec(c_limbs, (L,) + (1,) * (x.ndim - 1))
    cvec = jnp.broadcast_to(cvec, x.shape)  # lanes-only broadcast
    x15 = x[L - 1 : L]
    qh = (x15 * cvec) >> W  # row j = hi(x_15 * c_j), wrapped to lo col j
    acc.lo = acc.lo - qh
    if not lo_only:
        acc.hi = acc.hi + qh


def _lo_carry_f32_cols(lo_cols):
    """Exact f32 carry-out (value >> 256) of 16 redundant columns whose
    value is a multiple of 2**256 (the REDC low half): same dot-product
    trick as _lo_carry_f32 but on u32 columns < 2**23 directly."""
    shape1 = (L,) + (1,) * (lo_cols.ndim - 1)
    rid = jax.lax.broadcasted_iota(jnp.int32, shape1, 0)
    bits = jnp.where(rid >= 9, (16 * rid - 129) << 23, 0)
    w = jax.lax.bitcast_convert_type(bits, jnp.float32)
    o3f = jnp.sum(
        lo_cols.astype(jnp.int32).astype(jnp.float32) * w,
        axis=0,
        keepdims=True,
    )
    return (o3f + np.float32(0.5)).astype(jnp.int32).astype(U32)


def carry_rows(cols, bound_bits: int, with_over: bool = False):
    """Carry-normalize 16 redundant columns (< 2**bound_bits) to 16-bit
    limbs; optionally return the multi-bit overflow out of the top row.

    Shrink passes + Kogge-Stone lookahead, all rolls/selects (no concat)."""
    x = cols
    shape = x.shape
    over = None
    bound = (1 << bound_bits) - 1
    while bound > (1 << W):
        hi = x >> W
        if with_over:
            top = hi[L - 1 : L]  # keep 2-D: (1, B)
            over = top if over is None else over + top
        x = (x & MASK) + _shift_rows(hi, 1)
        bound = MASK + (bound >> W)
    g = x >> W
    pr = jnp.where((x & MASK) == MASK, jnp.uint32(1), jnp.uint32(0))
    carry = _shift_rows(g, 1)
    prop = _shift_rows(pr, 1)
    d = 1
    while d < shape[0]:
        carry = carry | (prop & _shift_rows(carry, d))
        prop = prop & _shift_rows(prop, d)
        d *= 2
    out = (x + carry) & MASK
    if with_over:
        cout = g[L - 1 : L] | (pr[L - 1 : L] & carry[L - 1 : L])
        over = cout if over is None else over + cout
        return out, over
    return out


def _add_row0(cols, over):
    """Add an overflow row-vector (1, B) into column 0 of cols."""
    pad = jnp.where(_rowid(cols.shape) == 0, over, jnp.uint32(0))
    return cols + pad


def shrink_rows(cols, bound_bits: int, width: int = W, with_over: bool = False):
    """The shrink passes of carry_rows WITHOUT the final Kogge-Stone:
    returns columns < 2**(width+1) (lazy digits) and, optionally, the
    accumulated multi-bit overflow out of the top row. O(1) passes instead
    of O(log L) — used where downstream consumers tolerate lazy digits."""
    x = cols
    over = None
    mask = np.uint32((1 << width) - 1)
    bound = (1 << bound_bits) - 1
    while bound > (1 << (width + 1)) - 2:
        hi = x >> width
        if with_over:
            top = hi[x.shape[0] - 1 : x.shape[0]]
            over = top if over is None else over + top
        x = (x & mask) + _shift_rows(hi, 1)
        bound = mask + (bound >> width)
    if with_over:
        return x, (over if over is not None else jnp.zeros_like(x[0:1]))
    return x


# ---------------------------------------------------------------------------
# MXU-REDC multiply
# ---------------------------------------------------------------------------
#
# The two REDC constant products (x NPRIME mod R, x P) are constant-matrix
# contractions over the limb axis — ideal MXU work (measured ~60 T MAC/s on
# v5e vs ~0.7-4 T lane-ops/s on the VPU). In an 8-bit digit basis with f32
# HIGHEST precision every product (< 2**17) and accumulation (< 2**23) is
# exact. Digits are kept LAZY (< 2**9) between stages: the shrink passes
# above replace the Kogge-Stone lookahead, and masking digit 31 implements
# the mod-R truncation exactly (the dropped bits are multiples of 2**256;
# the remaining digits sum below 2**250 + 2**256, so no aliasing).


def _digit_perm():
    """Input-row ordering of the digit vector fed to the MXU: rows 0..15 are
    the low bytes of the 16 limb columns (digit positions 0,2,..,30), rows
    16..31 the high bytes (positions 1,3,..,31)."""
    return [2 * i for i in range(L)] + [2 * i + 1 for i in range(L)]


def _build_redc_mats():
    """(M1, M2) f32 constant matrices for the REDC matmuls.

    M1 (32, 32): digit vector of T_lo (permuted basis) -> 8-bit-basis
    columns 0..31 of T_lo * NPRIME (i.e. m = T_lo * N' mod R, redundant).
    M2 (64, 32): digit vector of m (natural basis) -> columns of m * P in
    8-bit basis, rows reordered even-positions-first so the 16-bit-basis
    recombination is two static row slices."""
    np8 = [(NPRIME >> (8 * i)) & 0xFF for i in range(32)]
    p8 = [(P >> (8 * i)) & 0xFF for i in range(32)]
    perm = _digit_perm()
    m1 = np.zeros((32, 32), dtype=np.float32)
    for k in range(32):
        for j in range(32):
            d = k - perm[j]
            if 0 <= d < 32:
                m1[k, j] = np8[d]
    m2 = np.zeros((64, 32), dtype=np.float32)
    for r in range(64):
        pos = 2 * r if r < 32 else 2 * (r - 32) + 1
        for j in range(32):
            d = pos - j
            if 0 <= d < 32:
                m2[r, j] = p8[d]
    return m1, m2


REDC_M1, REDC_M2 = _build_redc_mats()


def _f32(x):
    return x.astype(jnp.int32).astype(jnp.float32)


def _u32(x):
    return x.astype(jnp.int32).astype(U32)


def _mxu_dot(m, x):
    """(K, 32) constant x (32, B) digits, exact in f32 HIGHEST."""
    return jax.lax.dot_general(
        m,
        x,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _accum_product_fused(a, b, acc):
    """Lean schoolbook: per plane, the lo and hi halves of a*b_j are fused
    into ONE 17-bit plane c = p_lo + roll(p_hi, 1) before placement (one
    add_plane instead of two — ~25% fewer VPU ops than _accum_product).
    The single misrouted term (p_hi[15], which the roll wraps to column j
    instead of j+16) is fixed by one closed-form correction plane:
    qh[j] = hi(a_15*b_j) is subtracted from lo column j and added to hi
    column j, for all j at once. u32 wraparound in the subtract is fine —
    the net column values are exact mod 2**32 and bounded < 2**22."""
    n = a.shape[0]
    for j in range(n):
        bj = b[j : j + 1]
        if bj.shape != (1,) + a.shape[1:]:
            bj = jnp.broadcast_to(bj, (1,) + a.shape[1:])
        p = a * bj
        c = (p & MASK) + _roll(p >> W, 1)  # 17-bit fused plane
        acc.add_plane(c, j)
    # top row of `a` via masked reduce, NOT a row slice: callers may pass a
    # lane-broadcast `a` (the multi-claim eq kernel), and Mosaic refolds a
    # slice-of-broadcast into an unsupported both-axis broadcast
    a15 = jnp.sum(
        jnp.where(_rowid(a.shape) == n - 1, a.astype(jnp.int32), 0),
        axis=0,
        keepdims=True,
    ).astype(U32)
    if b.shape != a.shape:
        # lanes-only broadcast (sublane count already matches; Mosaic
        # cannot broadcast sublanes and lanes in one op)
        b = jnp.broadcast_to(b, a.shape)
    qh = (a15 * b) >> W  # row j = hi(a_15 * b_j)
    acc.lo = acc.lo - qh
    acc.hi = acc.hi + qh


def _lo_carry_f32(mp, t_lo):
    """Exact carry-out of the REDC low half as an f32 dot product.

    lo_value = sum_k (c16_lo[k] + t_lo[k]) * 2**(16k) is a multiple of
    2**256 (that is what REDC guarantees), so the carry o3 = lo_value >> 256
    is an integer < 2**16. Computed as sum of the *pieces* (mp rows are
    exact f32 integers < 2**23, t_lo < 2**17) with power-of-two weights
    2**(16k-256): products are exact, the true sum is an integer, and the
    accumulated f32 rounding error (< 0.1) plus the dropped k <= 8 terms
    (< 2**-100 total) round away. Replaces a full Kogge-Stone carry chain."""
    shape1 = (L,) + (1,) * (t_lo.ndim - 1)
    rid = jax.lax.broadcasted_iota(jnp.int32, shape1, 0)
    # w[k] = 2**(16k - 256) for k >= 9 else 0, built from exponent bits
    bits = jnp.where(rid >= 9, (16 * rid - 129) << 23, 0)
    w = jax.lax.bitcast_convert_type(bits, jnp.float32)
    o3f = (
        jnp.sum(mp[:L] * w, axis=0, keepdims=True)
        + jnp.sum(mp[32 : 32 + L] * (w * np.float32(256.0)), axis=0, keepdims=True)
        + jnp.sum(t_lo.astype(jnp.int32).astype(jnp.float32) * w, axis=0,
                  keepdims=True)
    )
    return (o3f + np.float32(0.5)).astype(jnp.int32).astype(U32)


def _mul_mxu_product(a, b, square: bool = False):
    """The T = a*b stage shared by mul_mxu / mul_mxu_lazy: lazy 17-bit
    column halves (t_lo, t_hi)."""
    acc = _Acc(a.shape)
    # the fused planes beat double_cross squaring too (measured: the
    # double_cross selects/shifts cost more than the multiplies they save)
    _accum_product_fused(a, a if square else b, acc)
    # lazy 17-bit columns of T (skip the Kogge-Stone: the matmul tolerates
    # 9-bit lazy digits and the final sum re-carries exactly anyway)
    t_lo, o1 = shrink_rows(acc.lo, 23, with_over=True)
    t_hi = shrink_rows(_add_row0(acc.hi, o1), 23)
    return t_lo, t_hi


def _redc_from_t(t_lo, t_hi, m1, m2):
    """The REDC stage shared by mul_mxu / mul_mxu_band: lazy 17-bit column
    halves (t_lo, t_hi) of T = a*b -> (16, B) lazy Montgomery reps."""
    # digits of T_lo in the permuted basis; mask digit 31 (mod R)
    dlo = t_lo & jnp.uint32(0xFF)
    dhi = t_lo >> 8
    dhi = jnp.where(_rowid(dhi.shape) == L - 1, dhi & jnp.uint32(0xFF), dhi)
    digits = jnp.concatenate([dlo, dhi], axis=0)  # (32, B) < 2**9

    m_cols = _u32(_mxu_dot(m1, _f32(digits)))  # (32, B) < 2**23
    m_dig = shrink_rows(m_cols, 23, width=8)  # lazy < 2**9
    m_dig = jnp.where(
        _rowid(m_dig.shape) == 31, m_dig & jnp.uint32(0xFF), m_dig
    )

    mp = _mxu_dot(m2, _f32(m_dig))  # (64, B) 8-bit-basis cols < 2**23
    o3 = _lo_carry_f32(mp, t_lo)  # exact carry out of the zero low half
    mp_e = _u32(mp[:32])
    mp_o = _u32(mp[32:])
    c16 = mp_e + (mp_o << 8)  # (32, B) 16-bit-basis cols < 2**32 - eps
    hi_cols = _add_row0(c16[L:] + t_hi, o3)
    return carry_rows(hi_cols, 32)


def mul_mxu(a, b, m1, m2, square: bool = False):
    """REDC(a*b) with the constant products on the MXU: (16, B) x (16, B)
    -> (16, B) lazy reps. m1/m2 are REDC_M1/REDC_M2 passed in as kernel
    inputs (Mosaic kernels cannot capture constant arrays)."""
    t_lo, t_hi = _mul_mxu_product(a, b, square=square)
    return _redc_from_t(t_lo, t_hi, m1, m2)


# ---------------------------------------------------------------------------
# Banded-SCALAR multiply: the whole schoolbook on the MXU
# ---------------------------------------------------------------------------
#
# When b is a per-block scalar (the fold challenge r, a suffix-table q_j),
# the product T = a*b is itself a constant-matrix contraction: in the 8-bit
# digit basis, T8[pos] = sum_j digit_j(a) * digit_{pos-j}(b) — a (64, 32)
# "band matrix" of b's digits times the digit vector of a. The band is
# built OUTSIDE the kernel from the challenge (band_from_scalar) and passed
# in; entries < 2**8 and digits(a) < 2**8 keep every f32 product and the
# 32-term accumulation (< 2**21) exact. Rows are ordered [even positions;
# odd positions] (the REDC_M2 convention) so the 16-bit recombination is
# two static slices. This removes the ~16-plane VPU schoolbook from the
# fold kernel entirely — the remaining VPU work is digit extraction,
# shrink passes, and the shared REDC tail.

# digit ordering of the in-kernel digit vector (row j carries position
# perm[j]): lo bytes of limbs 0..15, then hi bytes
_BAND_PERM = np.array(
    [2 * i for i in range(L)] + [2 * i + 1 for i in range(L)]
)
# row -> product digit position, even positions first (REDC_M2 convention)
_BAND_POS = np.array([2 * r for r in range(32)] + [2 * r + 1 for r in range(32)])
_BAND_IDX = _BAND_POS[:, None] - _BAND_PERM[None, :]  # (64, 32)
_BAND_VALID = (0 <= _BAND_IDX) & (_BAND_IDX < 32)
_BAND_IDX_SAFE = np.where(_BAND_VALID, _BAND_IDX, 0)


def band_from_scalar(r):
    """(16,[G]) u32 16-bit-limb scalar(s) -> ([G,] 64, 32) f32 band matrix
    for mul_mxu_band. Plain XLA (runs OUTSIDE kernels, once per scalar)."""
    dn = jnp.stack([r & jnp.uint32(0xFF), r >> 8], axis=1).reshape(
        (2 * L,) + r.shape[1:]
    )  # natural digit order: dn[2i] = lo_i, dn[2i+1] = hi_i
    band = jnp.where(
        jnp.asarray(_BAND_VALID)[..., None] if r.ndim == 2 else jnp.asarray(_BAND_VALID),
        dn[jnp.asarray(_BAND_IDX_SAFE)],
        0,
    )  # (64, 32[, G])
    band = band.astype(jnp.int32).astype(jnp.float32)
    if r.ndim == 2:
        band = jnp.moveaxis(band, -1, 0)  # (G, 64, 32)
    return band


def mul_mxu_band(a, band, m1, m2):
    """REDC(a * b) where b is the scalar encoded in `band` (64, 32) f32:
    one MXU matmul replaces the VPU schoolbook. `a` must have exact 16-bit
    limbs (carry_rows output — holds for all fold/suffix inputs)."""
    dlo = a & jnp.uint32(0xFF)
    dhi = a >> 8
    digits = jnp.concatenate([dlo, dhi], axis=0)  # (32, B) rows perm order
    t8 = _mxu_dot(band, _f32(digits))  # (64, B) f32 exact, < 2**21
    c16_e = _u32(t8[:32])
    c16_o = _u32(t8[32:])
    c16 = c16_e + (c16_o << 8)  # (32, B) 16-bit-basis columns < 2**22
    t_lo, o1 = shrink_rows(c16[:L], 22, with_over=True)
    t_hi = shrink_rows(_add_row0(c16[L:], o1), 22)
    return _redc_from_t(t_lo, t_hi, m1, m2)


def mul_mxu_lazy(a, b, square: bool = False):
    """a*b WITHOUT the Montgomery reduction: (16, B) x (16, B) -> (32, B)
    lazy 17-bit columns of the double-width product T (value a*b exactly;
    in Montgomery terms one R factor higher than mul_mxu's output).

    Used for the final products of the partial-eval raw chains: the
    eq-weighted hypercube contraction is linear, so REDC moves after the
    reduction — once per round coefficient instead of once per element
    (ops/kernels.py digits64 + finish handle the wide result)."""
    t_lo, t_hi = _mul_mxu_product(a, b, square=square)
    return jnp.concatenate([t_lo, t_hi], axis=0)


def square_mxu(a, m1, m2):
    return mul_mxu(a, a, m1, m2, square=True)


def pow7_mxu(a, m1, m2):
    x2 = square_mxu(a, m1, m2)
    x3 = mul_mxu(x2, a, m1, m2)
    x6 = square_mxu(x3, m1, m2)
    return mul_mxu(x6, a, m1, m2)


def mul(a, b, square: bool = False):
    """REDC(a*b) for lazy reps (< 2p): (16, B) x (16, B) -> (16, B)."""
    shape = a.shape
    # T = a*b (or a^2); fused 17-bit planes (cols < 16*2**17 -> bound 22)
    acc = _Acc(shape)
    _accum_product_fused(a, a if square else b, acc)
    t_lo, o1 = carry_rows(acc.lo, 22, with_over=True)
    t_hi = carry_rows(_add_row0(acc.hi, o1), 22)

    # m = (T mod R) * NPRIME mod R (columns < 16 only)
    macc = _Acc(shape)
    _accum_const_fused(t_lo, _NP16, macc, lo_only=True)
    m = carry_rows(macc.lo, 22)

    # T + m*p >> 256: the low half is a multiple of R, so its carry-out is
    # one exact f32 dot instead of a Kogge-Stone chain
    pacc = _Acc(shape)
    _accum_const_fused(m, P_LIMBS, pacc)
    o3 = _lo_carry_f32_cols(pacc.lo + t_lo)  # < 2**22 + 2**16
    hi_cols = _add_row0(pacc.hi + t_hi, o3)
    return carry_rows(hi_cols, 23)


def square(a):
    return mul(a, a, square=True)


def add(a, b):
    """Lazy modular add: result < 2p."""
    return _cond_sub_2p(carry_rows(a + b, 17))


def _const_vec(limbs, shape):
    """Build a per-limb constant vector in-kernel from scalar literals
    (Pallas kernels cannot capture constant arrays): 16 row-selects on a
    tiny tensor, CSE'd by the compiler."""
    rid = _rowid(shape)
    v = jnp.zeros(shape, U32)
    for k, c in enumerate(limbs):
        if c:
            v = jnp.where(rid == k, jnp.uint32(c), v)
    return v


def sub(a, b):
    """Lazy modular sub: a - b + 2p, then conditional -2p."""
    limbs = [_TWOP_LIMBS[k] + (1 if k == 0 else 0) for k in range(L)]
    cvec = _const_vec(limbs, (L,) + (1,) * (a.ndim - 1))
    cols = a + (np.uint32(MASK) ^ b) + cvec
    return _cond_sub_2p(carry_rows(cols, 18))


def _cond_sub_const(a, c_limbs):
    """Subtract constant iff a >= constant."""
    limbs = [(MASK ^ c_limbs[k]) + (1 if k == 0 else 0) for k in range(L)]
    nvec = _const_vec(limbs, (L,) + (1,) * (a.ndim - 1))
    s, ge = carry_rows(a + nvec, 17, with_over=True)
    return jnp.where(ge > 0, s, a)


def _cond_sub_2p(a):
    return _cond_sub_const(a, _TWOP_LIMBS)


def canonicalize(a):
    return _cond_sub_const(a, P_LIMBS)


def pow7(a):
    """(sq, mul, sq, mul) chain — the MiMC S-box."""
    x2 = square(a)
    x3 = mul(x2, a)
    x6 = square(x3)
    return mul(x6, a)


def pow7_lat(a):
    """Latency-optimized S-box for tiny (lane-starved) shapes — the
    Fiat-Shamir hash chain, where the VPU mul cost is op-COUNT bound and
    independent of lane width: batch x^3 = x^2*x and x^4 = x^2*x^2 into ONE
    mul on doubled lanes, then x^7 = x^3*x^4. Three sequential muls
    instead of four (same field values; only the chain shape differs)."""
    b = a.shape[-1]
    x2 = square(a)
    lhs = jnp.concatenate([x2, x2], axis=-1)
    rhs = jnp.concatenate([a, x2], axis=-1)
    x34 = mul(lhs, rhs)
    return mul(x34[..., :b], x34[..., b:])
