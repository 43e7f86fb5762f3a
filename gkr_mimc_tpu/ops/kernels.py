"""Pallas TPU kernels for the GKR prover hot path.

Kernel inventory (each the fused analog of a reference hot loop):

* mimc_witness        — all 91 cipher-layer tables in one kernel
                        (analog: circuit/circuit.go:48-64 layer walk)
* cipher_partial_eval — one sumcheck round's (deg+2) partial evaluations
                        for the cipher gate, fused gate+eq+block-reduction
                        (analog: sumcheck/algo.go:54-205 getPartialPolyChunk)
* identity_partial_eval — ditto for the Identity gate (multi-claim layer)
* fold3 / fold1       — fold Eq + input tables on a challenge
                        (analog: poly/multilin.go:26-36 FoldChunk)
* mul_scalar          — table * broadcast scalar (eq-table build stages)
* pow7 / cipher_layer — batched S-box / single cipher layer

Blocks are (16, B) limb-major; per-kernel outputs that are hypercube sums
accumulate as 17 raw uint32 limb-columns per t-point (block-local sums are
carry-normalized in-kernel, cross-block accumulation is exact raw adds for
up to 2**11 blocks), finished by a wide REDC outside the kernel.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import fr
from ..fields.bn254 import L
from . import fieldcore as fc

DEFAULT_BLOCK = int(os.environ.get("GKR_PALLAS_BLOCK", "512"))


def pallas_enabled() -> bool:
    """Pallas kernels are used on real TPU backends only (the portable
    fields/fr.py path covers CPU tests and the virtual multi-chip mesh).
    GKR_PALLAS_DISABLE=1 forces the portable path even on TPU — used by
    the Pallas-vs-portable bit-equality test."""
    if os.environ.get("GKR_PALLAS_DISABLE") == "1":
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return plat not in ("cpu",)


def _block_for(n: int) -> int:
    b = DEFAULT_BLOCK
    while b > n:
        b //= 2
    return max(b, 1)


# ---------------------------------------------------------------------------
# pow7 / cipher layer / witness
# ---------------------------------------------------------------------------


def _pow7_kernel(x_ref, o_ref):
    o_ref[:] = fc.pow7(x_ref[:])


@jax.jit
def pow7(x):
    n = x.shape[-1]
    b = _block_for(n)
    return pl.pallas_call(
        _pow7_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n // b,),
        in_specs=[pl.BlockSpec((L, b), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, b), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(x)


def _cipher_kernel(ark_ref, l_ref, r_ref, o_ref):
    ark = ark_ref[:]
    o_ref[:] = fc.pow7(fc.add(fc.add(r_ref[:], ark), l_ref[:]))


@jax.jit
def cipher_layer(l, r, ark):
    """(vL + vR + ark)^7 over the batch (circuit/gates/cipher.go:25-42)."""
    n = l.shape[-1]
    b = _block_for(n)
    return pl.pallas_call(
        _cipher_kernel,
        out_shape=jax.ShapeDtypeStruct(l.shape, l.dtype),
        grid=(n // b,),
        in_specs=[
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, b), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(ark.reshape(L, 1), l, r)


def _witness_kernel(use_mxu: bool):
    def kern(m1_ref, m2_ref, arks_ref, block_ref, state_ref, o_ref, st_scratch):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            st_scratch[:] = state_ref[:]

        # select round-constant column j from the (16, 128)-padded table
        # (dynamic lane slicing needs 128-alignment; a masked reduce is free)
        arks = arks_ref[:].astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, arks.shape, 1)
        ark = jnp.sum(jnp.where(lane == j, arks, 0), axis=1, keepdims=True).astype(
            jnp.uint32
        )

        t = fc.add(fc.add(st_scratch[:], ark), block_ref[:])
        nxt = fc.pow7_mxu(t, m1_ref[:], m2_ref[:]) if use_mxu else fc.pow7(t)
        o_ref[:] = nxt[None]
        st_scratch[:] = nxt

    return kern


def _witness_mxu() -> bool:
    # MXU-REDC pow7 in the witness kernel (A/B: GKR_WITNESS_MXU, trace-time)
    return os.environ.get("GKR_WITNESS_MXU", "1") == "1"


@jax.jit
def mimc_witness(block, state, arks_cols):
    """All 91 cipher-layer tables: out (91, 16, N).

    arks_cols: (16, 91) Montgomery columns. The round axis rides the grid
    (sequential on TPU) with the running state held in VMEM scratch; the
    reference instead evaluates 91 separate layers with a goroutine pool."""
    n = block.shape[-1]
    b = min(
        _block_for(n), int(os.environ.get("GKR_WITNESS_BLOCK", "512"))
    )
    # a non-power-of-two or non-dividing override would silently DROP
    # trailing lanes from the witness via grid truncation (advisor r3)
    assert b > 0 and (b & (b - 1)) == 0 and n % b == 0, (n, b)
    use_mxu = _witness_mxu() and b >= 128
    n_rounds = arks_cols.shape[1]
    arks_pad = jnp.zeros((L, 128), dtype=jnp.uint32).at[:, :n_rounds].set(arks_cols)
    return pl.pallas_call(
        _witness_kernel(use_mxu),
        out_shape=jax.ShapeDtypeStruct((n_rounds, L, n), block.dtype),
        grid=(n // b, n_rounds),
        in_specs=[
            pl.BlockSpec((32, 32), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 32), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, L, b), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((L, b), jnp.uint32)],
    )(jnp.asarray(fc.REDC_M1), jnp.asarray(fc.REDC_M2), arks_pad, block, state)


# ---------------------------------------------------------------------------
# Fiat-Shamir transcript hash
# ---------------------------------------------------------------------------
#
# MimcHash of K message words sits on the critical path of EVERY sumcheck
# round (the challenge r = MimcHash(coeffs), sumcheck/prover.go:73). As an
# XLA scan the 91*K sequential tiny steps cost ~35-40ms per hash on TPU —
# at bn=20 that is ~70s across the 94-layer walk, dominating the prover.
# As a Pallas kernel with the round axis on the grid and the running state
# in VMEM scratch, the same chain runs in ~2-3ms: the per-step body is one
# (16,1) pow7 and the grid step overhead is ~1us.


def _fs_mxu() -> bool:
    """MXU-REDC field mul inside the Fiat-Shamir hash kernel. Measured
    SLOWER on v5e (3.38ms vs 2.59ms per hash: the (32,32)x(32,1) matmuls
    are pure latency at batch 1), so off by default; trace-time A/B knob."""
    return os.environ.get("GKR_FS_MXU", "0") == "1"


def _fs_sbox():
    """A/B knob for the FS chain's S-box form (trace-time): 'lat' = the
    3-sequential-mul lane-doubled chain, 'plain' = 4 plain muls (no
    concat/slice layout ops)."""
    return (
        fc.pow7 if os.environ.get("GKR_FS_SBOX", "lat") == "plain"
        else fc.pow7_lat
    )


def _fs_hash_kernel(n_words: int, unroll: int, use_mxu: bool):
    n_steps = MIMC_FS_ROUNDS // unroll

    def _col(ref, idx):
        # dynamic column select via mask+reduce (dynamic lane slicing
        # needs 128-alignment; the masked reduce is register-only)
        v = ref[:].astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        return jnp.sum(
            jnp.where(lane == idx, v, 0), axis=1, keepdims=True
        ).astype(jnp.uint32)

    def kern(m1_ref, m2_ref, arks_ref, msgs_ref, o_ref, st_ref, res_ref):
        k = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when((k == 0) & (i == 0))
        def _():
            st_ref[:] = jnp.zeros_like(st_ref)

        block = _col(msgs_ref, k)

        @pl.when(i == 0)
        def _():
            res_ref[:] = block

        m1, m2 = m1_ref[:], m2_ref[:]
        res = res_ref[:]
        st = st_ref[:]
        sbox = _fs_sbox()
        for j in range(unroll):  # `unroll` MiMC rounds per grid step
            ark = _col(arks_ref, i * unroll + j)
            t = fc.add(fc.add(res, st), ark)
            res = fc.pow7_mxu(t, m1, m2) if use_mxu else sbox(t)
        res_ref[:] = res

        @pl.when(i == n_steps - 1)
        def _():
            # Miyaguchi-Preneel completion: state' = perm + 2*state + block
            st2 = fc.add(st, st)
            st_ref[:] = fc.add(fc.add(res, st2), block)

        @pl.when((k == n_words - 1) & (i == n_steps - 1))
        def _():
            o_ref[:] = st_ref[:]

    return kern


MIMC_FS_ROUNDS = 91


@jax.jit
def mimc_hash_fs(msgs):
    """Transcript hash of K field elements: msgs (16, K) -> (16,).

    Value-identical to hashes.mimc.mimc_hash_device (the lax.scan path);
    the (word, round) chain rides the sequential Pallas grid."""
    from ..hashes.ark import arks_scan_tensor

    k = msgs.shape[1]
    arks_cols = jnp.moveaxis(arks_scan_tensor(MIMC_FS_ROUNDS), 0, 1)  # (16, 91)
    arks_pad = (
        jnp.zeros((L, 128), dtype=jnp.uint32).at[:, :MIMC_FS_ROUNDS].set(arks_cols)
    )
    unroll = int(os.environ.get("GKR_FS_UNROLL", "7"))  # 91 = 7 * 13
    # a non-divisor would silently DROP rounds from the transcript hash
    assert MIMC_FS_ROUNDS % unroll == 0, "GKR_FS_UNROLL must divide 91"
    msgs_pad = jnp.zeros((L, 128), dtype=jnp.uint32).at[:, :k].set(msgs)
    out = pl.pallas_call(
        _fs_hash_kernel(k, unroll, _fs_mxu()),
        out_shape=jax.ShapeDtypeStruct((L, 1), jnp.uint32),
        grid=(k, MIMC_FS_ROUNDS // unroll),
        in_specs=[
            pl.BlockSpec((32, 32), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 32), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 128), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 128), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, 1), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, 1), jnp.uint32),
            pltpu.VMEM((L, 1), jnp.uint32),
        ],
    )(jnp.asarray(fc.REDC_M1), jnp.asarray(fc.REDC_M2), arks_pad, msgs_pad)
    return out[:, 0]


# ---------------------------------------------------------------------------
# Sumcheck round kernels
# ---------------------------------------------------------------------------


def _blocksum(v):
    """Raw block sum of lazy reps over the lane axis -> (17, 1) limbs+over."""
    cols = jnp.sum(v.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.uint32)
    limbs, over = fc.carry_rows(cols, 26, with_over=True)
    return limbs, over


def _t_schedule(n_out: int, skip_t0: bool):
    """The t values a PE kernel computes: 0..n-1, or 1..n (claim trick:
    the caller derives P(0) = claim - P(1), sumcheck/prover._with_t0)."""
    start = 1 if skip_t0 else 0
    return list(range(start, start + n_out))


def _cipher_pe_kernel(skip_t0: bool):
    def kern(ark_ref, eqb_ref, eqt_ref, x0b_ref, x0t_ref, x1b_ref, x1t_ref,
             o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        ark = ark_ref[:]
        eq_b, eq_t = eqb_ref[:], eqt_ref[:]
        x0_b, x0_t = x0b_ref[:], x0t_ref[:]
        x1_b, x1_t = x1b_ref[:], x1t_ref[:]

        d_eq = fc.sub(eq_t, eq_b)
        d_x0 = fc.sub(x0_t, x0_b)
        d_x1 = fc.sub(x1_t, x1_b)

        eq_c, x0_c, x1_c = eq_b, x0_b, x1_b
        for col, t in enumerate(_t_schedule(o_ref.shape[1], skip_t0)):
            if t == 1:
                eq_c, x0_c, x1_c = eq_t, x0_t, x1_t
            elif t > 1:
                eq_c = fc.add(eq_c, d_eq)
                x0_c = fc.add(x0_c, d_x0)
                x1_c = fc.add(x1_c, d_x1)
            g = fc.pow7(fc.add(fc.add(x1_c, ark), x0_c))
            prod = fc.mul(eq_c, g)
            limbs, over = _blocksum(prod)
            o_ref[0:L, pl.ds(col, 1)] += limbs
            o_ref[L : L + 1, pl.ds(col, 1)] += over

    return kern


def _identity_pe_kernel(skip_t0: bool):
    def kern(eqb_ref, eqt_ref, x0b_ref, x0t_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        eq_b, eq_t = eqb_ref[:], eqt_ref[:]
        x0_b, x0_t = x0b_ref[:], x0t_ref[:]
        d_eq = fc.sub(eq_t, eq_b)
        d_x0 = fc.sub(x0_t, x0_b)

        eq_c, x0_c = eq_b, x0_b
        for col, t in enumerate(_t_schedule(o_ref.shape[1], skip_t0)):
            if t == 1:
                eq_c, x0_c = eq_t, x0_t
            elif t > 1:
                eq_c = fc.add(eq_c, d_eq)
                x0_c = fc.add(x0_c, d_x0)
            prod = fc.mul(eq_c, x0_c)
            limbs, over = _blocksum(prod)
            o_ref[0:L, pl.ds(col, 1)] += limbs
            o_ref[L : L + 1, pl.ds(col, 1)] += over

    return kern


def _finish_evals(acc):
    """(17, T) raw column accumulators -> (16, T) Montgomery lazy reps."""
    plain = fr._redc_wide_ext(acc[:L], acc[L])
    return fr.mul(plain, fr._r2_tensor(plain.ndim - 1))


@partial(jax.jit, static_argnums=(4, 5))
def cipher_partial_evals(eq, x0, x1, ark, n_evals: int, skip_t0: bool = False):
    """One round's partial evals for the cipher gate: (16, n_evals[-1])
    (with skip_t0 the t=0 column is omitted — the claim trick)."""
    n = eq.shape[-1]
    mid = n // 2
    b = _block_for(mid)
    nb = mid // b
    n_out = n_evals - 1 if skip_t0 else n_evals

    def bot(i):
        return (0, i)

    def top(i):
        return (0, i + nb)

    acc = pl.pallas_call(
        _cipher_pe_kernel(skip_t0),
        out_shape=jax.ShapeDtypeStruct((L + 1, n_out), jnp.uint32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L + 1, n_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )(ark.reshape(L, 1), eq, eq, x0, x0, x1, x1)
    return _finish_evals(acc)


@partial(jax.jit, static_argnums=(2, 3))
def identity_partial_evals(eq, x0, n_evals: int, skip_t0: bool = False):
    n = eq.shape[-1]
    mid = n // 2
    b = _block_for(mid)
    nb = mid // b
    n_out = n_evals - 1 if skip_t0 else n_evals

    def bot(i):
        return (0, i)

    def top(i):
        return (0, i + nb)

    acc = pl.pallas_call(
        _identity_pe_kernel(skip_t0),
        out_shape=jax.ShapeDtypeStruct((L + 1, n_out), jnp.uint32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L + 1, n_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )(eq, eq, x0, x0)
    return _finish_evals(acc)


# ---------------------------------------------------------------------------
# Coefficient-form partial evals (v3)
# ---------------------------------------------------------------------------
#
# Instead of evaluating the round polynomial at t = 0..deg+1 (deg+2 gate
# evaluations per element pair) and interpolating, expand the gate on the
# t-line in coefficient form. For the cipher gate s(t) = u + t*v:
#   s^7 = sum_k C(7,k) u^(7-k) v^k t^k        (18 field muls per pair)
#   P(t) = eq(t) * s(t)^7, eq(t) = e + t*de
# so the round coefficients are  P_m = C(7,m)<e, raw_m> + C(7,m-1)<de,
# raw_(m-1)>  with raw_k = u^(7-k) v^k — and the weighted hypercube sums
# <w, raw> ride the MXU: in an 8-bit digit basis,
#   sum_y w_y * raw_y  has limb-product matrix  M[i,j] = <w_i-row, raw_j-row>
# which is ONE (64, B) x (raws, B) bf16 matmul per 128-lane chunk. The
# binomial constants and the e/de recombination move entirely out of the
# per-element loop (applied to the reduced values, finish_coeff_acc).
# Interpolation disappears: the kernel's outputs ARE the proof coefficients
# (bit-identical to InterpolateOnRange of the t-evaluations — same unique
# polynomial, both computed exactly).
#
# The kernel is group-major 2D: tables are (16, G*n) with group g occupying
# lanes [g*n, (g+1)*n); per-group scalars and accumulators are routed by
# BlockSpec index_maps, so G=1 (single instance) and G=8 (grouped lanes)
# run the IDENTICAL kernel body at identical per-element cost — the fix for
# round 2's 5x-slower 3D grouped kernels.

_MXU_CHUNK = 128


def _digits8_bf16(x):
    """(16, B) u32 16-bit limbs -> (32, B) bf16 digits, rows [lo bytes;
    hi bytes] (digit positions 0,2..30 | 1,3..31). Values <= 255 are exact
    in bf16, so a single-pass MXU matmul accumulates exactly in f32."""
    d = jnp.concatenate([x & jnp.uint32(0xFF), x >> 8], axis=0)
    return d.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _cipher_raws(x0b, x0t, x1b, x1t, ark, m1, m2):
    """The 8 raw vectors u^(7-k) v^k of the cipher gate (6 squares + 12
    muls via the MXU-REDC field core)."""
    u = fc.add(fc.add(x0b, x1b), ark)
    s_top = fc.add(fc.add(x0t, x1t), ark)
    v = fc.sub(s_top, u)
    u2 = fc.square_mxu(u, m1, m2)
    u3 = fc.mul_mxu(u2, u, m1, m2)
    u4 = fc.square_mxu(u2, m1, m2)
    u5 = fc.mul_mxu(u2, u3, m1, m2)
    u6 = fc.square_mxu(u3, m1, m2)
    u7 = fc.mul_mxu(u3, u4, m1, m2)
    v2 = fc.square_mxu(v, m1, m2)
    v3 = fc.mul_mxu(v2, v, m1, m2)
    v4 = fc.square_mxu(v2, m1, m2)
    v5 = fc.mul_mxu(v2, v3, m1, m2)
    v6 = fc.square_mxu(v3, m1, m2)
    v7 = fc.mul_mxu(v3, v4, m1, m2)
    return [
        u7,
        fc.mul_mxu(u6, v, m1, m2),
        fc.mul_mxu(u5, v2, m1, m2),
        fc.mul_mxu(u4, v3, m1, m2),
        fc.mul_mxu(u3, v4, m1, m2),
        fc.mul_mxu(u2, v5, m1, m2),
        fc.mul_mxu(u, v6, m1, m2),
        v7,
    ]


def _weighted_acc_update(o_ref, e, de, raws):
    """Accumulate the (4-piece) limb-product matrices of <[e; de], raw_k>
    into o_ref (1, 4, 64, 32*NR)."""
    b = e.shape[-1]
    wd = jnp.concatenate([_digits8_bf16(e), _digits8_bf16(de)], axis=0)
    rd = jnp.concatenate([_digits8_bf16(r) for r in raws], axis=0)
    acc = None
    for c in range(b // _MXU_CHUNK):
        sl = slice(c * _MXU_CHUNK, (c + 1) * _MXU_CHUNK)
        part = jax.lax.dot_general(
            wd[:, sl],
            rd[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (64, 32*NR) f32, exact (chunk sums < 2**23)
        p32 = part.astype(jnp.int32).astype(jnp.uint32)
        acc = p32 if acc is None else acc + p32  # < 2**25 for b <= 512
    o_ref[0, 0] += acc & jnp.uint32(0xFF)
    o_ref[0, 1] += (acc >> 8) & jnp.uint32(0xFF)
    o_ref[0, 2] += (acc >> 16) & jnp.uint32(0xFF)
    o_ref[0, 3] += acc >> 24


def _group_col(ref, g_idx):
    """Select one group's (16, 1) scalar from a (16, 128)-padded table
    (dynamic lane slicing needs 128-alignment; masked reduce is free)."""
    v = ref[:].astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.sum(jnp.where(lane == g_idx, v, 0), axis=1, keepdims=True).astype(
        jnp.uint32
    )


def _cipher_coeff_kernel(bpg: int):
    def kern(m1_ref, m2_ref, ark_ref, eb_ref, et_ref, x0b_ref, x0t_ref,
             x1b_ref, x1t_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i % bpg == 0)  # first block of each group's accumulator
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        m1, m2 = m1_ref[:], m2_ref[:]
        ark = _group_col(ark_ref, i // bpg)
        e = eb_ref[:]
        de = fc.sub(et_ref[:], e)
        raws = _cipher_raws(
            x0b_ref[:], x0t_ref[:], x1b_ref[:], x1t_ref[:], ark, m1, m2
        )
        _weighted_acc_update(o_ref, e, de, raws)

    return kern


def _identity_coeff_kernel(bpg: int):
    def kern(m1_ref, m2_ref, eb_ref, et_ref, x0b_ref, x0t_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i % bpg == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        m1, m2 = m1_ref[:], m2_ref[:]
        e = eb_ref[:]
        de = fc.sub(et_ref[:], e)
        u = x0b_ref[:]
        v = fc.sub(x0t_ref[:], u)
        _weighted_acc_update(o_ref, e, de, [u, v])

    return kern


def _coeff_geometry(total: int, g: int, block: int | None = None):
    n = total // g
    mid = n // 2
    b = min(block if block else max(DEFAULT_BLOCK, 512), mid)
    bpg = mid // b        # blocks per group half
    npb = n // b          # group stride in block units
    return b, bpg, npb


def _pe_block() -> int:
    """Block size for the heavy partial-eval kernels (17-26 field muls per
    block: per-grid-step DMA overhead is a small fraction already)."""
    return int(os.environ.get("GKR_PE_BLOCK", "1024"))


def _fold_block() -> int:
    """Block size for the fold kernel. Folds do only nt light muls per
    block, so per-grid-step overhead dominates at 512; 4096 amortizes it
    (measured ~2.5x at bn=20) while 6 x (16, 4096) u32 blocks still sit
    well inside VMEM."""
    return int(os.environ.get("GKR_FOLD_BLOCK", "4096"))


def _coeff_pe_call(kernel_factory, scalar_args, tables, g: int, n_raws: int):
    """Shared plumbing: tables (16, G*n) group-major (group g occupies
    lanes [g*n, (g+1)*n)); scalar_args are (16, G) per-group values routed
    by block index; accumulator output (G, 4, 64, 32*NR)."""
    total = tables[0].shape[-1]
    b, bpg, npb = _coeff_geometry(total, g, _pe_block())

    def bot(i):
        return (0, (i // bpg) * npb + (i % bpg))

    def top(i):
        return (0, (i // bpg) * npb + (i % bpg) + bpg)

    in_specs = [
        pl.BlockSpec((32, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(fc.REDC_M1), jnp.asarray(fc.REDC_M2)]
    for a in scalar_args:
        in_specs.append(
            pl.BlockSpec((L, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(jnp.zeros((L, 128), dtype=jnp.uint32).at[:, : a.shape[1]].set(a))
    for t in tables:
        in_specs += [
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
        ]
        args += [t, t]
    return pl.pallas_call(
        kernel_factory(bpg),
        out_shape=jax.ShapeDtypeStruct((g, 4, 64, 32 * n_raws), jnp.uint32),
        grid=(g * bpg,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 4, 64, 32 * n_raws),
            lambda i: (i // bpg, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(*args)


@partial(jax.jit, static_argnums=(4,))
def cipher_coeff_acc(eq, x0, x1, ark, g: int):
    """Coefficient-form cipher round: eq/x0/x1 (16, G*n) group-major, ark
    (16, G) -> piece accumulators (G, 4, 64, 256)."""
    return _coeff_pe_call(_cipher_coeff_kernel, [ark], [eq, x0, x1], g, 8)


@partial(jax.jit, static_argnums=(2,))
def identity_coeff_acc(eq, x0, g: int):
    return _coeff_pe_call(_identity_coeff_kernel, [], [eq, x0], g, 2)


def _digits64_bf16(t):
    """(32, B) lazy 17-bit columns of a deferred (un-REDCed) product ->
    (64, B) bf16 digits, rows [low bytes; high bytes] (positions 0,2..62 |
    1,3..63). The 17th bit of column k folds into the low byte of column
    k+1 (same position), so digits are <= 256 — still exact in bf16."""
    d2 = t >> 16
    d0 = (t & jnp.uint32(0xFF)) + fc._shift_rows(d2, 1)
    d1 = (t >> 8) & jnp.uint32(0xFF)
    d = jnp.concatenate([d0, d1], axis=0)
    return d.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _cipher_raws_lazy(x0b, x0t, x1b, x1t, ark, m1, m2):
    """The 8 raw vectors u^(7-k) v^k of the cipher gate on the t-line,
    returned UN-REDUCED (32 lazy columns each): 9 full Montgomery muls
    (5 squares + 4 muls, sharing the w = u*v chain) + 8 reduction-free
    final products whose REDC defers past the linear eq-weighted
    contraction (fieldcore.mul_mxu_lazy) — 17 products total vs the
    26-full-mul direct chain."""
    u = fc.add(fc.add(x0b, x1b), ark)
    s_top = fc.add(fc.add(x0t, x1t), ark)
    v = fc.sub(s_top, u)
    u2 = fc.square_mxu(u, m1, m2)
    u3 = fc.mul_mxu(u2, u, m1, m2)
    u6 = fc.square_mxu(u3, m1, m2)
    v2 = fc.square_mxu(v, m1, m2)
    v3 = fc.mul_mxu(v2, v, m1, m2)
    v6 = fc.square_mxu(v3, m1, m2)
    w = fc.mul_mxu(u, v, m1, m2)
    w2 = fc.square_mxu(w, m1, m2)
    w3 = fc.mul_mxu(w, w2, m1, m2)
    return [
        fc.mul_mxu_lazy(u6, u),  # u^7
        fc.mul_mxu_lazy(u6, v),  # u^6 v
        fc.mul_mxu_lazy(w2, u3),  # u^5 v^2
        fc.mul_mxu_lazy(w3, u),  # u^4 v^3
        fc.mul_mxu_lazy(w3, v),  # u^3 v^4
        fc.mul_mxu_lazy(w2, v3),  # u^2 v^5
        fc.mul_mxu_lazy(v6, u),  # u v^6
        fc.mul_mxu_lazy(v6, v),  # v^7
    ]


def _cipher_gruen_kernel(bpg: int):
    """Gruen-factored cipher round: the eq polynomial's current variable is
    factored out symbolically (P(t) = c*eq1(q_k,t)*Q(t)), so the kernel
    contracts the raws against ONE weight vector — the challenge-free
    suffix eq table S — instead of (e, de), and S is never folded."""

    def kern(m1_ref, m2_ref, ark_ref, s_ref, x0b_ref, x0t_ref, x1b_ref,
             x1t_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i % bpg == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        m1, m2 = m1_ref[:], m2_ref[:]
        ark = _group_col(ark_ref, i // bpg)
        raws = _cipher_raws_lazy(
            x0b_ref[:], x0t_ref[:], x1b_ref[:], x1t_ref[:], ark, m1, m2
        )
        wd = _digits8_bf16(s_ref[:])  # (32, b)
        rd = jnp.concatenate([_digits64_bf16(t) for t in raws], axis=0)
        b = wd.shape[-1]
        acc = None
        for c in range(b // _MXU_CHUNK):
            sl = slice(c * _MXU_CHUNK, (c + 1) * _MXU_CHUNK)
            part = jax.lax.dot_general(
                wd[:, sl],
                rd[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (32, 512) f32 exact (chunk sums < 2**23)
            p32 = part.astype(jnp.int32).astype(jnp.uint32)
            acc = p32 if acc is None else acc + p32
        o_ref[0, 0] += acc & jnp.uint32(0xFF)
        o_ref[0, 1] += (acc >> 8) & jnp.uint32(0xFF)
        o_ref[0, 2] += (acc >> 16) & jnp.uint32(0xFF)
        o_ref[0, 3] += acc >> 24

    return kern


@partial(jax.jit, static_argnums=(4,))
def cipher_gruen_acc(s, x0, x1, ark, g: int):
    """Gruen cipher round accumulator: s (16, G*mid) suffix eq weights
    (mid = n/2), x0/x1 (16, G*n) group-major, ark (16, G) ->
    (G, 4, 32, 512) piece accumulators of <S, raw_k> (k = 0..7, raws in
    deferred double-width form; finish with finish_gruen_acc)."""
    total = x0.shape[-1]
    b, bpg, npb = _coeff_geometry(total, g, _pe_block())

    def bot(i):
        return (0, (i // bpg) * npb + (i % bpg))

    def top(i):
        return (0, (i // bpg) * npb + (i % bpg) + bpg)

    def sblk(i):
        return (0, i)

    in_specs = [
        pl.BlockSpec((32, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((L, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((L, b), sblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
        pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
        pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
        pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
    ]
    args = [
        jnp.asarray(fc.REDC_M1),
        jnp.asarray(fc.REDC_M2),
        jnp.zeros((L, 128), dtype=jnp.uint32).at[:, : ark.shape[1]].set(ark),
        s,
        x0,
        x0,
        x1,
        x1,
    ]
    return pl.pallas_call(
        _cipher_gruen_kernel(bpg),
        out_shape=jax.ShapeDtypeStruct((g, 4, 32, 512), jnp.uint32),
        grid=(g * bpg,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 4, 32, 512), lambda i: (i // bpg, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(*args)


_DIGIT_NAT64 = np.argsort(
    np.array([2 * i for i in range(32)] + [2 * i + 1 for i in range(32)])
)


@lru_cache(maxsize=None)
def _binom_r2_np(degree: int):
    """C(degree, k) * R^2 mod p as limb columns: the Montgomery correction
    for the deferred-REDC path (weighted sums carry R^3; three wide REDC
    passes leave the plain value; one Montgomery mul by C*R^2 nets the
    binomial-scaled Montgomery form)."""
    import math

    from ..fields.bn254 import int_to_limbs, R1, P as _P

    r2 = R1 * R1 % _P
    cs = [math.comb(degree, k) for k in range(degree + 1)]
    out = np.zeros((L, len(cs)), dtype=np.uint32)
    for i, v in enumerate(cs):
        out[:, i] = int_to_limbs(v * r2 % _P)
    return out


@jax.jit
def finish_gruen_acc(acc):
    """(G, 4, 32, 512) piece accumulators -> (16, 8, G) Q-polynomial
    coefficients Q_m = C(7,m) * <S, raw_m> in Montgomery lazy form."""
    g = acc.shape[0]
    nat32 = jnp.asarray(_DIGIT_NAT)
    nat64 = jnp.asarray(_DIGIT_NAT64)
    a = acc.reshape(g, 4, 32, 8, 64)
    a = jnp.take(a, nat32, axis=2)  # S byte positions 0..31 in order
    a = jnp.take(a, nat64, axis=4)  # raw byte positions 0..63 in order
    planes = jnp.transpose(a, (2, 4, 0, 1, 3))  # (32, 64, G, 4, 8)
    lo = fr._skew_cols_k(planes[:, :32])  # (64, G, 4, 8): cols e+f
    hi = fr._skew_cols_k(planes[:, 32:])  # cols e+f (true col e+f+32)
    ext = jnp.zeros((32,) + lo.shape[1:], dtype=jnp.uint32)
    cols8 = jnp.concatenate([lo, ext], axis=0) + jnp.concatenate(
        [ext, hi], axis=0
    )  # (96, G, 4, 8) byte columns < 2**25
    # piece p shifts the byte position by p
    padded = jnp.concatenate(
        [cols8, jnp.zeros((4,) + cols8.shape[1:], dtype=jnp.uint32)], axis=0
    )  # (100, G, 4, 8)
    total8 = jnp.zeros((100, g, 8), dtype=jnp.uint32)
    for p in range(4):
        shifted = jnp.concatenate(
            [
                jnp.zeros((p, g, 8), dtype=jnp.uint32),
                padded[: 100 - p, :, p],
            ],
            axis=0,
        )
        total8 = total8 + shifted  # < 2**27
    total8 = fr._carry_norm(total8, 27, width=8)  # exact 8-bit digits
    c16 = total8[0::2] + (total8[1::2] << 8)  # (50, G, 8) < 2**16
    plain = fr.redc_wide_plain3(c16)  # (16, G, 8) plain-form values
    cm = jnp.asarray(_binom_r2_np(7))[:, None, :]  # (16, 1, 8)
    q = fr.mul(plain, cm)  # Montgomery lazy
    return jnp.swapaxes(q, 1, 2)  # (16, 8, G)


def _fold_kernel_gm(nt: int, bpg: int):
    def kern(m1_ref, m2_ref, r_ref, *refs):
        i = pl.program_id(0)
        m1, m2 = m1_ref[:], m2_ref[:]
        r = _group_col(r_ref, i // bpg)  # (16, 1)
        for k in range(nt):
            bot = refs[2 * k][:]
            top = refs[2 * k + 1][:]
            refs[2 * nt + k][:] = fc.add(
                bot, fc.mul_mxu(fc.sub(top, bot), r, m1, m2)
            )

    return kern


@partial(jax.jit, static_argnums=(2, 3))
def fold_tables_gm(tables, r, nt: int, g: int):
    """Group-major fold with the MXU-REDC multiply: tables (16, G*n), r
    (16, G) -> [(16, G*n/2)]. G=1 is the single-instance fold."""
    total = tables[0].shape[-1]
    b, bpg, npb = _coeff_geometry(total, g, _fold_block())
    mid_total = total // 2

    def bot(i):
        return (0, (i // bpg) * npb + (i % bpg))

    def top(i):
        return (0, (i // bpg) * npb + (i % bpg) + bpg)

    in_specs = [
        pl.BlockSpec((32, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((L, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [
        jnp.asarray(fc.REDC_M1),
        jnp.asarray(fc.REDC_M2),
        jnp.zeros((L, 128), dtype=jnp.uint32).at[:, : r.shape[-1]].set(
            r.reshape(L, -1)
        ),
    ]
    for t in tables:
        in_specs += [
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
        ]
        args += [t, t]
    out_shapes = [
        jax.ShapeDtypeStruct((L, mid_total), jnp.uint32) for _ in tables
    ]
    out_specs = [
        pl.BlockSpec((L, b), lambda i: (0, i), memory_space=pltpu.VMEM)
        for _ in tables
    ]
    outs = pl.pallas_call(
        _fold_kernel_gm(nt, bpg),
        out_shape=out_shapes,
        grid=(g * bpg,),
        in_specs=in_specs,
        out_specs=out_specs,
    )(*args)
    return list(outs)


def _fold_kernel_band(nt: int, bpg: int):
    """Fold with the banded-scalar MXU multiply (fieldcore.mul_mxu_band):
    the challenge's schoolbook rides the MXU as a (64, 32) band matrix, so
    the per-element VPU work drops to digit extraction + the REDC tail."""

    def kern(m1_ref, m2_ref, band_ref, *refs):
        i = pl.program_id(0)
        m1, m2 = m1_ref[:], m2_ref[:]
        band = band_ref[0]  # (64, 32) f32 for this block's group
        for k in range(nt):
            bot = refs[2 * k][:]
            top = refs[2 * k + 1][:]
            refs[2 * nt + k][:] = fc.add(
                bot, fc.mul_mxu_band(fc.sub(top, bot), band, m1, m2)
            )

    return kern


@partial(jax.jit, static_argnums=(2, 3))
def fold_tables_band(tables, r, nt: int, g: int):
    """fold_tables_gm with the banded-scalar multiply — value-identical
    (same exact product, same REDC), ~3x fewer VPU ops per element."""
    total = tables[0].shape[-1]
    b, bpg, npb = _coeff_geometry(total, g, _fold_block())
    mid_total = total // 2

    def bot(i):
        return (0, (i // bpg) * npb + (i % bpg))

    def top(i):
        return (0, (i // bpg) * npb + (i % bpg) + bpg)

    band = fc.band_from_scalar(r.reshape(L, -1)).reshape(g, 64, 32)
    in_specs = [
        pl.BlockSpec((32, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 64, 32), lambda i: (i // bpg, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    args = [jnp.asarray(fc.REDC_M1), jnp.asarray(fc.REDC_M2), band]
    for t in tables:
        in_specs += [
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
        ]
        args += [t, t]
    out_shapes = [
        jax.ShapeDtypeStruct((L, mid_total), jnp.uint32) for _ in tables
    ]
    out_specs = [
        pl.BlockSpec((L, b), lambda i: (0, i), memory_space=pltpu.VMEM)
        for _ in tables
    ]
    outs = pl.pallas_call(
        _fold_kernel_band(nt, bpg),
        out_shape=out_shapes,
        grid=(g * bpg,),
        in_specs=in_specs,
        out_specs=out_specs,
    )(*args)
    return list(outs)


def fold_band_enabled() -> bool:
    return os.environ.get("GKR_FOLD_BAND", "1") == "1"


def _suffix_band_kernel(bpg: int):
    """One suffix-doubling step: out = [t - q*t ; q*t] with the banded-
    scalar multiply; writes both halves of the doubled table directly."""

    def kern(m1_ref, m2_ref, band_ref, t_ref, lo_ref, hi_ref):
        m1, m2 = m1_ref[:], m2_ref[:]
        band = band_ref[0]
        t = t_ref[:]
        qt = fc.mul_mxu_band(t, band, m1, m2)
        lo_ref[:] = fc.sub(t, qt)
        hi_ref[:] = qt

    return kern


@partial(jax.jit, static_argnums=(2,))
def suffix_step_band(t, q, g: int):
    """Suffix-table doubling with the banded-scalar MXU multiply:
    t (16, G*m) group-major, q (16, G) -> (16, G*2m) group-major
    [t - q*t ; q*t] per group. Value-identical to the portable step."""
    total = t.shape[-1]
    m = total // g
    b = min(_fold_block(), m)
    bpg = m // b

    band = fc.band_from_scalar(q.reshape(L, -1)).reshape(g, 64, 32)
    outs = pl.pallas_call(
        _suffix_band_kernel(bpg),
        out_shape=[
            jax.ShapeDtypeStruct((L, total), jnp.uint32),
            jax.ShapeDtypeStruct((L, total), jnp.uint32),
        ],
        grid=(g * bpg,),
        in_specs=[
            pl.BlockSpec((32, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 64, 32), lambda i: (i // bpg, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((L, b), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
    )(jnp.asarray(fc.REDC_M1), jnp.asarray(fc.REDC_M2), band, t)
    lo, hi = outs
    # interleave per group: (16, G, m) x2 -> (16, G, 2m) -> (16, G*2m)
    lo3 = lo.reshape(L, g, m)
    hi3 = hi.reshape(L, g, m)
    return jnp.concatenate([lo3, hi3], axis=-1).reshape(L, g * 2 * m)


@lru_cache(maxsize=None)
def _binom_tensor_np(degree: int):
    """C(degree, k) for k = 0..degree as Montgomery limb columns."""
    import math

    from ..fields.bn254 import int_to_limbs, R1, P as _P

    cs = [math.comb(degree, k) for k in range(degree + 1)]
    out = np.zeros((L, len(cs)), dtype=np.uint32)
    for i, v in enumerate(cs):
        out[:, i] = int_to_limbs(v * R1 % _P)
    return out


_DIGIT_NAT = np.argsort(
    np.array([2 * i for i in range(16)] + [2 * i + 1 for i in range(16)])
)


@partial(jax.jit, static_argnums=(1, 2))
def finish_coeff_acc(acc, n_raws: int, degree: int):
    """(G, 4, 64, 32*NR) piece accumulators -> (16, deg+2, G) round
    coefficients (Montgomery lazy): digit-position skew, deferred wide
    REDC, then  P_m = C_m <e, raw_m> + C_(m-1) <de, raw_(m-1)>  with the
    binomial constants C of the gate's (u + t v)^deg expansion."""
    g = acc.shape[0]
    nat = jnp.asarray(_DIGIT_NAT)
    acc = jnp.take(acc.reshape(g, 4, 2, 32, n_raws, 32), nat, axis=3)
    acc = jnp.take(acc, nat, axis=5)  # (G, 4, w, 32, NR, 32)
    planes = jnp.transpose(acc, (3, 5, 0, 1, 2, 4))  # (32, 32, G, 4, w, NR)
    cols8 = fr._skew_cols_k(planes)  # (64, G, 4, w, NR) < 2**23
    # piece p shifts the digit position by p; pad for carries then combine
    s = cols8.shape[2:]  # (4, w, NR) minus the G axis handled explicitly
    padded = jnp.concatenate(
        [cols8, jnp.zeros((8,) + cols8.shape[1:], dtype=jnp.uint32)], axis=0
    )  # (72, G, 4, w, NR)
    total8 = jnp.zeros((72, g) + cols8.shape[3:], dtype=jnp.uint32)
    for p in range(4):
        shifted = jnp.concatenate(
            [
                jnp.zeros((p, g) + cols8.shape[3:], dtype=jnp.uint32),
                padded[: 72 - p, :, p],
            ],
            axis=0,
        )
        total8 = total8 + shifted  # (72, G, w, NR) < 2**25
    total8 = fr._carry_norm(total8, 25, width=8)  # exact 8-bit digits
    c16 = total8[0::2] + (total8[1::2] << 8)  # (36, G, w, NR) < 2**16
    ws = fr.redc_extra_wide(c16)  # (16, G, w, NR) Montgomery lazy
    ie = ws[:, :, 0, :]  # (16, G, NR)
    id_ = ws[:, :, 1, :]
    assert n_raws == degree + 1
    if degree > 1:  # binomial constants (trivial for the identity gate)
        cm = jnp.asarray(_binom_tensor_np(degree))[:, None, :]
        ie = fr.mul(ie, cm)
        id_ = fr.mul(id_, cm)
    zero = jnp.zeros((L, g, 1), dtype=jnp.uint32)
    p_e = jnp.concatenate([ie, zero], axis=2)  # m = 0..deg+1
    p_d = jnp.concatenate([zero, id_], axis=2)
    coeffs = fr.add(p_e, p_d)  # (16, G, deg+2)
    return jnp.swapaxes(coeffs, 1, 2)  # (16, deg+2, G)


# ---------------------------------------------------------------------------
# Grouped round kernels (G independent sumcheck instances per dispatch)
# ---------------------------------------------------------------------------
#
# The per-round Fiat-Shamir hash is a sequential latency floor (~ms per
# round); proving G independent instances in ONE walk amortizes it G-fold:
# every kernel carries a group axis — tables (16, G, n), hashes (16, G)
# lanes — so the group costs the same wall-clock as a single instance.


def _cipher_pe_kernel_g(skip_t0: bool):
    def kern(ark_ref, eqb_ref, eqt_ref, x0b_ref, x0t_ref, x1b_ref, x1t_ref,
             o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        ark = ark_ref[:][:, :, None]  # (L, G, 1)
        eq_b, eq_t = eqb_ref[:], eqt_ref[:]
        x0_b, x0_t = x0b_ref[:], x0t_ref[:]
        x1_b, x1_t = x1b_ref[:], x1t_ref[:]

        d_eq = fc.sub(eq_t, eq_b)
        d_x0 = fc.sub(x0_t, x0_b)
        d_x1 = fc.sub(x1_t, x1_b)

        eq_c, x0_c, x1_c = eq_b, x0_b, x1_b
        for col, t in enumerate(_t_schedule(o_ref.shape[1], skip_t0)):
            if t == 1:
                eq_c, x0_c, x1_c = eq_t, x0_t, x1_t
            elif t > 1:
                eq_c = fc.add(eq_c, d_eq)
                x0_c = fc.add(x0_c, d_x0)
                x1_c = fc.add(x1_c, d_x1)
            g = fc.pow7(fc.add(fc.add(x1_c, ark), x0_c))
            prod = fc.mul(eq_c, g)  # (L, G, b)
            cols = jnp.sum(prod.astype(jnp.int32), axis=2).astype(jnp.uint32)
            limbs, over = fc.carry_rows(cols, 26, with_over=True)  # (L,G),(1,G)
            o_ref[0:L, pl.ds(col, 1), :] += limbs[:, None, :]
            o_ref[L : L + 1, pl.ds(col, 1), :] += over[:, None, :]

    return kern


def _identity_pe_kernel_g(skip_t0: bool):
    def kern(eqb_ref, eqt_ref, x0b_ref, x0t_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        eq_b, eq_t = eqb_ref[:], eqt_ref[:]
        x0_b, x0_t = x0b_ref[:], x0t_ref[:]
        d_eq = fc.sub(eq_t, eq_b)
        d_x0 = fc.sub(x0_t, x0_b)

        eq_c, x0_c = eq_b, x0_b
        for col, t in enumerate(_t_schedule(o_ref.shape[1], skip_t0)):
            if t == 1:
                eq_c, x0_c = eq_t, x0_t
            elif t > 1:
                eq_c = fc.add(eq_c, d_eq)
                x0_c = fc.add(x0_c, d_x0)
            prod = fc.mul(eq_c, x0_c)
            cols = jnp.sum(prod.astype(jnp.int32), axis=2).astype(jnp.uint32)
            limbs, over = fc.carry_rows(cols, 26, with_over=True)
            o_ref[0:L, pl.ds(col, 1), :] += limbs[:, None, :]
            o_ref[L : L + 1, pl.ds(col, 1), :] += over[:, None, :]

    return kern


def _pe_call_g(kernel, tables, extra_args, extra_specs, n_evals):
    """Shared pallas_call plumbing for grouped partial evals: tables
    (L, G, n) split bottom/top on the last axis, (L+1, E, G) accumulator."""
    g = tables[0].shape[1]
    n = tables[0].shape[-1]
    mid = n // 2
    b = _block_for(mid)
    nb = mid // b

    def bot(i):
        return (0, 0, i)

    def top(i):
        return (0, 0, i + nb)

    in_specs = list(extra_specs)
    args = list(extra_args)
    for t in tables:
        in_specs += [
            pl.BlockSpec((L, g, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, g, b), top, memory_space=pltpu.VMEM),
        ]
        args += [t, t]
    acc = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L + 1, n_evals, g), jnp.uint32),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (L + 1, n_evals, g), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
    )(*args)
    return _finish_evals(acc)  # (16, n_evals, G)


@partial(jax.jit, static_argnums=(4, 5))
def cipher_partial_evals_g(eq, x0, x1, ark, n_evals: int, skip_t0: bool = False):
    """Grouped round partial evals: eq/x0/x1 (16, G, n), ark (16, G) ->
    (16, n_evals[-1], G)."""
    g = eq.shape[1]
    spec = [pl.BlockSpec((L, g), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    n_out = n_evals - 1 if skip_t0 else n_evals
    return _pe_call_g(
        _cipher_pe_kernel_g(skip_t0), [eq, x0, x1], [ark], spec, n_out
    )


@partial(jax.jit, static_argnums=(2, 3))
def identity_partial_evals_g(eq, x0, n_evals: int, skip_t0: bool = False):
    n_out = n_evals - 1 if skip_t0 else n_evals
    return _pe_call_g(_identity_pe_kernel_g(skip_t0), [eq, x0], [], [], n_out)


def _fold_kernel_g(nt):
    def kern(*refs):
        r = refs[0][:][:, :, None]  # (L, G, 1)
        for k in range(nt):
            bot = refs[1 + 2 * k][:]
            top = refs[2 + 2 * k][:]
            refs[1 + 2 * nt + k][:] = fc.add(bot, fc.mul(fc.sub(top, bot), r))

    return kern


@partial(jax.jit, static_argnums=(2,))
def fold_tables_g(tables, r, nt: int):
    """Grouped fold: [(16, G, n)] + r (16, G) -> [(16, G, n/2)]."""
    g = tables[0].shape[1]
    n = tables[0].shape[-1]
    mid = n // 2
    b = _block_for(mid)
    nb = mid // b

    def bot(i):
        return (0, 0, i)

    def top(i):
        return (0, 0, i + nb)

    in_specs = [pl.BlockSpec((L, g), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    args = [r]
    for t in tables:
        in_specs += [
            pl.BlockSpec((L, g, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, g, b), top, memory_space=pltpu.VMEM),
        ]
        args += [t, t]
    out_shapes = [jax.ShapeDtypeStruct((L, g, mid), jnp.uint32) for _ in tables]
    out_specs = [
        pl.BlockSpec((L, g, b), bot, memory_space=pltpu.VMEM) for _ in tables
    ]
    outs = pl.pallas_call(
        _fold_kernel_g(nt),
        out_shape=out_shapes,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
    )(*args)
    return list(outs)


def _fs_hash_kernel_g(n_words: int, unroll: int, use_mxu: bool):
    n_steps = MIMC_FS_ROUNDS // unroll

    def kern(m1_ref, m2_ref, arks_ref, msgs_ref, o_ref, st_ref, res_ref):
        k = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when((k == 0) & (i == 0))
        def _():
            st_ref[:] = jnp.zeros_like(st_ref)

        block = msgs_ref[0]  # (L, G): word k via the index_map

        @pl.when(i == 0)
        def _():
            res_ref[:] = block

        m1, m2 = m1_ref[:], m2_ref[:]
        arks = arks_ref[:].astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, arks.shape, 1)
        res = res_ref[:]
        st = st_ref[:]
        for j in range(unroll):
            ark = jnp.sum(
                jnp.where(lane == i * unroll + j, arks, 0),
                axis=1,
                keepdims=True,
            ).astype(jnp.uint32)
            t = fc.add(fc.add(res, st), ark)
            res = fc.pow7_mxu(t, m1, m2) if use_mxu else fc.pow7_lat(t)
        res_ref[:] = res

        @pl.when(i == n_steps - 1)
        def _():
            st2 = fc.add(st, st)
            st_ref[:] = fc.add(fc.add(res, st2), block)

        @pl.when((k == n_words - 1) & (i == n_steps - 1))
        def _():
            o_ref[:] = st_ref[:]

    return kern


@jax.jit
def mimc_hash_fs_g(msgs):
    """Grouped transcript hash: msgs (16, K, G) -> (16, G) — G independent
    MimcHash chains advance in lockstep, same latency as one."""
    from ..hashes.ark import arks_scan_tensor

    k = msgs.shape[1]
    g = msgs.shape[2]
    unroll = int(os.environ.get("GKR_FS_UNROLL", "7"))
    assert MIMC_FS_ROUNDS % unroll == 0, "GKR_FS_UNROLL must divide 91"
    arks_cols = jnp.moveaxis(arks_scan_tensor(MIMC_FS_ROUNDS), 0, 1)
    arks_pad = (
        jnp.zeros((L, 128), dtype=jnp.uint32).at[:, :MIMC_FS_ROUNDS].set(arks_cols)
    )
    msgs_km = jnp.moveaxis(msgs, 1, 0)  # (K, L, G)
    return pl.pallas_call(
        _fs_hash_kernel_g(k, unroll, _fs_mxu()),
        out_shape=jax.ShapeDtypeStruct((L, g), jnp.uint32),
        grid=(k, MIMC_FS_ROUNDS // unroll),
        in_specs=[
            pl.BlockSpec((32, 32), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 32), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 128), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, g), lambda kk, i: (kk, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, g), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, g), jnp.uint32),
            pltpu.VMEM((L, g), jnp.uint32),
        ],
    )(jnp.asarray(fc.REDC_M1), jnp.asarray(fc.REDC_M2), arks_pad, msgs_km)


from ..fields.bn254 import P as _BN_P, R1 as _BN_R1, int_to_limbs as _itl

_MONT_ONE = _itl(_BN_R1 % _BN_P)


def _gruen_round_kernel(unroll: int):
    """Fused Gruen round-scalar kernel: builds the round coefficients
    P_m = (alpha*Q_m + beta*Q_{m-1}) * ck on the fly, hashes them through
    the 9-word x 91-round Fiat-Shamir chain, and finishes with the next
    eq prefix ck' = ck * eq1(qk, r) — one kernel instead of ~40 tiny XLA
    ops per round (the per-round 'glue' of sumcheck/prover.py
    _gruen_combine/_eq1_at). Same field formulas -> same values mod p ->
    bit-identical transcripts (proof coeffs are canonicalized on output).
    """
    n_steps = MIMC_FS_ROUNDS // unroll
    n_words = 9

    def _colq(q_ref, idx):
        # dynamic column select over the 8-coeff axis via mask+reduce
        v = q_ref[:].astype(jnp.int32)  # (L, 8, G)
        col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        return jnp.sum(jnp.where(col == idx, v, 0), axis=1).astype(
            jnp.uint32
        )  # (L, G)

    def kern(m1_ref, m2_ref, arks_ref, q_ref, al_ref, be_ref, ck_ref,
             qk_ref, op_ref, or_ref, ock_ref, st_ref, res_ref):
        k = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when((k == 0) & (i == 0))
        def _():
            st_ref[:] = jnp.zeros_like(st_ref)

        @pl.when(i == 0)
        def _():
            qm = _colq(q_ref, k)
            qm1 = _colq(q_ref, k - 1)  # k=0 -> zero (mask never matches)
            p = fc.mul(
                fc.add(fc.mul(qm, al_ref[:]), fc.mul(qm1, be_ref[:])),
                ck_ref[:],
            )
            op_ref[0] = p
            res_ref[:] = p

        m1, m2 = m1_ref[:], m2_ref[:]
        arks = arks_ref[:].astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, arks.shape, 1)
        res = res_ref[:]
        st = st_ref[:]
        for j in range(unroll):
            ark = jnp.sum(
                jnp.where(lane == i * unroll + j, arks, 0),
                axis=1,
                keepdims=True,
            ).astype(jnp.uint32)
            t = fc.add(fc.add(res, st), ark)
            res = fc.pow7_mxu(t, m1, m2) if _fs_mxu() else fc.pow7_lat(t)
        res_ref[:] = res

        @pl.when(i == n_steps - 1)
        def _():
            block = res_ref[:]  # not used; Miyaguchi uses the ORIGINAL block
            del block
            # state' = perm + 2*state + block  (block = this word's P)
            st2 = fc.add(st, st)
            # recover the original block: it was stored in res at i==0 and
            # overwritten — recompute from Q (cheap, once per word)
            qm = _colq(q_ref, k)
            qm1 = _colq(q_ref, k - 1)
            p = fc.mul(
                fc.add(fc.mul(qm, al_ref[:]), fc.mul(qm1, be_ref[:])),
                ck_ref[:],
            )
            st_ref[:] = fc.add(fc.add(res, st2), p)

        @pl.when((k == n_words - 1) & (i == n_steps - 1))
        def _():
            r = st_ref[:]
            or_ref[:] = r
            qk = qk_ref[:]
            # eq1 = 1 - qk - r + 2*qk*r  (same op order as _eq1_at);
            # 'one' is the Montgomery one (R mod p), as in fields.fr.one
            one = fc._const_vec(_MONT_ONE, (L,) + (1,) * (qk.ndim - 1))
            one = jnp.broadcast_to(one, qk.shape)
            t = fc.mul(qk, r)
            eq1 = fc.add(fc.sub(fc.sub(one, qk), r), fc.add(t, t))
            ock_ref[:] = fc.mul(ck_ref[:], eq1)

    return kern


@jax.jit
def gruen_round_scalar(qcoeffs, alpha, beta, ck, qk):
    """Fused per-round scalar stage: qcoeffs (16, 8, G), scalars (16, G)
    -> (P (16, 9, G) canonical-lazy coeffs, r (16, G), ck' (16, G))."""
    from ..hashes.ark import arks_scan_tensor

    g = qcoeffs.shape[2]
    arks_cols = jnp.moveaxis(arks_scan_tensor(MIMC_FS_ROUNDS), 0, 1)
    arks_pad = (
        jnp.zeros((L, 128), dtype=jnp.uint32)
        .at[:, :MIMC_FS_ROUNDS]
        .set(arks_cols)
    )
    unroll = int(os.environ.get("GKR_FS_UNROLL", "7"))
    assert MIMC_FS_ROUNDS % unroll == 0
    outs = pl.pallas_call(
        _gruen_round_kernel(unroll),
        out_shape=[
            jax.ShapeDtypeStruct((9, L, g), jnp.uint32),
            jax.ShapeDtypeStruct((L, g), jnp.uint32),
            jax.ShapeDtypeStruct((L, g), jnp.uint32),
        ],
        grid=(9, MIMC_FS_ROUNDS // unroll),
        in_specs=[
            pl.BlockSpec((32, 32), lambda k, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 32), lambda k, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 128), lambda k, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 8, g), lambda k, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, g), lambda k, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, g), lambda k, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, g), lambda k, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, g), lambda k, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L, g), lambda k, i: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, g), lambda k, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, g), lambda k, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, g), jnp.uint32),
            pltpu.VMEM((L, g), jnp.uint32),
        ],
    )(
        jnp.asarray(fc.REDC_M1), jnp.asarray(fc.REDC_M2), arks_pad,
        qcoeffs, alpha, beta, ck, qk,
    )
    p, r, ck2 = outs
    return jnp.moveaxis(p, 0, 1), r, ck2  # (16, 9, G)


def gruen_fuse_enabled() -> bool:
    return os.environ.get("GKR_GRUEN_FUSE", "1") == "1"


# ---------------------------------------------------------------------------
# Folding
# ---------------------------------------------------------------------------


def _fold_kernel_n(nt):
    def kern(*refs):
        r_ref = refs[0]
        r = r_ref[:]
        for k in range(nt):
            b_ref = refs[1 + 2 * k]
            t_ref = refs[2 + 2 * k]
            o_ref = refs[1 + 2 * nt + k]
            bot = b_ref[:]
            o_ref[:] = fc.add(bot, fc.mul(fc.sub(t_ref[:], bot), r))

    return kern


@partial(jax.jit, static_argnums=(2,))
def fold_tables(tables, r, nt: int):
    """Fold nt tables on challenge r in one kernel: [(16, n)] -> [(16, n/2)]."""
    n = tables[0].shape[-1]
    mid = n // 2
    b = _block_for(mid)
    nb = mid // b

    def bot(i):
        return (0, i)

    def top(i):
        return (0, i + nb)

    in_specs = [pl.BlockSpec((L, b), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    args = [jnp.broadcast_to(r.reshape(L, 1), (L, b))]
    for t in tables:
        in_specs += [
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
        ]
        args += [t, t]
    out_shapes = [jax.ShapeDtypeStruct((L, mid), jnp.uint32) for _ in tables]
    out_specs = [pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM) for _ in tables]
    outs = pl.pallas_call(
        _fold_kernel_n(nt),
        out_shape=out_shapes,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
    )(*args)
    return list(outs)


# ---------------------------------------------------------------------------
# Multi-claim eq-table build (single pass)
# ---------------------------------------------------------------------------
#
# The fan-out layer's combined table  sum_j m_j * eq(q_j, x)  built as 91
# sequential full-size doubling passes (the reference's accumulation,
# sumcheck/prover.go:102-144) costs seconds at bn=20 in XLA — dominated by
# the per-claim interleave/reshape layout thrash, not math. Factorize
# eq(q, x) = eq(q_hi, x_hi) * eq(q_lo, x_lo): per claim, build a tiny hi
# table over the leading bits (multiplier folded in) and a tiny lo table
# over the trailing bits, then ONE streaming kernel computes
# out[c*B + t] = sum_j mh_j[c] * lo_j[t] with all J lo-tables resident in
# VMEM. Work: J muls/element — one pass over the output.


def _multi_eq_kernel(n_claims: int):
    def kern(mh_ref, lo_ref, o_ref):
        mh = mh_ref[0]  # (L, J): this chunk's per-claim prefixes
        lo = lo_ref[:]  # (L, J, B)
        b = lo.shape[-1]

        def mhj(j):  # lane-broadcast only (Mosaic can't do both axes)
            return jnp.broadcast_to(mh[:, j : j + 1], (mh.shape[0], b))

        # operand order matters: fc.mul row-slices its SECOND operand, and
        # Mosaic cannot row-slice a lane-broadcast value (it refolds into an
        # unsupported both-axis broadcast) — keep the broadcast first.
        acc = fc.mul(mhj(0), lo[:, 0, :])
        for j in range(1, n_claims):
            acc = fc.add(acc, fc.mul(mhj(j), lo[:, j, :]))
        o_ref[:] = acc

    return kern


@jax.jit
def multi_eq_accum(mh, lo):
    """mh: (C, 16, J) per-chunk per-claim prefixes (multipliers folded in);
    lo: (16, J, B) per-claim low tables. Returns (16, C*B)."""
    c, _, j = mh.shape
    b = lo.shape[-1]
    out = pl.pallas_call(
        _multi_eq_kernel(j),
        out_shape=jax.ShapeDtypeStruct((L, c * b), jnp.uint32),
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, L, j), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, j, b), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, b), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(mh, lo)
    return out


# ---------------------------------------------------------------------------
# Eq-table build stage
# ---------------------------------------------------------------------------


def _mul_scalar_kernel(r_ref, x_ref, o_ref):
    o_ref[:] = fc.mul(x_ref[:], r_ref[:])


@jax.jit
def mul_scalar(x, r):
    """x * broadcast scalar r: the eq-table doubling stage inner op."""
    n = x.shape[-1]
    b = _block_for(n)
    return pl.pallas_call(
        _mul_scalar_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n // b,),
        in_specs=[
            pl.BlockSpec((L, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, b), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(jnp.broadcast_to(r.reshape(L, 1), (L, b)), x)
