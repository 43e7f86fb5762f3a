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
from functools import partial

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


def _witness_kernel(arks_ref, block_ref, state_ref, o_ref, st_scratch):
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

    nxt = fc.pow7(fc.add(fc.add(st_scratch[:], ark), block_ref[:]))
    o_ref[:] = nxt[None]
    st_scratch[:] = nxt


@jax.jit
def mimc_witness(block, state, arks_cols):
    """All 91 cipher-layer tables: out (91, 16, N).

    arks_cols: (16, 91) Montgomery columns. The round axis rides the grid
    (sequential on TPU) with the running state held in VMEM scratch; the
    reference instead evaluates 91 separate layers with a goroutine pool."""
    n = block.shape[-1]
    b = min(_block_for(n), 256)
    n_rounds = arks_cols.shape[1]
    arks_pad = jnp.zeros((L, 128), dtype=jnp.uint32).at[:, :n_rounds].set(arks_cols)
    return pl.pallas_call(
        _witness_kernel,
        out_shape=jax.ShapeDtypeStruct((n_rounds, L, n), block.dtype),
        grid=(n // b, n_rounds),
        in_specs=[
            pl.BlockSpec((L, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, L, b), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((L, b), jnp.uint32)],
    )(arks_pad, block, state)


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


def _fs_hash_kernel(n_words: int, unroll: int):
    n_steps = MIMC_FS_ROUNDS // unroll

    def _col(ref, idx):
        # dynamic column select via mask+reduce (dynamic lane slicing
        # needs 128-alignment; the masked reduce is register-only)
        v = ref[:].astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        return jnp.sum(
            jnp.where(lane == idx, v, 0), axis=1, keepdims=True
        ).astype(jnp.uint32)

    def kern(arks_ref, msgs_ref, o_ref, st_ref, res_ref):
        k = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when((k == 0) & (i == 0))
        def _():
            st_ref[:] = jnp.zeros_like(st_ref)

        block = _col(msgs_ref, k)

        @pl.when(i == 0)
        def _():
            res_ref[:] = block

        res = res_ref[:]
        st = st_ref[:]
        for j in range(unroll):  # `unroll` MiMC rounds per grid step
            ark = _col(arks_ref, i * unroll + j)
            res = fc.pow7(fc.add(fc.add(res, st), ark))
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
        _fs_hash_kernel(k, unroll),
        out_shape=jax.ShapeDtypeStruct((L, 1), jnp.uint32),
        grid=(k, MIMC_FS_ROUNDS // unroll),
        in_specs=[
            pl.BlockSpec((L, 128), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 128), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, 1), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, 1), jnp.uint32),
            pltpu.VMEM((L, 1), jnp.uint32),
        ],
    )(arks_pad, msgs_pad)
    return out[:, 0]


# ---------------------------------------------------------------------------
# Sumcheck round kernels
# ---------------------------------------------------------------------------


def _blocksum(v):
    """Raw block sum of lazy reps over the lane axis -> (17, 1) limbs+over."""
    cols = jnp.sum(v.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.uint32)
    limbs, over = fc.carry_rows(cols, 26, with_over=True)
    return limbs, over


def _cipher_pe_kernel(ark_ref, eqb_ref, eqt_ref, x0b_ref, x0t_ref, x1b_ref, x1t_ref, o_ref):
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

    n_evals = o_ref.shape[1]
    eq_c, x0_c, x1_c = eq_b, x0_b, x1_b
    for t in range(n_evals):
        if t == 1:
            eq_c, x0_c, x1_c = eq_t, x0_t, x1_t
        elif t > 1:
            eq_c = fc.add(eq_c, d_eq)
            x0_c = fc.add(x0_c, d_x0)
            x1_c = fc.add(x1_c, d_x1)
        g = fc.pow7(fc.add(fc.add(x1_c, ark), x0_c))
        prod = fc.mul(eq_c, g)
        limbs, over = _blocksum(prod)
        o_ref[0:L, pl.ds(t, 1)] += limbs
        o_ref[L : L + 1, pl.ds(t, 1)] += over


def _identity_pe_kernel(eqb_ref, eqt_ref, x0b_ref, x0t_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    eq_b, eq_t = eqb_ref[:], eqt_ref[:]
    x0_b, x0_t = x0b_ref[:], x0t_ref[:]
    d_eq = fc.sub(eq_t, eq_b)
    d_x0 = fc.sub(x0_t, x0_b)

    n_evals = o_ref.shape[1]
    eq_c, x0_c = eq_b, x0_b
    for t in range(n_evals):
        if t == 1:
            eq_c, x0_c = eq_t, x0_t
        elif t > 1:
            eq_c = fc.add(eq_c, d_eq)
            x0_c = fc.add(x0_c, d_x0)
        prod = fc.mul(eq_c, x0_c)
        limbs, over = _blocksum(prod)
        o_ref[0:L, pl.ds(t, 1)] += limbs
        o_ref[L : L + 1, pl.ds(t, 1)] += over


def _finish_evals(acc):
    """(17, T) raw column accumulators -> (16, T) Montgomery lazy reps."""
    plain = fr._redc_wide_ext(acc[:L], acc[L])
    return fr.mul(plain, fr._r2_tensor(plain.ndim - 1))


@partial(jax.jit, static_argnums=(4,))
def cipher_partial_evals(eq, x0, x1, ark, n_evals: int):
    """One round's partial evals for the cipher gate: (16, n_evals)."""
    n = eq.shape[-1]
    mid = n // 2
    b = _block_for(mid)
    nb = mid // b

    def bot(i):
        return (0, i)

    def top(i):
        return (0, i + nb)

    acc = pl.pallas_call(
        _cipher_pe_kernel,
        out_shape=jax.ShapeDtypeStruct((L + 1, n_evals), jnp.uint32),
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
        out_specs=pl.BlockSpec((L + 1, n_evals), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )(ark.reshape(L, 1), eq, eq, x0, x0, x1, x1)
    return _finish_evals(acc)


@partial(jax.jit, static_argnums=(2,))
def identity_partial_evals(eq, x0, n_evals: int):
    n = eq.shape[-1]
    mid = n // 2
    b = _block_for(mid)
    nb = mid // b

    def bot(i):
        return (0, i)

    def top(i):
        return (0, i + nb)

    acc = pl.pallas_call(
        _identity_pe_kernel,
        out_shape=jax.ShapeDtypeStruct((L + 1, n_evals), jnp.uint32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), bot, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, b), top, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L + 1, n_evals), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )(eq, eq, x0, x0)
    return _finish_evals(acc)


# ---------------------------------------------------------------------------
# Grouped round kernels (G independent sumcheck instances per dispatch)
# ---------------------------------------------------------------------------
#
# The per-round Fiat-Shamir hash is a sequential latency floor (~ms per
# round); proving G independent instances in ONE walk amortizes it G-fold:
# every kernel carries a group axis — tables (16, G, n), hashes (16, G)
# lanes — so the group costs the same wall-clock as a single instance.


def _cipher_pe_kernel_g(ark_ref, eqb_ref, eqt_ref, x0b_ref, x0t_ref,
                        x1b_ref, x1t_ref, o_ref):
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

    n_evals = o_ref.shape[1]
    eq_c, x0_c, x1_c = eq_b, x0_b, x1_b
    for t in range(n_evals):
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
        o_ref[0:L, pl.ds(t, 1), :] += limbs[:, None, :]
        o_ref[L : L + 1, pl.ds(t, 1), :] += over[:, None, :]


def _identity_pe_kernel_g(eqb_ref, eqt_ref, x0b_ref, x0t_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    eq_b, eq_t = eqb_ref[:], eqt_ref[:]
    x0_b, x0_t = x0b_ref[:], x0t_ref[:]
    d_eq = fc.sub(eq_t, eq_b)
    d_x0 = fc.sub(x0_t, x0_b)

    n_evals = o_ref.shape[1]
    eq_c, x0_c = eq_b, x0_b
    for t in range(n_evals):
        if t == 1:
            eq_c, x0_c = eq_t, x0_t
        elif t > 1:
            eq_c = fc.add(eq_c, d_eq)
            x0_c = fc.add(x0_c, d_x0)
        prod = fc.mul(eq_c, x0_c)
        cols = jnp.sum(prod.astype(jnp.int32), axis=2).astype(jnp.uint32)
        limbs, over = fc.carry_rows(cols, 26, with_over=True)
        o_ref[0:L, pl.ds(t, 1), :] += limbs[:, None, :]
        o_ref[L : L + 1, pl.ds(t, 1), :] += over[:, None, :]


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


@partial(jax.jit, static_argnums=(4,))
def cipher_partial_evals_g(eq, x0, x1, ark, n_evals: int):
    """Grouped round partial evals: eq/x0/x1 (16, G, n), ark (16, G) ->
    (16, n_evals, G)."""
    g = eq.shape[1]
    spec = [pl.BlockSpec((L, g), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    return _pe_call_g(
        _cipher_pe_kernel_g, [eq, x0, x1], [ark], spec, n_evals
    )


@partial(jax.jit, static_argnums=(2,))
def identity_partial_evals_g(eq, x0, n_evals: int):
    return _pe_call_g(_identity_pe_kernel_g, [eq, x0], [], [], n_evals)


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


def _fs_hash_kernel_g(n_words: int, unroll: int):
    n_steps = MIMC_FS_ROUNDS // unroll

    def kern(arks_ref, msgs_ref, o_ref, st_ref, res_ref):
        k = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when((k == 0) & (i == 0))
        def _():
            st_ref[:] = jnp.zeros_like(st_ref)

        block = msgs_ref[0]  # (L, G): word k via the index_map

        @pl.when(i == 0)
        def _():
            res_ref[:] = block

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
            res = fc.pow7(fc.add(fc.add(res, st), ark))
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
        _fs_hash_kernel_g(k, unroll),
        out_shape=jax.ShapeDtypeStruct((L, g), jnp.uint32),
        grid=(k, MIMC_FS_ROUNDS // unroll),
        in_specs=[
            pl.BlockSpec((L, 128), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, g), lambda kk, i: (kk, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, g), lambda kk, i: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, g), jnp.uint32),
            pltpu.VMEM((L, g), jnp.uint32),
        ],
    )(arks_pad, msgs_km)


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
