"""Dense multilinear bookkeeping tables on the TPU.

A MultiLin is a (16, ..., N) Montgomery limb tensor: N = 2**n evaluations of
a multilinear polynomial over the boolean hypercube in lexicographic order
(parity with poly/multilin.go:12). The hypercube axis is the LAST axis so
batched variants (e.g. all sumcheck eval points t at once) stack between the
limb axis and the hypercube axis, and so multi-chip meshes shard the last
axis.

The reference mutates tables in place via a sync.Pool (poly/pool.go); here
tables are functional values — XLA buffer donation recovers in-place updates
where legal, which is the idiomatic TPU replacement for the pool.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fields import fr, scalar


def _bcast_r(r, ndim):
    """Broadcast a single element (16,) across a table's batch axes."""
    return r.reshape((fr.L,) + (1,) * (ndim - 1))


def fold(table, r):
    """One sumcheck fold on the leading hypercube variable:
    out[i] = bottom[i] + r*(top[i] - bottom[i]); table length halves.
    Parity with poly/multilin.go:26-36 (FoldChunk)."""
    n = table.shape[-1]
    mid = n // 2
    bottom = table[..., :mid]
    top = table[..., mid:]
    rr = _bcast_r(r, table.ndim)
    return fr.add(bottom, fr.mul(fr.sub(top, bottom), rr))


def evaluate(table, coords):
    """Fold on every coordinate; returns the (16,) evaluation.
    Parity with poly/multilin.go:59-66."""
    t = table
    for i in range(coords.shape[0]):
        t = fold(t, coords[i])
    return t[..., 0]


def add(a, b):
    return fr.add(a, b)


# ---------------------------------------------------------------------------
# Eq tables
# ---------------------------------------------------------------------------


def eq_table(qprime, multiplier=None):
    """Direct construction of the folded eq table:
    out[x] = mult * prod_i eq1(q_i, bit_i(x)) with bit 0 the MSB,
    shape (16, 2**n). Parity with poly/eq.go:41-59 (FoldedEqTable).

    qprime: (n, 16) Montgomery tensor of the evaluation point.
    """
    from ..ops import kernels as K

    n = qprime.shape[0]
    t = fr.one(()) if multiplier is None else multiplier
    t = t[:, None]  # (16, 1)
    use_pallas = K.pallas_enabled()
    for i in range(n):
        r = qprime[i][:, None]  # (16, 1) broadcasts over current length
        if use_pallas and t.shape[-1] >= 512:
            rt = K.mul_scalar(t, qprime[i])
        else:
            rt = fr.mul(t, r)
        lo = fr.sub(t, rt)
        # interleave: new index = old*2 + bit (earlier steps more significant)
        t = jnp.stack([lo, rt], axis=-1).reshape(fr.L, -1)
    return t


def eq_table_grouped(qprime, multiplier=None):
    """Grouped eq tables: qprime (n, G, 16) -> (16, G, 2**n), one table per
    group lane (the grouped prover's per-instance evaluation points).
    Same doubling construction as eq_table, vectorized over G."""
    import jax.numpy as jnp

    n, g, _ = qprime.shape
    t = (
        fr.one((g,)) if multiplier is None else multiplier
    )[:, :, None]  # (16, G, 1)
    for i in range(n):
        r = jnp.moveaxis(qprime[i], -1, 0)[:, :, None]  # (16, G, 1)
        rt = fr.mul(t, r)
        lo = fr.sub(t, rt)
        t = jnp.stack([lo, rt], axis=-1).reshape(fr.L, g, -1)
    return t


def eq_prefix(qprime_high, chunk_id, multiplier=None):
    """Prefix product seeding a chunk-local eq table from the chunk index
    bits: r = mult * prod_k (q if bit else 1-q). Parity with
    poly/eq.go:62-89 (ChunkOfEqTable); chunk_id may be a traced scalar
    (e.g. a mesh axis_index), which is how shards build their eq tables
    locally without any communication.

    qprime_high: (k, 16) — the first k (most significant) variables.
    """
    k = qprime_high.shape[0]
    r = fr.one(()) if multiplier is None else multiplier
    for bit_pos in range(k):
        # bit k-1-bit_pos of chunk_id selects qprime_high[bit_pos]
        q = qprime_high[bit_pos]
        bit = (chunk_id >> (k - 1 - bit_pos)) & 1
        term = fr.select(bit == 1, q, fr.sub(fr.one(()), q))
        r = fr.mul(r, term)
    return r


def eq_eval_device(q, h):
    """EvalEq(q, h) = prod_i (1 + 2 q_i h_i - q_i - h_i) on device.
    q, h: (n, 16). Parity with poly/eq.go:19-32."""
    res = fr.one(())
    for i in range(q.shape[0]):
        qh = fr.mul(q[i], h[i])
        term = fr.add(fr.add(qh, qh), fr.one(()))
        term = fr.sub(term, fr.add(q[i], h[i]))
        res = fr.mul(res, term)
    return res


# ---------------------------------------------------------------------------
# Host oracles (ints)
# ---------------------------------------------------------------------------


def eq_eval_scalar(q: list[int], h: list[int]) -> int:
    res = 1
    for qi, hi in zip(q, h):
        qh = scalar.mul(qi, hi)
        term = scalar.sub(scalar.add(scalar.add(qh, qh), 1), scalar.add(qi, hi))
        res = scalar.mul(res, term)
    return res


def eq_table_scalar(q: list[int], multiplier: int = 1) -> list[int]:
    t = [multiplier]
    for qi in q:
        nxt = []
        for v in t:
            rv = scalar.mul(v, qi)
            nxt.extend((scalar.sub(v, rv), rv))
        t = nxt
    return t


def evaluate_scalar(table: list[int], coords: list[int]) -> int:
    t = list(table)
    for r in coords:
        mid = len(t) // 2
        t = [scalar.add(t[i], scalar.mul(r, scalar.sub(t[mid + i], t[i]))) for i in range(mid)]
    return t[0]
