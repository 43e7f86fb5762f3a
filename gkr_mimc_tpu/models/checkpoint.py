"""Checkpoint/recompute assignment for the MiMC circuit.

The full witness is 94 tables (6.3 GB at bn=20 per lane) — too large to
keep resident for grouped full-bn lanes or a single bn=22 proof (v5e HBM
is 16 GB). The witness is a cheap forward scan, so instead of storing
every layer we store the scan STATE at every `stride`-th round (plus the
final span's tables, which the output->input GKR walk consumes first) and
regenerate each span of `stride` tables on demand as the walk descends —
one extra witness pass in total, for a ~4x residency cut at stride 13
(91 = 7*13, so spans divide evenly and the walk's first span is full). Each cipher table is consumed exactly once by the walk
(layer l's sumcheck reads a[l-1]), so tables are dropped from the cache
on read and freed by refcount as soon as the sumcheck dispatch consumes
them.

Capacity analog of the reference's 2^24-entry pool sizing
(poly/pool.go:13-14, circuit/assignment.go:9-64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields import fr
from .mimc import MIMC_ROUNDS, _arks_cols, _assign_fused_jit


def _witness_span(block, state, r0: int, nr: int):
    """Cipher tables for witness rounds [r0, r0+nr): returns (nr, 16, *S)
    via the fused Pallas kernel (or the portable scan off-TPU)."""
    from ..ops import kernels as K

    arks = _arks_cols()[:, r0 : r0 + nr]
    if K.pallas_enabled() and block.shape[-1] >= 512:
        shape = block.shape
        wit = K.mimc_witness(
            block.reshape(fr.L, -1), state.reshape(fr.L, -1),
            jnp.asarray(arks),
        )
        return wit.reshape((nr,) + shape)
    from ..hashes.ark import arks_scan_tensor

    arks_t = arks_scan_tensor(MIMC_ROUNDS)[r0 : r0 + nr]

    def body(cur, ark):
        a = ark.reshape((fr.L,) + (1,) * (cur.ndim - 1))
        nxt = fr.pow7(fr.add(fr.add(cur, block), a))
        return nxt, nxt

    _, states = jax.lax.scan(body, state, arks_t)
    return states


class CheckpointedAssignment:
    """Duck-types the `list` the GKR walk indexes (`assignment[j]`,
    `len(assignment)`): indices 0/1/2 are block/state/block; cipher
    indices 3..93 regenerate span-by-span from the stored checkpoints.

    Layout: span i covers witness rounds [i*stride, min((i+1)*stride, 91))
    producing tables a[3 + r] for r in that range; checkpoint[i] is the
    scan state ENTERING span i."""

    def __init__(self, block, state, stride: int = 13):
        self.block = block
        self.state = state
        self.stride = stride
        self.n_spans = -(-MIMC_ROUNDS // stride)
        self._ckpt = [None] * self.n_spans
        self._spans = [None] * self.n_spans
        self._live = [0] * self.n_spans  # unconsumed rows per filled span
        self._cache: dict = {}
        # forward pass: record span-entry states; keep only the LAST
        # span's tables (the walk consumes tables in descending order)
        cur = state
        for i in range(self.n_spans):
            r0 = i * stride
            nr = min(stride, MIMC_ROUNDS - r0)
            self._ckpt[i] = cur
            if i == self.n_spans - 1:
                self._fill_span(i)
                cur = None
            else:
                span = _witness_span(block, cur, r0, nr)
                cur = span[nr - 1]
                del span

    def _fill_span(self, i: int):
        """Materialize span i ONCE as a single (nr, 16, *S) buffer; rows
        are sliced lazily on consumption. (Slicing every row eagerly kept
        the span buffer AND nr per-row copies alive together — 13 GB
        transient at bn=23, the round-5 OOM.) The span-entry checkpoint is
        freed here (except the last span's, which the output-table re-fill
        path may need again); the span buffer is freed when its last row
        is popped."""
        r0 = i * self.stride
        nr = min(self.stride, MIMC_ROUNDS - r0)
        span = _witness_span(self.block, self._ckpt[i], r0, nr)
        self._spans[i] = span
        self._live[i] = nr
        for r in range(nr):
            self._cache[3 + r0 + r] = (i, r)
        if i == self.n_spans - 1:
            # pin the output table (the verifier consumes it after the
            # walk; every other row is consumed exactly once)
            self._cache[3 + r0 + nr - 1] = span[nr - 1]
            self._live[i] -= 1
        else:
            self._ckpt[i] = None

    def _take(self, i: int, r: int):
        row = self._spans[i][r]
        self._live[i] -= 1
        if self._live[i] <= 0:
            self._spans[i] = None
        return row

    def __len__(self):
        return MIMC_ROUNDS + 3

    def __getitem__(self, j: int):
        if j in (0, 2):
            return self.block
        if j == 1:
            return self.state
        if j == len(self) - 1:
            # output table: kept (the verifier needs it; the walk doesn't)
            if j not in self._cache:
                self._fill_span(self.n_spans - 1)
            return self._cache[j]
        t = self._cache.pop(j, None)
        if t is None:
            self._fill_span((j - 3) // self.stride)
            t = self._cache.pop(j)
        if isinstance(t, tuple):
            t = self._take(*t)
        return t
