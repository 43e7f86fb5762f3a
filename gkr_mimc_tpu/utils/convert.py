"""Conversions between device Montgomery limb tensors and host ints.

Convention: big hypercube *tables* are limb-major (16, ..., N); small proof
artifacts (round coefficients, challenges, claims, qPrimes) are row-major
with the limb axis LAST, which serializes naturally.

All conversions are pure host work (numpy + Python ints): they never
dispatch device computation.
"""

from __future__ import annotations

import numpy as np
import jax

from ..fields import fr
from ..fields.bn254 import P, RINV, limbs_to_int


def rows_to_ints(arr):
    """Montgomery tensor with limb axis LAST (..., 16) -> nested int lists.

    Fast path: every representative (canonical or lazy) keeps limbs
    < 2**16, so the whole tensor packs to little-endian uint16 bytes and
    each element is ONE int.from_bytes + mulmod — ~5x faster than per-limb
    assembly (this sits on the verifier's host hot path)."""
    a = np.asarray(jax.device_get(arr))
    if a.size == 0:
        return _empty_nested(a.shape)
    assert a.shape[-1] == fr.L
    flat = a.reshape(-1, fr.L)
    if (flat < (1 << 16)).all():
        raw = np.ascontiguousarray(flat.astype("<u2")).tobytes()
        ints = [
            int.from_bytes(raw[i * 32 : (i + 1) * 32], "little") * RINV % P
            for i in range(flat.shape[0])
        ]
        return _nest(ints, a.shape[:-1])

    def rec(x):
        if x.ndim == 1:
            return limbs_to_int(x) * RINV % P
        return [rec(v) for v in x]

    return rec(a)


def _empty_nested(shape):
    if len(shape) <= 1:
        return []
    return [_empty_nested(shape[1:]) for _ in range(shape[0])]


def _nest(flat_list, shape):
    """Rebuild the nested-list structure of `shape` from a flat list."""
    if not shape:
        return flat_list[0]
    step = len(flat_list) // shape[0] if shape[0] else 0
    return [
        _nest(flat_list[i * step : (i + 1) * step], shape[1:])
        for i in range(shape[0])
    ]


def ints_to_rows(values) -> np.ndarray:
    """Nested int lists -> Montgomery numpy tensor with limb axis last."""

    def shape_of(v):
        if isinstance(v, int):
            return ()
        if len(v) == 0:
            return (0,)
        return (len(v),) + shape_of(v[0])

    shp = shape_of(values)
    out = np.empty(shp + (fr.L,), dtype=np.uint32)

    def fill(dst, v):
        if dst.ndim == 1:
            dst[:] = fr.encode_mont_int(v)
            return
        for d, x in zip(dst, v):
            fill(d, x)

    fill(out, values)
    return out
