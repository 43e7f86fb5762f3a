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
    """Montgomery tensor with limb axis LAST (..., 16) -> nested int lists."""
    a = np.asarray(jax.device_get(arr))

    def rec(x):
        if x.ndim == 1:
            return limbs_to_int(x) * RINV % P
        return [rec(v) for v in x]

    return rec(a)


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
