"""Univariate helpers: Lagrange coefficient matrices + Horner evaluation.

Parity with the reference poly/lagrange.go:15-111 (domains [0..n-1], cap 12)
— the matrices are exact field constants, precomputed host-side with Python
ints and cached; the device interpolation is a tiny batched mul/sum.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..fields import scalar
from ..fields.bn254 import L, P, R1, int_to_limbs

MAX_DOMAIN_SIZE = 12


def eval_univariate(coeffs: list[int], x: int) -> int:
    """Horner evaluation from the highest coefficient (poly/lagrange.go:31-39)."""
    res = coeffs[-1]
    for c in reversed(coeffs[:-1]):
        res = scalar.add(scalar.mul(res, x), c)
    return res


@lru_cache(maxsize=None)
def lagrange_coefficients(domain_size: int) -> tuple[tuple[int, ...], ...]:
    """Matrix [l][j]: coefficient j of the l-th Lagrange basis poly on
    the domain {0, ..., domain_size-1} (poly/lagrange.go:42-92)."""
    assert domain_size <= MAX_DOMAIN_SIZE + 1
    result = []
    for l in range(domain_size):
        acc = [0] * domain_size
        acc[0] = 1
        for i in range(domain_size):
            if i == l:
                continue
            # multiply accumulator by (X - i)
            upd = [0] * domain_size
            for j in range(domain_size):
                upd[j] = scalar.add(upd[j], scalar.mul(acc[j], scalar.neg(i % P)))
                if j + 1 < domain_size:
                    upd[j + 1] = scalar.add(upd[j + 1], acc[j])
            acc = upd
        norm = scalar.inverse(eval_univariate(acc, l))
        result.append(tuple(scalar.mul(c, norm) for c in acc))
    return tuple(result)


def interpolate_on_range(values: list[int]) -> list[int]:
    """Host oracle: evals at 0..k-1 -> coefficients (poly/lagrange.go:96-111)."""
    k = len(values)
    lag = lagrange_coefficients(k)
    out = [0] * k
    for i, v in enumerate(values):
        for j in range(k):
            out[j] = scalar.add(out[j], scalar.mul(lag[i][j], v))
    return out


@lru_cache(maxsize=None)
def lagrange_tensor_np(domain_size: int) -> np.ndarray:
    """Montgomery-form Lagrange matrix as a (16, K, K) numpy constant with
    axes (limb, eval-point i, coefficient j). Cached as numpy (NOT a device
    array) so reuse inside different jit traces is safe."""
    lag = lagrange_coefficients(domain_size)
    out = np.empty((L, domain_size, domain_size), dtype=np.uint32)
    for i in range(domain_size):
        for j in range(domain_size):
            out[:, i, j] = int_to_limbs(lag[i][j] * R1 % P)
    return out


def interpolate_on_range_device(values):
    """Device: values (16, K[, *B]) evals at 0..K-1 -> (16, K[, *B])
    coefficients (trailing batch axes, e.g. the grouped prover's G, ride
    along)."""
    from ..fields import fr

    k = values.shape[1]
    batch = values.shape[2:]
    lag = jnp.asarray(lagrange_tensor_np(k)).reshape(
        (L, k, k) + (1,) * len(batch)
    )
    v = jnp.expand_dims(values, 2)  # (16, K, 1, *B)
    prods = fr.mul(v, lag)  # (16, K, K, *B)
    return fr.reduce_sum(prods, 0)  # sum over eval-point axis -> (16, K, *B)


def eval_univariate_device(coeffs, x):
    """Device Horner: coeffs (16, K), x (16,) -> (16,)."""
    from ..fields import fr

    res = coeffs[:, -1]
    for j in range(coeffs.shape[1] - 2, -1, -1):
        res = fr.add(fr.mul(res, x), coeffs[:, j])
    return res
