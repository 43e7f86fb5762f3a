"""Runtime utilities (the analog of the reference's common/ package).

The reference's goroutine worker pool / TryDispatch machinery
(common/parallelize.go) has no TPU analog — XLA fuses and parallelizes the
vectorized kernels — so this module only keeps the *semantic* utilities:
deterministic test-vector generation, Fiat-Shamir challenges, math helpers.
"""

from __future__ import annotations

import numpy as np

from ..fields.bn254 import P
from ..hashes.mimc import mimc_hash


def log2_floor(x: int) -> int:
    """common/math.go:Log2Floor semantics."""
    res = 0
    while (1 << (res + 1)) <= x:
        res += 1
    return res


def log2_ceil(x: int) -> int:
    """common/math.go:Log2Ceil semantics."""
    f = log2_floor(x)
    return f + (0 if x == (1 << f) else 1)


def get_challenge(seed: list[int]) -> int:
    """Fiat-Shamir challenge = MimcHash(seed) (common/challenge.go:10-12)."""
    return mimc_hash(seed)


_RAND_XOR = 0xF45C9DF123F
_U64 = 1 << 64


def random_fr_array(size: int) -> list[int]:
    """Deterministic pseudo-random field elements, bit-exact with the
    reference's test-vector generator (common/common.go:49-55):
    res[i] = SetUint64(uint64(i*i) ^ 0xf45c9df123f)."""
    return [(((i * i) % _U64) ^ _RAND_XOR) % P for i in range(size)]


def random_fr_array_np(size: int, offset: int = 0) -> np.ndarray:
    """Same values as random_fr_array but as a numpy uint64 vector (all
    values < 2**64 and < p, so no reduction is needed). `offset` shifts the
    index stream (res[k] = gen(offset + k)) so a 2^T batch proven as
    sequential chunks consumes one contiguous deterministic stream."""
    i = np.arange(offset, offset + size, dtype=np.uint64)
    return (i * i) ^ np.uint64(_RAND_XOR)
