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


def random_fr_device(size: int, offset: int = 0):
    """The same deterministic generator computed ON DEVICE: (16, size)
    standard-form limb tensor, bit-exact with
    encode_uint64_array(random_fr_array_np(size, offset)) but with zero
    host->device transfer (the 2^22 north-star bench uploads 128MB/chunk
    otherwise). uint64 math in 16-bit limb columns: i = h*2^16 + l,
    i^2 mod 2^64 = [l*l; 2*h*l << 16; h*h << 32] carried, then the XOR
    constant applied per exact limb. Requires offset + size <= 2^32."""
    import jax.numpy as jnp

    from ..fields import fr

    if isinstance(offset, int):
        assert offset + size <= (1 << 32)
    i = jnp.arange(size, dtype=jnp.uint32) + jnp.uint32(offset)
    h = i >> 16
    l = i & jnp.uint32(0xFFFF)
    p0 = l * l
    pm = h * l
    p2 = h * h
    c0 = p0 & jnp.uint32(0xFFFF)
    c1 = (p0 >> 16) + ((pm & jnp.uint32(0xFFFF)) << 1)
    c2 = ((pm >> 16) << 1) + (p2 & jnp.uint32(0xFFFF))
    c3 = p2 >> 16
    # carry propagation (c1 < 2^17+2^16, c2 likewise); c3 drops mod 2^64
    c2 = c2 + (c1 >> 16)
    c1 = c1 & jnp.uint32(0xFFFF)
    c3 = (c3 + (c2 >> 16)) & jnp.uint32(0xFFFF)
    c2 = c2 & jnp.uint32(0xFFFF)
    xor = _RAND_XOR
    c0 = c0 ^ jnp.uint32(xor & 0xFFFF)
    c1 = c1 ^ jnp.uint32((xor >> 16) & 0xFFFF)
    c2 = c2 ^ jnp.uint32((xor >> 32) & 0xFFFF)
    c3 = c3 ^ jnp.uint32((xor >> 48) & 0xFFFF)
    zeros = jnp.zeros((fr.L - 4, size), dtype=jnp.uint32)
    return jnp.concatenate([jnp.stack([c0, c1, c2, c3], axis=0), zeros], axis=0)
