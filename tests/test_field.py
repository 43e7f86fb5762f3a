"""Field-core tests: the JAX limb arithmetic against the Python-int oracle.

Mirrors the reference's equivalence-oracle pattern (SURVEY.md §4): every
kernel is checked against an independent scalar implementation on random
and adversarial inputs.
"""

import random

import jax
import jax.numpy as jnp
import pytest

from gkr_mimc_tpu.fields import fr, scalar
from gkr_mimc_tpu.fields.bn254 import P

random.seed(1234)

XS = [random.randrange(P) for _ in range(128)]
YS = [random.randrange(P) for _ in range(128)]
EDGE = [0, 1, 2, P - 1, P - 2, (P + 1) // 2, 2**255 % P, (1 << 256) % P, 0xFFFF, 1 << 16]


@pytest.fixture(scope="module")
def ab():
    return fr.from_ints_mont(XS), fr.from_ints_mont(YS)


def test_roundtrip(ab):
    a, _ = ab
    assert fr.to_ints(a) == XS


def test_add(ab):
    a, b = ab
    assert fr.to_ints(jax.jit(fr.add)(a, b)) == [scalar.add(x, y) for x, y in zip(XS, YS)]


def test_sub(ab):
    a, b = ab
    assert fr.to_ints(jax.jit(fr.sub)(a, b)) == [scalar.sub(x, y) for x, y in zip(XS, YS)]


def test_mul(ab):
    a, b = ab
    assert fr.to_ints(jax.jit(fr.mul)(a, b)) == [scalar.mul(x, y) for x, y in zip(XS, YS)]


def test_pow7(ab):
    a, _ = ab
    assert fr.to_ints(jax.jit(fr.pow7)(a)) == [pow(x, 7, P) for x in XS]


def test_edge_cases():
    ea = fr.from_ints_mont(EDGE)
    eb = fr.from_ints_mont(list(reversed(EDGE)))
    assert fr.to_ints(jax.jit(fr.mul)(ea, eb)) == [
        x * y % P for x, y in zip(EDGE, reversed(EDGE))
    ]
    assert fr.to_ints(jax.jit(fr.add)(ea, ea)) == [2 * x % P for x in EDGE]
    assert fr.to_ints(jax.jit(fr.sub)(fr.zeros((len(EDGE),)), ea)) == [
        (-x) % P for x in EDGE
    ]


def test_reduce_sum_small(ab):
    a, _ = ab
    rs = jax.jit(lambda t: fr.reduce_sum(t, 0))
    assert fr.to_ints(rs(a))[0] == sum(XS) % P


def test_reduce_sum_large_and_stress():
    rs = jax.jit(lambda t: fr.reduce_sum(t, 0))
    vals = [(i * i * 7919) % P for i in range(4096)]
    assert fr.to_ints(rs(fr.from_ints_mont(vals)))[0] == sum(vals) % P
    # worst-case limbs: all p-1
    stress = fr.from_ints_mont([P - 1] * 4096)
    assert fr.to_ints(rs(stress))[0] == (4096 * (P - 1)) % P


def test_to_mont_device():
    std = jnp.asarray(fr.encode_ints(XS))
    assert fr.to_ints(jax.jit(fr.to_mont)(std)) == XS


def test_mul_chain(ab):
    a, _ = ab
    chain = jax.jit(lambda t: fr.mul(fr.pow7(t), t))
    assert fr.to_ints(chain(a)) == [pow(x, 7, P) * x % P for x in XS]


def test_broadcast_scalar_times_vector(ab):
    a, _ = ab
    r = fr.from_int_mont(XS[0])[:, None]
    got = fr.to_ints(jax.jit(fr.mul)(r, a))
    assert got == [XS[0] * x % P for x in XS]
