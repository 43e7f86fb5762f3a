"""Native C++ runtime (native/bn254.cpp) vs pure-Python equivalence oracles.

Mirrors the reference's oracle pattern (SURVEY.md §4): the hand-rolled
fast path must agree with an independent slow implementation on sweeps
that cross every internal boundary (window edges, infinity, zero scalars,
keccak block boundaries).
"""

import random

import pytest

from gkr_mimc_tpu import native
from gkr_mimc_tpu.gadget import bn254_g1 as g1
from gkr_mimc_tpu.gadget.keccak import _keccak256_py
from gkr_mimc_tpu.gadget.setup import dummy_setup

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _py_msm(points, scalars):
    acc = g1.INF
    for p, s in zip(points, scalars):
        acc = g1.add(acc, g1.scalar_mul(p, s))
    return acc


def _aff(p):
    return g1.to_affine(p)


def test_msm_matches_python():
    rng = random.Random(1234)
    gen = g1.to_jac(g1.GEN)
    for n in [1, 2, 3, 17, 64, 130]:
        pts = [g1.scalar_mul(gen, rng.randrange(1, g1.R)) for _ in range(n)]
        scs = [rng.randrange(g1.R) for _ in range(n)]
        assert _aff(native.msm(pts, scs)) == _aff(_py_msm(pts, scs)), n


def test_msm_edge_cases():
    gen = g1.to_jac(g1.GEN)
    assert _aff(native.msm([], [])) is None
    assert _aff(native.msm([gen], [0])) is None
    assert _aff(native.msm([g1.INF] * 3, [1, 2, 3])) is None
    # scalars reduced mod r
    assert _aff(native.msm([gen], [g1.R + 5])) == _aff(g1.scalar_mul(gen, 5))
    # near-modulus scalar exercises the top window
    s = g1.R - 1
    assert _aff(native.msm([gen], [s])) == _aff(g1.scalar_mul(gen, s))


def test_batch_scalar_mul_matches_python():
    rng = random.Random(99)
    gen = g1.to_jac(g1.GEN)
    scs = [0, 1, 2, g1.R - 1, rng.randrange(g1.R), 1 << 255]
    got = native.batch_scalar_mul(gen, scs)
    for s, p in zip(scs, got):
        assert _aff(p) == _aff(g1.scalar_mul(gen, s)), s


def test_keccak_matches_python():
    rng = random.Random(5)
    for n in [0, 1, 31, 32, 64, 135, 136, 137, 272, 300]:
        data = bytes(rng.randrange(256) for _ in range(n))
        assert native.keccak256(data) == _keccak256_py(data), n


def test_keccak_known_answer():
    # Ethereum empty-string Keccak-256
    assert (
        native.keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_dummy_setup_native_matches_fallback(monkeypatch):
    fast = dummy_setup(3, 5, b"native-parity")
    monkeypatch.setenv("GKR_NATIVE_DISABLE", "1")
    monkeypatch.setattr(native, "_TRIED", False)
    monkeypatch.setattr(native, "_LIB", None)
    # monkeypatch restores _TRIED/_LIB to the live library at teardown
    slow = dummy_setup(3, 5, b"native-parity")
    assert [_aff(p) for p in fast.pub_k_gkr] == [_aff(p) for p in slow.pub_k_gkr]
    assert [_aff(p) for p in fast.priv_k_gkr_sigma] == [
        _aff(p) for p in slow.priv_k_gkr_sigma
    ]
    assert fast.sigma == slow.sigma
