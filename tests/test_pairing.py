"""G2, extension towers, optimal-ate pairing, and the native G2/FFT runtime.

The capability layer behind the reference's 4-term pairing check
(prover/gadget/verify.go:60-70) and sigma-marked setup (setup.go:84-153).
Python implementations are the oracles; the native C++ paths must agree
exactly.
"""

import random

import pytest

from gkr_mimc_tpu import native
from gkr_mimc_tpu.gadget import bn254_g1 as g1
from gkr_mimc_tpu.gadget import bn254_g2 as g2
from gkr_mimc_tpu.gadget import pairing as pr
from gkr_mimc_tpu.gadget.tower import (
    FP12_ONE,
    fp12_inv,
    fp12_mul,
    fp12_pow,
    fp2_inv,
    fp2_mul,
)


def test_fp2_field():
    random.seed(0)
    for _ in range(5):
        a = (random.randrange(g2.P), random.randrange(g2.P))
        assert fp2_mul(a, fp2_inv(a)) == (1, 0)


def test_fp12_field():
    random.seed(1)
    a = tuple(random.randrange(g2.P) for _ in range(12))
    assert fp12_mul(a, fp12_inv(a)) == FP12_ONE


def test_g2_group():
    gen = g2.to_jac(g2.GEN)
    assert g2.on_curve(gen)
    assert g2.is_inf(g2.scalar_mul(gen, g2.R))
    # commutativity + doubling consistency
    p5 = g2.scalar_mul(gen, 5)
    assert g2.to_affine(g2.add(p5, gen)) == g2.to_affine(
        g2.scalar_mul(gen, 6)
    )
    assert g2.to_affine(g2.double(p5)) == g2.to_affine(g2.scalar_mul(gen, 10))
    assert g2.on_curve(p5)


def test_pairing_bilinearity():
    p = g1.to_jac(g1.GEN)
    q = g2.to_jac(g2.GEN)
    e = pr.pairing(p, q)
    assert e != FP12_ONE
    # e^r == 1 (target group has order r)
    assert fp12_pow(e, g2.R) == FP12_ONE
    a, b = 6, 11
    assert pr.pairing(g1.scalar_mul(p, a), g2.scalar_mul(q, b)) == pr.pairing(
        p, g2.scalar_mul(q, a * b)
    )
    assert pr.pairing(g1.scalar_mul(p, a), q) == fp12_pow(e, a)


def test_pairing_check_multi():
    p = g1.to_jac(g1.GEN)
    q = g2.to_jac(g2.GEN)
    a = 9
    # e(aP, Q) * e(-P, aQ) == 1
    assert pr.pairing_check(
        [(g1.scalar_mul(p, a), q), (g1.neg(p), g2.scalar_mul(q, a))]
    )
    assert not pr.pairing_check(
        [(g1.scalar_mul(p, a), q), (g1.neg(p), g2.scalar_mul(q, a + 1))]
    )


@pytest.mark.skipif(not native.available(), reason="native runtime unavailable")
def test_native_g2_vs_oracle():
    gen = g2.to_jac(g2.GEN)
    scalars = [1, 2, 3, g2.R - 1, 2**163 + 12345]
    got = native.batch_scalar_mul_g2(gen, scalars)
    want = [g2.scalar_mul(gen, s) for s in scalars]
    assert [g2.to_affine(x) for x in got] == [g2.to_affine(x) for x in want]

    msm_got = native.msm_g2(want, [5, 6, 7, 8, 9])
    acc = g2.INF
    for pt, s in zip(want, [5, 6, 7, 8, 9]):
        acc = g2.add(acc, g2.scalar_mul(pt, s))
    assert g2.to_affine(msm_got) == g2.to_affine(acc)


@pytest.mark.skipif(not native.available(), reason="native runtime unavailable")
def test_native_compute_h_vs_python():
    from gkr_mimc_tpu.gadget import groth16 as G

    random.seed(3)
    n, d = 6, 8
    a = [random.randrange(g2.R) for _ in range(n)]
    b = [random.randrange(g2.R) for _ in range(n)]
    c = [x * y % g2.R for x, y in zip(a, b)]
    native_h = native.compute_h(a, b, c, d)
    # force the Python NTT fallback
    import gkr_mimc_tpu.native as nat

    orig = nat.compute_h
    nat.compute_h = lambda *args: None
    try:
        py_h = G.compute_h(a, b, c, d)
    finally:
        nat.compute_h = orig
    assert native_h == py_h


def test_compute_h_quotient_property():
    """(A*B - C) must equal h * (X^d - 1) as polynomials."""
    from gkr_mimc_tpu.gadget import groth16 as G

    R = g2.R
    random.seed(4)
    n, d = 5, 8
    a = [random.randrange(R) for _ in range(n)]
    b = [random.randrange(R) for _ in range(n)]
    c = [x * y % R for x, y in zip(a, b)]
    h = G.compute_h(a, b, c, d)
    # interpolate A, B, C over the omega-domain (slow Lagrange oracle)
    omega = pow(5, (R - 1) // d, R)
    dinv = pow(d, R - 2, R)

    def interp(vals):
        vals = vals + [0] * (d - len(vals))
        return [
            dinv
            * sum(
                vals[i] * pow(omega, (-i * j) % d, R) % R for i in range(d)
            )
            % R
            for j in range(d)
        ]

    A, B, C = interp(a), interp(b), interp(c)

    def polymul(x, y):
        out = [0] * (len(x) + len(y) - 1)
        for i, xi in enumerate(x):
            for j, yj in enumerate(y):
                out[i + j] = (out[i + j] + xi * yj) % R
        return out

    lhs = polymul(A, B)
    for i in range(d):
        lhs[i] = (lhs[i] - C[i]) % R
    # h * (X^d - 1)
    rhs = [0] * (len(h) + d)
    for i, hi in enumerate(h):
        rhs[i + d] = (rhs[i + d] + hi) % R
        rhs[i] = (rhs[i] - hi) % R
    lhs += [0] * (len(rhs) - len(lhs))
    assert lhs == rhs[: len(lhs)]
    assert all(x == 0 for x in rhs[len(lhs):])
