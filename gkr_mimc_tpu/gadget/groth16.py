"""Groth16 over BN254 with the GKR gadget's split-K modification.

The host-side SNARK layer the reference builds from its gnark fork
(prover/gadget/{setup,prove,verify,solution}.go). Capability map:

  * `setup`   — the Groth16 CRS from explicit toxic scalars, plus the
                gadget's K-split: {pubKGkr, privKGkrSigma (sigma-marked),
                privKNotGkr} and deltaSigmaInvNeg (setup.go:84-153). A
                seed-derived deterministic setup doubles as DummySetup
                (setup.go:64-82).
  * `prove`   — computeH (FFT quotient, prove.go:310-359, via the native
                C++ NTT with a Python fallback) + the Groth16 MSMs with
                the K multiexp split out (prove.go:100-308): the GKR part
                comes precomputed from the commitment step, the
                privKNotGkr part is added here (prove.go:45-98).
  * `verify`  — rho re-derivation from the io commitment and the 4-term
                pairing check  e(KrsPub, -gamma) e(Krs, -delta)
                e(KrsGkrPriv, -delta/sigma) e(Ar, Bs) == e(alpha, beta)
                (verify.go:15-75).

MSM-heavy steps ride the native C++ runtime (G1/G2 Pippenger + fixed-base
batch); pairings run once per verification in pure Python (gadget/pairing).
"""

from __future__ import annotations

from dataclasses import dataclass

from .. import native
from ..snark.r1cs import CompiledR1CS
from . import bn254_g1 as g1
from . import bn254_g2 as g2
from . import pairing as pr
from .keccak import keccak256

R = g1.R


# ---------------------------------------------------------------------------
# Keys
# ---------------------------------------------------------------------------


@dataclass
class Groth16ProvingKey:
    alpha1: tuple
    beta1: tuple
    delta1: tuple
    beta2: tuple
    delta2: tuple
    a_query: list  # [u_i(tau)]1 per wire
    b1_query: list  # [v_i(tau)]1 per wire
    b2_query: list  # [v_i(tau)]2 per wire
    z_query: list  # [tau^j * t(tau) / delta]1, j < d-1
    # gadget K-split (setup.go:118-131)
    priv_k_not_gkr: list
    priv_k_gkr_sigma: list
    priv_not_gkr_wires: list  # canonical wire ids aligned with priv_k_not_gkr
    priv_gkr_wires: list


@dataclass
class Groth16VerifyingKey:
    alpha1: tuple
    beta2: tuple
    gamma2: tuple
    delta2: tuple
    k_pub: list  # [(beta u + alpha v + w)/gamma]1 per public wire (incl wire 0)
    delta_sigma_inv_neg: tuple  # sigma^-1 * (-delta) in G2 (setup.go:148-152)
    pub_k_gkr: list
    pub_gkr_wires: list
    pub_not_gkr_wires: list  # excludes wire 0


@dataclass
class GadgetGroth16Proof:
    """prove.go:18-24: Groth16 proof + the GKR commitment extras."""

    ar: tuple
    bs: tuple  # G2
    krs: tuple
    krs_gkr_priv: tuple
    initial_randomness: int


# ---------------------------------------------------------------------------
# Setup
# ---------------------------------------------------------------------------


def _toxic(seed: bytes, tag: bytes) -> int:
    v = int.from_bytes(keccak256(seed + b":" + tag), "big") % R
    return v or 1


def _fresh_seed() -> bytes:
    """Real randomness for setup toxic waste / proof blinding (the
    reference's SetRandom, prove.go:161-167 and setup.go:20-44). Tests
    inject explicit seeds instead (the DummySetup flavor, setup.go:64-82)."""
    import os

    return os.urandom(32)


def _batch_inv(xs: list[int]) -> list[int]:
    """Montgomery batch inversion: one modexp for n inverses."""
    n = len(xs)
    pref = [1] * (n + 1)
    for i, x in enumerate(xs):
        pref[i + 1] = pref[i] * x % R
    inv_all = pow(pref[n], R - 2, R)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = pref[i] * inv_all % R
        inv_all = inv_all * xs[i] % R
    return out


def _g1_batch(scalars: list[int]) -> list:
    gen = g1.to_jac(g1.GEN)
    res = native.batch_scalar_mul(gen, scalars)
    if res is None:
        res = [g1.scalar_mul(gen, s) for s in scalars]
    return res


def _g2_batch(scalars: list[int]) -> list:
    gen = g2.to_jac(g2.GEN)
    res = native.batch_scalar_mul_g2(gen, scalars)
    if res is None:
        res = [g2.scalar_mul(gen, s) for s in scalars]
    return res


def _domain_size(n: int) -> int:
    d = 1
    while d < max(n, 2):
        d *= 2
    return d


def setup(r1cs: CompiledR1CS, gkr_partition, seed: bytes | None = None):
    """CRS generation from toxic waste (alpha, beta, gamma, delta, tau,
    sigma). With seed=None (the default) the waste comes from os.urandom —
    the real Setup (setup.go:20-44); passing an explicit seed gives the
    deterministic DummySetup flavor (setup.go:64-82) for tests.
    `gkr_partition` carries the wire split computed at compile
    time (cs.go:39-91 analog; see gadget/incircuit.py)."""
    if seed is None:
        seed = _fresh_seed()
    alpha = _toxic(seed, b"alpha")
    beta = _toxic(seed, b"beta")
    gamma = _toxic(seed, b"gamma")
    delta = _toxic(seed, b"delta")
    tau = _toxic(seed, b"tau")
    sigma = _toxic(seed, b"sigma")

    ncons = len(r1cs.constraints)
    d = _domain_size(ncons)
    omega = pow(5, (R - 1) // d, R)

    # L_c(tau) over the omega-domain via one batched inversion
    zt = (pow(tau, d, R) - 1) % R
    omega_pows = [1] * ncons
    for c in range(1, ncons):
        omega_pows[c] = omega_pows[c - 1] * omega % R
    denoms = [d * (tau - w) % R for w in omega_pows]
    dinvs = _batch_inv(denoms)
    lag = [zt * w % R * iv % R for w, iv in zip(omega_pows, dinvs)]

    # per-wire u_i(tau), v_i(tau), w_i(tau)
    nw = r1cs.n_wires
    u = [0] * nw
    v = [0] * nw
    w = [0] * nw
    for c, (A, B, C) in enumerate(r1cs.constraints):
        lc_tau = lag[c]
        for wire, coeff in A:
            u[wire] = (u[wire] + coeff * lc_tau) % R
        for wire, coeff in B:
            v[wire] = (v[wire] + coeff * lc_tau) % R
        for wire, coeff in C:
            w[wire] = (w[wire] + coeff * lc_tau) % R

    ginv = pow(gamma, R - 2, R)
    dinv = pow(delta, R - 2, R)
    k_all = [(beta * u[i] + alpha * v[i] + w[i]) % R for i in range(nw)]
    n_pub = r1cs.n_public + 1  # wire 0 included
    k_pub_scalars = [k_all[i] * ginv % R for i in range(n_pub)]
    k_priv_scalars = [k_all[i] * dinv % R for i in range(n_pub, nw)]

    # Z query scalars: tau^j * t(tau) / delta
    z_scalars = []
    acc = zt * dinv % R
    for _ in range(d - 1):
        z_scalars.append(acc)
        acc = acc * tau % R

    # the fixed-base batches are independent — overlap them on threads
    # (the native calls drop the GIL; Parallelize analog, setup.go:140)
    pub_gkr, priv_gkr, pub_not_gkr, priv_not_gkr = gkr_partition
    sigma_scaled = [k_priv_scalars[wid - n_pub] * sigma % R for wid in priv_gkr]
    not_gkr_scaled = [k_priv_scalars[wid - n_pub] for wid in priv_not_gkr]
    import concurrent.futures as _cf

    with _cf.ThreadPoolExecutor(max_workers=4) as ex:
        f_a = ex.submit(_g1_batch, u)
        f_b1 = ex.submit(_g1_batch, v)
        f_b2 = ex.submit(_g2_batch, v)
        f_kp = ex.submit(_g1_batch, k_pub_scalars)
        f_z = ex.submit(_g1_batch, z_scalars)
        f_sig = ex.submit(_g1_batch, sigma_scaled)
        f_ng = ex.submit(_g1_batch, not_gkr_scaled)
        a_query = f_a.result()
        b1_query = f_b1.result()
        b2_query = f_b2.result()
        k_pub_pts = f_kp.result()
        z_query = f_z.result()
        priv_k_gkr_sigma = f_sig.result()
        priv_k_not_gkr = f_ng.result()
    pub_k_gkr = [k_pub_pts[wid] for wid in pub_gkr]

    gen2 = g2.to_jac(g2.GEN)
    delta2 = g2.scalar_mul(gen2, delta)
    sigma_inv = pow(sigma, R - 2, R)
    delta_sigma_inv_neg = g2.scalar_mul(g2.neg(delta2), sigma_inv)

    pk = Groth16ProvingKey(
        alpha1=g1.scalar_mul(g1.to_jac(g1.GEN), alpha),
        beta1=g1.scalar_mul(g1.to_jac(g1.GEN), beta),
        delta1=g1.scalar_mul(g1.to_jac(g1.GEN), delta),
        beta2=g2.scalar_mul(gen2, beta),
        delta2=delta2,
        a_query=a_query,
        b1_query=b1_query,
        b2_query=b2_query,
        z_query=z_query,
        priv_k_not_gkr=priv_k_not_gkr,
        priv_k_gkr_sigma=priv_k_gkr_sigma,
        priv_not_gkr_wires=list(priv_not_gkr),
        priv_gkr_wires=list(priv_gkr),
    )
    vk = Groth16VerifyingKey(
        alpha1=pk.alpha1,
        beta2=pk.beta2,
        gamma2=g2.scalar_mul(gen2, gamma),
        delta2=delta2,
        k_pub=k_pub_pts,
        delta_sigma_inv_neg=delta_sigma_inv_neg,
        pub_k_gkr=pub_k_gkr,
        pub_gkr_wires=list(pub_gkr),
        pub_not_gkr_wires=list(pub_not_gkr),
    )
    return pk, vk


# ---------------------------------------------------------------------------
# computeH (FFT quotient) — native with Python-NTT fallback
# ---------------------------------------------------------------------------


def _ntt(vals: list[int], omega: int) -> list[int]:
    n = len(vals)
    a = list(vals)
    # bit reversal
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j ^= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    length = 2
    while length <= n:
        wlen = pow(omega, n // length, R)
        for i in range(0, n, length):
            wcur = 1
            for k in range(length // 2):
                x = a[i + k]
                y = a[i + k + length // 2] * wcur % R
                a[i + k] = (x + y) % R
                a[i + k + length // 2] = (x - y) % R
                wcur = wcur * wlen % R
        length *= 2
    return a


def compute_h(a: list[int], b: list[int], c: list[int], d: int) -> list[int]:
    """h(X) = (A(X)B(X) - C(X))/(X^d - 1) coefficients (prove.go computeH
    semantics, our own coset g=5)."""
    res = native.compute_h(a, b, c, d)
    if res is not None:
        return res
    omega = pow(5, (R - 1) // d, R)
    omega_inv = pow(omega, R - 2, R)
    d_inv = pow(d, R - 2, R)
    g = 5
    g_inv = pow(g, R - 2, R)

    def intt(v):
        out = _ntt(v, omega_inv)
        return [x * d_inv % R for x in out]

    def coset(v, gg):
        acc = 1
        out = []
        for x in v:
            out.append(x * acc % R)
            acc = acc * gg % R
        return out

    A = _ntt(coset(intt(a + [0] * (d - len(a))), g), omega)
    B = _ntt(coset(intt(b + [0] * (d - len(b))), g), omega)
    C = _ntt(coset(intt(c + [0] * (d - len(c))), g), omega)
    zinv = pow((pow(g, d, R) - 1) % R, R - 2, R)
    H = [(x * y - z) % R * zinv % R for x, y, z in zip(A, B, C)]
    return coset(intt(H), g_inv)


# ---------------------------------------------------------------------------
# Prove
# ---------------------------------------------------------------------------


def _msm(points, scalars):
    if not points:
        return g1.INF
    r = native.msm(points, scalars)
    if r is None:
        r = _py_msm_g1(points, scalars)
    return r


def _py_msm_g1(points, scalars):
    acc = g1.INF
    for p, s in zip(points, scalars):
        if s:
            acc = g1.add(acc, g1.scalar_mul(p, s))
    return acc


def _msm_g2(points, scalars):
    if not points:
        return g2.INF
    r = native.msm_g2(points, scalars)
    if r is None:
        acc = g2.INF
        for p, s in zip(points, scalars):
            if s:
                acc = g2.add(acc, g2.scalar_mul(p, s))
        return acc
    return r


def prove(
    r1cs: CompiledR1CS,
    pk: Groth16ProvingKey,
    krs_gkr_priv: tuple,
    initial_randomness: int,
    seed: bytes | None = None,
) -> GadgetGroth16Proof:
    """ComputeProof (prove.go:45-98) + ComputeGroth16Proof (prove.go:100-308)
    with the K multiexp split: the sigma-marked GKR commitment comes in as
    `krs_gkr_priv` (computed by the commitment step, hints.go:162-192), the
    privKNotGkr part is added here, and the plain-Groth16 Krs term carries
    only Z/H + the r/s blinding."""
    z = r1cs.wires
    a_vals = [x[0] for x in r1cs.abc]
    b_vals = [x[1] for x in r1cs.abc]
    c_vals = [x[2] for x in r1cs.abc]

    d = _domain_size(len(r1cs.constraints))

    # blinding: fresh randomness per proof by default (the reference's
    # SetRandom, prove.go:161-167) — deterministic blinding would make
    # every proof non-hiding and repeat proofs identical. Tests may inject
    # a seed for reproducibility.
    if seed is None:
        seed = _fresh_seed()
    r_blind = _toxic(seed, b"r")
    s_blind = _toxic(seed, b"s")

    # computeH and the three big multiexps are independent — run them
    # concurrently (the native calls drop the GIL), the analog of the
    # reference's goroutine-per-MSM overlap (prove.go:124-303)
    import concurrent.futures as _cf

    with _cf.ThreadPoolExecutor(max_workers=4) as ex:
        f_h = ex.submit(compute_h, a_vals, b_vals, c_vals, d)
        f_a = ex.submit(_msm, pk.a_query, z)
        f_b1 = ex.submit(_msm, pk.b1_query, z)
        f_b2 = ex.submit(_msm_g2, pk.b2_query, z)
        h = f_h.result()
        f_krs = ex.submit(_msm, pk.z_query, h[: d - 1])
        ar_j = g1.add(
            g1.add(pk.alpha1, f_a.result()),
            g1.scalar_mul(pk.delta1, r_blind),
        )
        bs1_j = g1.add(
            g1.add(pk.beta1, f_b1.result()),
            g1.scalar_mul(pk.delta1, s_blind),
        )
        bs2_j = g2.add(
            g2.add(pk.beta2, f_b2.result()),
            g2.scalar_mul(pk.delta2, s_blind),
        )
        krs_j = f_krs.result()
    krs_j = g1.add(krs_j, g1.scalar_mul(ar_j, s_blind))
    krs_j = g1.add(krs_j, g1.scalar_mul(bs1_j, r_blind))
    krs_j = g1.add(
        krs_j, g1.scalar_mul(pk.delta1, (R - r_blind * s_blind % R) % R)
    )
    # + the non-GKR private K part (prove.go:74-98)
    not_gkr_scalars = [z[wid] for wid in pk.priv_not_gkr_wires]
    krs_j = g1.add(krs_j, _msm(pk.priv_k_not_gkr, not_gkr_scalars))

    return GadgetGroth16Proof(
        ar=ar_j,
        bs=bs2_j,
        krs=krs_j,
        krs_gkr_priv=krs_gkr_priv,
        initial_randomness=initial_randomness,
    )


# ---------------------------------------------------------------------------
# Verify
# ---------------------------------------------------------------------------


class Groth16VerifyError(Exception):
    pass


def verify(
    proof: GadgetGroth16Proof,
    vk: Groth16VerifyingKey,
    public_values: list[int],
) -> None:
    """verify.go:15-75. `public_values` are the wire values of the public
    inputs in canonical order (wire 1.., i.e. [rho, inner publics...])."""
    if proof.initial_randomness == 0:
        raise Groth16VerifyError("initial randomness missing from the proof")
    if len(public_values) != len(vk.k_pub) - 1:
        raise Groth16VerifyError(
            f"expected {len(vk.k_pub) - 1} public inputs, "
            f"got {len(public_values)}"
        )
    z_pub = [1] + [v % R for v in public_values]

    # recompute KrsGkr from the public ios + the proof's private part, and
    # re-derive the initial randomness (verify.go:37-50)
    gkr_pub_scalars = [z_pub[wid] for wid in vk.pub_gkr_wires]
    krs_gkr_pub = _msm(vk.pub_k_gkr, gkr_pub_scalars)
    krs_gkr = g1.add(krs_gkr_pub, proof.krs_gkr_priv)
    rho = g1.derive_randomness_from_point(krs_gkr)
    if rho != proof.initial_randomness:
        raise Groth16VerifyError(
            "the initial randomness does not match the io commitment"
        )

    # KrsPub = sum over ALL public wires of z_w * K_w (the reference builds
    # it as constant-wire + notGkr + Gkr pieces, verify.go:52-58)
    krs_pub = _msm(vk.k_pub, z_pub)

    # 4-term pairing check (verify.go:60-70):
    #   e(KrsPub, -gamma) e(Krs, -delta) e(KrsGkrPriv, -delta*sigma^-1)
    #   e(Ar, Bs) e(-alpha, beta) == 1
    ok = pr.pairing_check(
        [
            (krs_pub, g2.neg(vk.gamma2)),
            (proof.krs, g2.neg(vk.delta2)),
            (proof.krs_gkr_priv, vk.delta_sigma_inv_neg),
            (proof.ar, proof.bs),
            (g1.neg(vk.alpha1), vk.beta2),
        ]
    )
    if not ok:
        raise Groth16VerifyError("the pairing check failed")
