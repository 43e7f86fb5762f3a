"""Multi-instance sumcheck prover, fully on-device.

Proves, for claims j:  sum_i eq(qPrime[j], i) * Gate(X[0][i], ..., X[k-1][i])
(multi-claims combined by a deterministic random linear combination), with
semantics parity with the reference prover (sumcheck/prover.go:46-245,
sumcheck/algo.go:54-205):

  per round: partial evals of the round polynomial at t = 0..deg+1
  -> InterpolateOnRange -> Fiat-Shamir challenge r = MimcHash(coeffs)
  -> fold Eq and all X tables at r.

TPU-native design (not a port):
  * The whole (multi-)sumcheck for a layer is ONE jitted program — the round
    loop is unrolled over the bn halving shapes, the Fiat-Shamir MiMC hash
    runs on-device (`lax.scan` over the 91 Arks), so a full GKR layer walk
    is just a chain of async device dispatches with no host syncs.
  * A round's evaluations at all deg+2 points are computed as one batched
    tensor (16, deg+2, n/2): the t-axis replaces the reference's
    Delta-increment inner loop (sumcheck/algo.go:151-201) and the 128-wide
    subchunking (its cache-blocking) is left to XLA fusion.
  * The modular sum over the hypercube is a pairwise halving tree of field
    adds (exact; work ~2x one elementwise add).

The compiled function is cached per (gate type, #tables, #claims, bn).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..fields import fr
from ..hashes.mimc import mimc_hash_device
from ..poly import lagrange, multilin
from ..circuits.gates import CipherGate, Gate, IdentityGate
from ..ops import kernels as K


@dataclass
class SumcheckProof:
    """coeffs[k]: round-k univariate in coefficient form ((deg+2) coeffs,
    parity with sumcheck/prover.go:72). Shapes:
    coeffs (bn, deg+2, 16), challenges (bn, 16), final_claims (k+1, 16) with
    final_claims[0] = eq(challenges), then one entry per X table."""

    coeffs: jnp.ndarray
    challenges: jnp.ndarray
    final_claims: jnp.ndarray


def _split_halves(table, active_mid=None):
    """Return (bottom, top) halves of the active region. With a traced
    active_mid (masked tail rounds), the physical shape stays fixed and the
    top half starts at the dynamic offset; garbage lanes beyond active_mid
    are masked downstream."""
    mid = table.shape[-1] // 2
    bottom = table[..., :mid]
    if active_mid is None:
        top = table[..., mid:]
    else:
        top = jax.lax.dynamic_slice_in_dim(
            table, active_mid.astype(jnp.int32), mid, axis=table.ndim - 1
        )
    return bottom, top


def _stack_t_axis(bottom, top, n_evals, skip_t0=False):
    """halves (16, m) -> (16, n_evals[-1], m): evaluations of the
    one-variable restriction at t = 0, 1, ..., n_evals-1 via incremental
    adds (multilinearity: P(t+1, x) = P(t, x) + (P(1,x) - P(0,x)) — the same
    Delta-increment the reference uses, sumcheck/algo.go:151-201, but as a
    batched t-axis instead of an inner loop). With skip_t0 the t=0 row is
    omitted (the claim trick: the caller derives P(0) = claim - P(1))."""
    d = fr.sub(top, bottom)
    rows = [top] if skip_t0 else [bottom, top]
    cur = top
    for _ in range(n_evals - 2):
        cur = fr.add(cur, d)
        rows.append(cur)
    return jnp.stack(rows, axis=1)


def _partial_evals(gate: Gate, gate_params, eq, xs, active_mid=None,
                   skip_t0=False):
    """One round's evaluations: (16, deg+2[-1]) sums over the half
    hypercube (t = 0..deg+1, or t = 1..deg+1 with skip_t0)."""
    n_evals = gate.degree + 2
    eq_b, eq_h = _split_halves(eq, active_mid)
    eq_t = _stack_t_axis(eq_b, eq_h, n_evals, skip_t0)
    xs_t = []
    for x in xs:
        b, h = _split_halves(x, active_mid)
        xs_t.append(_stack_t_axis(b, h, n_evals, skip_t0))
    g = gate.eval_batch(gate_params, xs_t)
    prod = fr.mul(eq_t, g)
    if active_mid is not None:
        m = prod.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.uint32, (m,), 0)
        mask = lane < active_mid
        shape = (1,) * (prod.ndim - 1) + (m,)
        prod = jnp.where(mask.reshape(shape), prod, jnp.zeros_like(prod))
    # sum over the hypercube (last axis) -> (16, n_evals[, G])
    return fr.reduce_sum(prod, prod.ndim - 2)


def _fold(table, r, active_mid=None):
    """Fold on the leading hypercube variable. In masked tail rounds the
    physical size is kept: the folded half is written to the prefix and the
    (stale) upper half is carried along untouched. r: (16,) single or
    (16, G) grouped — broadcast over the hypercube axis."""
    bottom, top = _split_halves(table, active_mid)
    rr = r.reshape(r.shape + (1,) * (table.ndim - r.ndim))
    folded = fr.add(bottom, fr.mul(fr.sub(top, bottom), rr))
    if active_mid is None:
        return folded
    return jnp.concatenate([folded, table[..., table.shape[-1] // 2 :]], axis=-1)


def _make_eq(qprimes, claims):
    """Combined eq table, parity with makeEqTable
    (sumcheck/prover.go:102-144): first qPrime without multiplier, claims
    j >= 1 with multiplier rlc^j where rlc = MimcHash(claims). The rlc is
    skipped when there is a single claim (the reference computes it but its
    value never reaches the transcript — GetChallenge is stateless).

    Single: qprimes (J, bn, 16), claims (16, J) -> eq (16, 2**bn).
    Grouped: qprimes (J, bn, G, 16), claims (16, J, G) -> (16, G, 2**bn)."""
    grouped = qprimes.ndim == 4
    table = multilin.eq_table_grouped if grouped else multilin.eq_table
    n_claims = qprimes.shape[0]
    if not grouped and qprimes.shape[1] >= 13 and K.pallas_enabled():
        return _make_eq_multiclaim_fast(qprimes, claims)
    if grouped and qprimes.shape[1] >= 10 and K.pallas_enabled():
        # per-lane single-instance builds: each lane rides the Pallas
        # kernels (mul_scalar doubling / the single-pass multi-claim
        # contraction) that the vectorized grouped build can't — the lane
        # RLC equals the grouped lockstep hash, so values are identical
        g = qprimes.shape[2]
        lanes = [
            _make_eq(qprimes[:, :, gi], claims[:, :, gi]) for gi in range(g)
        ]
        return jnp.stack(lanes, axis=1)
    eq = table(qprimes[0])
    if n_claims <= 1:
        return eq
    rlc = mimc_hash_device(claims)  # (16,) or (16, G)

    def body(carry, inp):
        acc, mult = carry
        qp = inp
        acc = fr.add(acc, table(qp, multiplier=mult))
        return (acc, fr.mul(mult, rlc)), None

    (eq, _), _ = jax.lax.scan(body, (eq, rlc), qprimes[1:])
    return eq


def _make_eq_multiclaim_fast(qprimes, claims):
    """Single-pass multi-claim eq build (the fan-out layer's J=91 table):
    eq(q, x) factorizes as eq(q_hi, x_hi) * eq(q_lo, x_lo), so the combined
    table is one streaming contraction of tiny per-claim hi/lo tables
    (ops/kernels.py multi_eq_accum) instead of J sequential full-size
    accumulation passes (sumcheck/prover.go:102-144 semantics, identical
    values)."""
    j, bn, _ = qprimes.shape
    one = fr.one(())
    if j == 1:
        # single claim: no RLC (the hash would be computed-but-unused in
        # the reference; our slow path skips it too — transcript parity)
        ms = one[:, None]
    else:
        rlc = mimc_hash_device(claims)

        # multipliers m_0 = 1, m_k = rlc^k  -> (16, J)
        def body(m, _):
            nm = fr.mul(m, rlc)
            return nm, nm

        _, ms_rest = jax.lax.scan(body, one, None, length=j - 1)  # (J-1, 16)
        ms = jnp.moveaxis(jnp.concatenate([one[None], ms_rest], axis=0), -1, 0)

    k = min(bn, 10)
    hi_bits = bn - k
    # hi tables (multipliers folded in): (16, J, C); lo tables: (16, J, B)
    hi = multilin.eq_table_grouped(
        jnp.moveaxis(qprimes[:, :hi_bits], 0, 1), multiplier=ms
    )
    lo = multilin.eq_table_grouped(jnp.moveaxis(qprimes[:, hi_bits:], 0, 1))
    mh = jnp.transpose(hi, (2, 0, 1))  # (C, 16, J)
    return K.multi_eq_accum(mh, lo)


# Tables at or below 2**TAIL_BITS entries run as ONE fixed-shape masked
# lax.scan round body (compiled once per gate/shape class) instead of bn
# unrolled round graphs; the wasted tail compute is O(bn * 2**TAIL_BITS),
# negligible against the 2 * 2**bn total. Head rounds (large, halving
# shapes) are unrolled so they run at full speed with no masking — on TPU
# they dispatch the fused Pallas kernels (ops/kernels.py).
TAIL_BITS = 12
PALLAS_MIN = 512  # smallest table the Pallas round kernels handle


def _tail_bits() -> int:
    # with Pallas kernels the head rounds are cheap to compile and fast;
    # push the masked tail lower so more rounds run at kernel speed
    import os

    v = os.environ.get("GKR_TAIL_BITS")
    if v is not None:
        return int(v)
    return 8 if K.pallas_enabled() else TAIL_BITS


def _pallas_gate_kind(gate: Gate, xs) -> str | None:
    import os

    if not K.pallas_enabled():
        return None
    if os.environ.get("GKR_PE_DISABLE") == "1":  # diagnostic: XLA tables,
        return None  # Pallas hash stays on
    if isinstance(gate, CipherGate) and len(xs) == 2:
        return "cipher"
    if isinstance(gate, IdentityGate) and len(xs) == 1:
        return "identity"
    return None


def _with_t0(evals, claim, skip_t0):
    """Prepend the t=0 evaluation. With the claim trick the kernel only
    computed t = 1..deg+1 and P(0) = claim - P(1) — the exact same field
    value the direct evaluation would produce (P(0)+P(1) is the round's
    claimed sum, sumcheck/verifier.go:37-44), so transcripts are
    bit-identical while the hot kernel does one fewer gate evaluation."""
    if not skip_t0:
        return evals
    e0 = fr.sub(claim, evals[:, 0])
    return jnp.concatenate([e0[:, None], evals], axis=1)


def _coeff_pe_enabled() -> bool:
    import os

    return os.environ.get("GKR_COEFF_PE", "1") == "1"


def _gruen_enabled() -> bool:
    import os

    return os.environ.get("GKR_GRUEN", "1") == "1"


# --------------------------------------------------------------------------
# Gruen-factored rounds (single-claim cipher layers).
#
# eq(q, (r_<k, t, y)) = c_k * eq1(q_k, t) * S_k[y] with c_k = eq(q_<k, r_<k)
# and S_k the eq table over the TRAILING variables only — which depends on
# q alone, never on challenges. So the per-round kernel contracts against
# one challenge-free weight table (half the weighted-acc work, no d_eq),
# the eq table is never folded (only x0/x1 fold — 2 tables instead of 3),
# and the whole suffix-table chain costs HALF the old eq build. The round
# coefficients P_m = c_k * [(1-q_k) Q_m + (2q_k-1) Q_{m-1}] are the exact
# same field values as the direct path (same polynomial, exact arithmetic),
# so transcripts are bit-identical (asserted by tests/test_hotpath.py).
# --------------------------------------------------------------------------


def _qk_scalar(q, k):
    """q (bn, 16) -> (16,); grouped q (bn, G, 16) -> (16, G)."""
    qk = q[k]
    return qk if qk.ndim == 1 else jnp.moveaxis(qk, -1, 0)


def _suffix_tables(q, n_head: int):
    """[T_0 .. T_{n_head-1}]: T_k is the eq table over variables
    x_{k+1}..x_{bn-1} (MSB first), size 2**(bn-1-k); T_{n_head-1} doubles
    as the tail bridge. Built by prepending variables back to front —
    total work 2**(bn-1) muls, half the full-table build."""
    from ..ops import kernels as K

    bn = q.shape[0]
    grouped = q.ndim == 3
    g = q.shape[1] if grouped else None
    t = (fr.one((g,)) if grouped else fr.one(()))[..., None]
    out = {}
    use_pallas = K.pallas_enabled()
    use_band = use_pallas and K.fold_band_enabled()
    gg = g or 1
    for j in range(bn - 1, 0, -1):
        qj = _qk_scalar(q, j)[..., None]  # (16,[G,]1)
        if use_band and t.shape[-1] >= 512:
            # banded-scalar doubling (works grouped too: group-major flat)
            qjg = qj.reshape(fr.L, gg)
            t = K.suffix_step_band(t.reshape(fr.L, -1), qjg, gg)
            t = t.reshape((fr.L, g, -1) if grouped else (fr.L, -1))
        else:
            if use_pallas and not grouped and t.shape[-1] >= 512:
                qt = K.mul_scalar(t, qj[..., 0])
            else:
                qt = fr.mul(t, qj)
            t = jnp.concatenate([fr.sub(t, qt), qt], axis=-1)
        if j - 1 < n_head:
            out[j - 1] = t
    return [out[k] for k in range(n_head)]


def _eq1_at(qk, r):
    """eq1(q, r) = 1 - q - r + 2qr, elementwise on (16,[G])."""
    one = fr.one(qk.shape[1:])
    t = fr.mul(qk, r)
    return fr.add(fr.sub(fr.sub(one, qk), r), fr.add(t, t))


def _gruen_combine(qcoeffs, qk, ck):
    """Q (16, 8[, G]) -> P (16, 9[, G]): P_m = ck*(alpha Q_m + beta Q_{m-1})
    with alpha = 1 - q_k, beta = 2 q_k - 1."""
    one = fr.one(qk.shape[1:])
    alpha = fr.sub(one, qk)
    beta = fr.sub(fr.add(qk, qk), one)
    aq = fr.mul(qcoeffs, alpha[:, None])
    bq = fr.mul(qcoeffs, beta[:, None])
    zero = jnp.zeros_like(qcoeffs[:, :1])
    p = fr.add(
        jnp.concatenate([aq, zero], axis=1),
        jnp.concatenate([zero, bq], axis=1),
    )
    return fr.mul(p, ck[:, None])


def _prove_gruen_body(gate: Gate, gate_params, xs, qprimes, claims):
    """Whole-layer Gruen program for a single-claim cipher sumcheck:
    suffix-table build + factored head rounds + the standard masked tail
    (bridged with eq_tail = c_K * T_{K-1})."""
    from ..ops import kernels as K

    del claims  # single-claim: the RLC is skipped (transcript parity)
    grouped = qprimes.ndim == 4
    bn = qprimes.shape[1]
    q = qprimes[0]  # (bn,[G,]16)
    g = q.shape[1] if grouped else 1
    n_head = bn - _tail_bits()
    suffix = _suffix_tables(q, n_head)

    n_evals = gate.degree + 2
    ark = jnp.broadcast_to(gate_params[0].reshape(fr.L, 1), (fr.L, g))
    ck = fr.one((g,) if grouped else ())
    x0 = xs[0].reshape(fr.L, -1)
    x1 = xs[1].reshape(fr.L, -1)

    fold_f = K.fold_tables_band if K.fold_band_enabled() else K.fold_tables_gm
    fuse = K.gruen_fuse_enabled()
    head_coeffs, head_rs = [], []
    for k in range(n_head):
        s_flat = suffix[k].reshape(fr.L, -1)
        qk = _qk_scalar(q, k)
        acc = K.cipher_gruen_acc(s_flat, x0, x1, ark, g)
        qc = K.finish_gruen_acc(acc)  # (16, 8, G)
        if fuse:
            # fused round-scalar stage: coefficients + FS hash + next eq
            # prefix in ONE kernel (identical field formulas -> identical
            # transcripts; tests/test_hotpath.py asserts vs the unfused)
            one = fr.one(qk.shape[1:])
            alpha = fr.sub(one, qk)
            beta = fr.sub(fr.add(qk, qk), one)
            c3, r2, ck2 = K.gruen_round_scalar(
                qc,
                alpha.reshape(fr.L, g),
                beta.reshape(fr.L, g),
                ck.reshape(fr.L, g),
                qk.reshape(fr.L, g),
            )
            coeffs = c3 if grouped else c3[..., 0]
            r = r2 if grouped else r2[..., 0]
            ck = ck2 if grouped else ck2[..., 0]
        else:
            qc = qc if grouped else qc[..., 0]
            coeffs = _gruen_combine(qc, qk, ck)
            r = mimc_hash_device(coeffs)
            ck = fr.mul(ck, _eq1_at(qk, r))
        x0, x1 = fold_f([x0, x1], r, 2, g)
        head_coeffs.append(coeffs)
        head_rs.append(r)

    # bridge to the generic masked tail: the remaining eq table is the
    # scalar c_K times the last suffix table
    bridge = suffix[n_head - 1]
    eq_tail = fr.mul(bridge, ck[..., None])
    shape_tail = (fr.L, g, -1) if grouped else (fr.L, -1)
    xs_tail = [x0.reshape(shape_tail), x1.reshape(shape_tail)]
    tail_coeffs, tail_rs, final_claims = _tail_body(
        gate, gate_params, eq_tail, xs_tail
    )
    return _package_jit(
        len(head_coeffs), n_evals, tuple(head_coeffs), tuple(head_rs),
        tail_coeffs, tail_rs, final_claims,
    )


_prove_gruen_jit = partial(jax.jit, static_argnums=(0,))(_prove_gruen_body)


def _gruen_applies(gate: Gate, xs, qprimes) -> bool:
    """Gruen path: single-claim cipher layers on the Pallas backend with at
    least one head round."""
    return (
        _pallas_gate_kind(gate, list(xs)) == "cipher"
        and qprimes.shape[0] == 1
        and qprimes.shape[1] > _tail_bits()
        and _coeff_pe_enabled()
        and _gruen_enabled()
    )


def _round_step_coeff(kind, gate, gate_params, eq, xs, grouped):
    """Coefficient-form round (ops/kernels.py cipher_coeff_acc): the MXU
    computes the eq-weighted hypercube sums; the proof coefficients come
    out directly (no interpolation), bit-identical to the evaluate-then-
    interpolate path."""
    g = eq.shape[1] if grouped else 1
    eqf = eq.reshape(fr.L, -1)
    xsf = [x.reshape(fr.L, -1) for x in xs]
    if kind == "cipher":
        ark = jnp.broadcast_to(gate_params[0].reshape(fr.L, 1), (fr.L, g))
        acc = K.cipher_coeff_acc(eqf, xsf[0], xsf[1], ark, g)
        coeffs3 = K.finish_coeff_acc(acc, 8, 7)  # (16, 9, G)
    else:
        acc = K.identity_coeff_acc(eqf, xsf[0], g)
        coeffs3 = K.finish_coeff_acc(acc, 2, 1)
    coeffs = coeffs3 if grouped else coeffs3[..., 0]
    r = mimc_hash_device(coeffs)
    fold_f = K.fold_tables_band if K.fold_band_enabled() else K.fold_tables_gm
    folded = fold_f([eqf] + xsf, r, 1 + len(xs), g)
    if grouped:
        folded = [f.reshape(fr.L, g, -1) for f in folded]
    return folded[0], folded[1:], coeffs, r, None


def _round_step(gate, gate_params, eq, xs, active_mid, claim=None):
    """One sumcheck round (partial evals -> coeffs -> challenge -> fold).
    eq/xs: (16, n) single or (16, G, n) grouped. With a tracked `claim`
    (the running P_k(r_k) chain) the t=0 point is derived, not computed.
    Returns (eq, xs, coeffs, r, next_claim)."""
    grouped = eq.ndim == 3
    skip = claim is not None
    kind = _pallas_gate_kind(gate, xs) if active_mid is None else None
    if kind is not None and eq.shape[-1] >= PALLAS_MIN and _coeff_pe_enabled():
        return _round_step_coeff(kind, gate, gate_params, eq, xs, grouped)
    if kind is not None and eq.shape[-1] >= PALLAS_MIN:
        n_evals = gate.degree + 2
        if grouped:
            g = eq.shape[1]
            if kind == "cipher":
                ark = jnp.broadcast_to(gate_params[0].reshape(fr.L, 1), (fr.L, g))
                evals = K.cipher_partial_evals_g(eq, xs[0], xs[1], ark,
                                                 n_evals, skip)
            else:
                evals = K.identity_partial_evals_g(eq, xs[0], n_evals, skip)
        elif kind == "cipher":
            evals = K.cipher_partial_evals(eq, xs[0], xs[1], gate_params[0],
                                           n_evals, skip)
        else:
            evals = K.identity_partial_evals(eq, xs[0], n_evals, skip)
        evals = _with_t0(evals, claim, skip)
        coeffs = lagrange.interpolate_on_range_device(evals)
        r = mimc_hash_device(coeffs)
        next_claim = lagrange.eval_univariate_device(coeffs, r)
        fold_f = K.fold_tables_g if grouped else K.fold_tables
        folded = fold_f([eq] + list(xs), r, 1 + len(xs))
        return folded[0], folded[1:], coeffs, r, next_claim
    evals = _partial_evals(gate, gate_params, eq, xs, active_mid, skip)
    evals = _with_t0(evals, claim, skip)
    coeffs = lagrange.interpolate_on_range_device(evals)
    r = mimc_hash_device(coeffs)
    next_claim = lagrange.eval_univariate_device(coeffs, r)
    eq = _fold(eq, r, active_mid)
    xs = [_fold(x, r, active_mid) for x in xs]
    return eq, xs, coeffs, r, next_claim


# --------------------------------------------------------------------------
# Per-round compiled programs.
#
# The round at table size 2**k is the SAME program for every layer and every
# bn (the Fiat-Shamir chain lives in the data, not the shape), so each
# (gate, n_tables, size) compiles exactly once per process — a GKR walk of
# 94 layers at bn=17 reuses ~10 round programs instead of compiling one
# monolithic graph per (gate, claim-count, bn). Rounds after the first
# donate their input tables (the fold halves them; the originals are dead).
# --------------------------------------------------------------------------

_ROUND_JIT_CACHE: dict = {}


def _can_donate() -> bool:
    # XLA:CPU ignores donation (and warns); only donate on device backends.
    # NB: jax.default_backend() reports the plugin's platform even when CPU
    # devices are forced (axon), so inspect the actual device list.
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:  # pragma: no cover
        return False


def _round_jit(gate: Gate, has_claim: bool, donate: bool = False):
    """One head round as its own program (two flavors: with the tracked
    claim — one fewer gate eval — or without, for the output layer's first
    round). NB: head rounds never donate — every output is HALF the input
    size, so XLA can never alias a donated buffer (the round-1 'donated
    buffers were not usable' warnings), and the inputs are freed by
    refcount right after dispatch anyway."""
    del donate
    key = (gate, has_claim)
    f = _ROUND_JIT_CACHE.get(key)
    if f is None:
        if has_claim:
            def run(gate_params, eq, xs, claim):
                eq2, xs2, coeffs, r, nc = _round_step(
                    gate, gate_params, eq, list(xs), None, claim
                )
                return eq2, tuple(xs2), coeffs, r, nc
        else:
            def run(gate_params, eq, xs):
                eq2, xs2, coeffs, r, nc = _round_step(
                    gate, gate_params, eq, list(xs), None
                )
                return eq2, tuple(xs2), coeffs, r, nc

        f = jax.jit(run)
        _ROUND_JIT_CACHE[key] = f
    return f


def _combined_claim(claims):
    """The RLC-combined claimed sum (sumcheck/prover.go:102-144 multiplier
    chain applied to the claims instead of the eq tables): claim_0 +
    sum_{j>=1} rlc^j * claim_j with rlc = MimcHash(claims). None when the
    layer has no claims (the output layer: the first round computes the
    full t range instead)."""
    n_claims = claims.shape[1]
    if n_claims == 0:
        return None
    first = claims[:, 0]
    if n_claims == 1:
        return first
    rlc = mimc_hash_device(claims)

    def body(carry, cj):
        acc, mult = carry
        acc = fr.add(acc, fr.mul(mult, cj))
        return (acc, fr.mul(mult, rlc)), None

    rest = jnp.moveaxis(claims[:, 1:], 1, 0)  # (J-1, 16[, G])
    (acc, _), _ = jax.lax.scan(body, (first, rlc), rest)
    return acc


def _tail_body(gate: Gate, gate_params, eq, xs):
    """All remaining rounds once the table is small: one fixed-shape masked
    lax.scan (compiled once per gate and tail size, reused by every layer)."""
    n = eq.shape[-1]
    tail_rounds = n.bit_length() - 1

    def body(carry, _):
        eq_c, xs_c, active_mid = carry
        eq_c, xs_c, coeffs, r, _ = _round_step(
            gate, gate_params, eq_c, list(xs_c), active_mid
        )
        return (eq_c, tuple(xs_c), active_mid // 2), (coeffs, r)

    (eq, xs_t, _), (tail_coeffs, tail_rs) = jax.lax.scan(
        body, (eq, tuple(xs), jnp.uint32(n // 2)), None, length=tail_rounds
    )
    final_claims = _final_claims(eq, list(xs_t))
    return tail_coeffs, tail_rs, final_claims


# donate only when the inputs are fresh intermediates (head rounds ran); at
# small bn the tail consumes the caller's assignment tables, which other
# layers still read (e.g. the 91-consumer fan-out table).
_tail_jit_keep = partial(jax.jit, static_argnums=(0,))(_tail_body)
_tail_jit_donate = partial(jax.jit, static_argnums=(0,), donate_argnums=(2, 3))(
    _tail_body
)


def _final_claims(eq, xs):
    # single: entries (16,) -> (k+1, 16); grouped: (16, G) -> (k+1, G, 16)
    fc = jnp.stack([eq[..., 0]] + [x[..., 0] for x in xs], axis=0)
    fc = fr.canonicalize(jnp.moveaxis(fc, 1, 0))  # limb axis to front
    return jnp.moveaxis(fc, 0, -1)


_make_eq_jit = jax.jit(_make_eq)
_combined_claim_jit = jax.jit(_combined_claim)


@partial(jax.jit, static_argnums=(0, 1))
def _package_jit(n_head: int, n_evals: int, head_coeffs, head_rs, tail_coeffs,
                 tail_rs, final_claims):
    """Stack per-round artifacts into the proof tensors (canonical form).
    Limb axis moves last; a grouped G axis (coeffs (16, E, G), rs (16, G))
    rides between."""
    coeffs = [jnp.moveaxis(c, 0, -1) for c in head_coeffs]
    rs = [jnp.moveaxis(r, 0, -1) for r in head_rs]
    if tail_coeffs is not None:
        t = tail_coeffs.shape[0]
        coeffs += [jnp.moveaxis(tail_coeffs[i], 0, -1) for i in range(t)]
        rs += [jnp.moveaxis(tail_rs[i], 0, -1) for i in range(t)]
    if coeffs:
        proof = _canon_rows(jnp.stack(coeffs, axis=0))
        chals = _canon_rows(jnp.stack(rs, axis=0))
    else:
        batch = final_claims.shape[1:-1]  # () or (G,)
        proof = jnp.zeros((0, n_evals) + batch + (fr.L,), dtype=jnp.uint32)
        chals = jnp.zeros((0,) + batch + (fr.L,), dtype=jnp.uint32)
    return proof, chals, final_claims


_final_claims_jit = jax.jit(lambda eq, xs: _final_claims(eq, list(xs)))


def _use_monolith() -> bool:
    """One whole-layer program (eq build + all rounds + tail + packaging)
    per (gate, claim-count, bn) class instead of ~15 per-round dispatches.
    On the tunneled TPU backend each top-level dispatch costs ~5ms of host
    time, which made the per-round orchestration HOST-bound (92 layers x
    ~15 dispatches ~ the whole 7.3s wall at bn=20); the MiMC walk needs
    only 3 monolith classes (output cipher, 1-claim cipher, 91-claim
    identity), so compile count stays small. Default on TPU; the portable
    path keeps per-round programs (CPU dispatch is cheap, programs small).
    Parity: tests/test_hotpath.py asserts monolith == per-round transcripts."""
    import os

    v = os.environ.get("GKR_MONOLITH")
    if v is not None:
        return v == "1"
    return K.pallas_enabled()


def _prove_rounds(gate: Gate, gate_params, xs, qprimes, claims):
    """Round orchestration: per-size jitted head rounds + one masked-scan
    tail program. All dispatches are async — no host syncs in the chain."""
    if _gruen_applies(gate, xs, qprimes):
        return _prove_gruen_jit(gate, gate_params, tuple(xs), qprimes, claims)
    if _use_monolith():
        return _prove_jit(gate, gate_params, tuple(xs), qprimes, claims)
    bn = qprimes.shape[1]
    n_evals = gate.degree + 2
    eq = _make_eq_jit(qprimes, claims)
    # the coefficient-form kernels don't evaluate at t points, so the
    # claim trick (deriving P(0)) only applies to the other paths
    use_coeff = (
        _pallas_gate_kind(gate, list(xs)) is not None and _coeff_pe_enabled()
    )
    claim = (
        _combined_claim_jit(claims)
        if (claims.shape[1] > 0 and not use_coeff)
        else None
    )

    head_coeffs = []
    head_rs = []
    n = 1 << bn
    xs = tuple(xs)
    first = True
    while n > (1 << _tail_bits()):
        f = _round_jit(gate, claim is not None, donate=not first)
        if claim is not None:
            eq, xs, coeffs, r, claim = f(gate_params, eq, xs, claim)
        else:
            eq, xs, coeffs, r, claim = f(gate_params, eq, xs)
        head_coeffs.append(coeffs)
        head_rs.append(r)
        n //= 2
        first = False

    if n > 1:
        tail = _tail_jit_donate if (not first and _can_donate()) else _tail_jit_keep
        tail_coeffs, tail_rs, final_claims = tail(gate, gate_params, eq, xs)
    else:
        tail_coeffs = tail_rs = None
        final_claims = _final_claims_jit(eq, xs)

    return _package_jit(
        len(head_coeffs), n_evals, tuple(head_coeffs), tuple(head_rs),
        tail_coeffs, tail_rs, final_claims,
    )


@partial(jax.jit, static_argnums=(0,))
def _prove_jit(gate: Gate, gate_params, xs, qprimes, claims):
    """The whole-layer monolith: eq build + unrolled head rounds + masked
    tail + packaging, composed from the SAME step functions as the
    per-round path — the transcripts are identical op for op."""
    bn = qprimes.shape[1]
    n_evals = gate.degree + 2
    eq = _make_eq(qprimes, claims)
    use_coeff = (
        _pallas_gate_kind(gate, list(xs)) is not None and _coeff_pe_enabled()
    )
    claim = (
        _combined_claim(claims)
        if (claims.shape[1] > 0 and not use_coeff)
        else None
    )

    head_coeffs, head_rs = [], []
    n = 1 << bn
    xs = list(xs)
    while n > (1 << _tail_bits()):
        eq, xs, coeffs, r, claim = _round_step(
            gate, gate_params, eq, list(xs), None, claim
        )
        head_coeffs.append(coeffs)
        head_rs.append(r)
        n //= 2

    if n > 1:
        tail_coeffs, tail_rs, final_claims = _tail_body(gate, gate_params, eq, xs)
    else:
        tail_coeffs = tail_rs = None
        final_claims = _final_claims(eq, xs)

    return _package_jit(
        len(head_coeffs), n_evals, tuple(head_coeffs), tuple(head_rs),
        tail_coeffs, tail_rs, final_claims,
    )


def _canon_rows(arr):
    """Canonicalize a limb-last rows tensor (lazy -> canonical values)."""
    return jnp.moveaxis(fr.canonicalize(jnp.moveaxis(arr, -1, 0)), 0, -1)


_no_claims = jax.jit(lambda: jnp.zeros((fr.L, 0), dtype=jnp.uint32))
_no_claims_g = partial(jax.jit, static_argnums=0)(
    lambda g: jnp.zeros((fr.L, 0, g), dtype=jnp.uint32)
)


def prove(xs, qprimes, claims, gate: Gate) -> SumcheckProof:
    """Run the sumcheck prover.

    Single instance:
      xs:      list of (16, N) tables (N = 2**bn), all same length
      qprimes: (J, bn, 16) evaluation points (J >= 1)
      claims:  (16, J) claimed values (only used for Fiat-Shamir RLC), or
               None when there are no claims (the output layer,
               gkr/prover.go:26-31)
    Grouped (G independent instances amortizing the sequential Fiat-Shamir
    latency — each round hashes G transcripts in lockstep lanes):
      xs (16, G, N); qprimes (J, bn, G, 16); claims (16, J, G) | None.
      Proof tensors gain a G axis before the limb axis.
    """
    grouped = qprimes.ndim == 4
    bn = qprimes.shape[1]
    for x in xs:
        assert x.shape[-1] == 1 << bn, (x.shape, bn)
        assert x.ndim == (3 if grouped else 2)
    if claims is None:
        assert qprimes.shape[0] == 1
        claims = _no_claims_g(qprimes.shape[2]) if grouped else _no_claims()
    proof, chals, fc = _prove_rounds(gate, gate.params(), list(xs), qprimes, claims)
    return SumcheckProof(coeffs=proof, challenges=chals, final_claims=fc)


def evaluation(gate: Gate, qprimes, claims, xs):
    """Direct O(2**bn) computation of the (RLC-combined) claimed sum — the
    testing oracle, parity with sumcheck/instance.go:49-68."""
    eq = _make_eq(qprimes, claims if claims is not None else jnp.zeros((fr.L, 0), jnp.uint32))
    g = gate.eval_batch(gate.params(), list(xs))
    return fr.reduce_sum(fr.mul(eq, g), 0)
