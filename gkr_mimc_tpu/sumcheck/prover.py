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
from ..circuits.gates import Gate


@dataclass
class SumcheckProof:
    """coeffs[k]: round-k univariate in coefficient form ((deg+2) coeffs,
    parity with sumcheck/prover.go:72). Shapes:
    coeffs (bn, deg+2, 16), challenges (bn, 16), final_claims (k+1, 16) with
    final_claims[0] = eq(challenges), then one entry per X table."""

    coeffs: jnp.ndarray
    challenges: jnp.ndarray
    final_claims: jnp.ndarray


def _stack_t_axis(table, n_evals):
    """(16, n) -> (16, n_evals, n/2): evaluations of the one-variable
    restriction at t = 0, 1, ..., n_evals-1 via incremental adds
    (multilinearity: P(t+1, x) = P(t, x) + (P(1,x) - P(0,x)))."""
    mid = table.shape[-1] // 2
    bottom = table[..., :mid]
    top = table[..., mid:]
    d = fr.sub(top, bottom)
    rows = [bottom, top]
    cur = top
    for _ in range(n_evals - 2):
        cur = fr.add(cur, d)
        rows.append(cur)
    return jnp.stack(rows, axis=1)


def _partial_evals(gate: Gate, gate_params, eq, xs):
    """One round's evaluations: (16, deg+2) sums over the half hypercube."""
    n_evals = gate.degree + 2
    eq_t = _stack_t_axis(eq, n_evals)
    xs_t = [_stack_t_axis(x, n_evals) for x in xs]
    g = gate.eval_batch(gate_params, xs_t)
    prod = fr.mul(eq_t, g)
    return fr.reduce_sum(prod, 1)  # sum over the hypercube -> (16, n_evals)


def _make_eq(qprimes, claims):
    """Combined eq table (16, 2**bn), parity with makeEqTable
    (sumcheck/prover.go:102-144): first qPrime without multiplier, claims
    j >= 1 with multiplier rlc^j where rlc = MimcHash(claims). The rlc is
    skipped when there is a single claim (the reference computes it but its
    value never reaches the transcript — GetChallenge is stateless)."""
    n_claims = qprimes.shape[0]
    eq = multilin.eq_table(qprimes[0])
    if n_claims <= 1:
        return eq
    rlc = mimc_hash_device(claims)  # claims: (16, J)

    def body(carry, inp):
        acc, mult = carry
        qp = inp
        acc = fr.add(acc, multilin.eq_table(qp, multiplier=mult))
        return (acc, fr.mul(mult, rlc)), None

    (eq, _), _ = jax.lax.scan(body, (eq, rlc), qprimes[1:])
    return eq


@partial(jax.jit, static_argnums=(0,))
def _prove_jit(gate: Gate, gate_params, xs, qprimes, claims):
    bn = qprimes.shape[1]
    n_evals = gate.degree + 2

    eq = _make_eq(qprimes, claims)

    coeffs_rounds = []
    challenges = []
    for _ in range(bn):
        evals = _partial_evals(gate, gate_params, eq, xs)
        coeffs = lagrange.interpolate_on_range_device(evals)
        r = mimc_hash_device(coeffs)
        eq = multilin.fold(eq, r)
        xs = [multilin.fold(x, r) for x in xs]
        coeffs_rounds.append(coeffs)
        challenges.append(r)

    final_claims = jnp.stack([eq[..., 0]] + [x[..., 0] for x in xs], axis=0)
    if bn > 0:
        proof = jnp.stack([jnp.moveaxis(c, 0, -1) for c in coeffs_rounds], axis=0)
        chals = jnp.stack(challenges, axis=0)
    else:
        proof = jnp.zeros((0, n_evals, fr.L), dtype=jnp.uint32)
        chals = jnp.zeros((0, fr.L), dtype=jnp.uint32)
    return proof, chals, final_claims


def prove(xs, qprimes, claims, gate: Gate) -> SumcheckProof:
    """Run the sumcheck prover.

    xs:      list of (16, N) tables (N = 2**bn), all same length
    qprimes: (J, bn, 16) evaluation points (J >= 1)
    claims:  (16, J) claimed values (only used for Fiat-Shamir RLC), or None
             when there are no claims (the output layer, gkr/prover.go:26-31)
    gate:    static Gate instance
    """
    bn = qprimes.shape[1]
    for x in xs:
        assert x.shape[-1] == 1 << bn, (x.shape, bn)
    if claims is None:
        assert qprimes.shape[0] == 1
        claims = jnp.zeros((fr.L, 0), dtype=jnp.uint32)
    proof, chals, fc = _prove_jit(gate, gate.params(), list(xs), qprimes, claims)
    return SumcheckProof(coeffs=proof, challenges=chals, final_claims=fc)


def evaluation(gate: Gate, qprimes, claims, xs):
    """Direct O(2**bn) computation of the (RLC-combined) claimed sum — the
    testing oracle, parity with sumcheck/instance.go:49-68."""
    eq = _make_eq(qprimes, claims if claims is not None else jnp.zeros((fr.L, 0), jnp.uint32))
    g = gate.eval_batch(gate.params(), list(xs))
    return fr.reduce_sum(fr.mul(eq, g), 0)
