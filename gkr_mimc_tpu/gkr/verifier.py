"""GKR verifier.

Parity with gkr/verifier.go:15-132: seed the output claim by evaluating the
output table itself; per non-input layer verify the sumcheck transcript and
the final-claim consistency expectedClaim = Gate(subclaims) *
EvalUnivariate([EvalEq(qPrime_j, nextQ)]_j, recombChal); check qPrime
consistency between layers; finally check each input table's evaluation.

Hybrid execution, engineered for a remote-device backend:
  * the O(2**bn) multilinear evaluations (output + input tables) run on
    device;
  * ALL per-round Fiat-Shamir challenges r = MimcHash(coeffs) are
    recomputed in ONE batched device program per coefficient-width class
    (the reference does bn*nlayers sequential host hashes,
    sumcheck/verifier.go:49 — at bn=17 that is ~14k hashes and seconds of
    host time; batched on device it is one dispatch);
  * every device->host copy is batched into ONE transfer;
  * the remaining host work is O(bn * nlayers) tiny Horner chains on
    Python ints.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..circuits.circuit import Circuit
from ..fields import fr
from ..hashes.mimc import mimc_hash_batch
from ..poly import multilin
from ..poly.lagrange import eval_univariate
from ..sumcheck import verifier as sumcheck_verifier
from ..utils.convert import rows_to_ints
from .prover import GKRProof


class GKRError(Exception):
    pass


def _evaluate_hybrid(table, coords):
    """Multilinear evaluation with the Pallas band-fold kernel for the
    large head folds (the portable XLA fold materializes 16x outer-product
    planes — it dominated the verifier's device time at bn=20) and the
    portable fold for the small tail."""
    from ..ops import kernels as K

    t = table
    i = 0
    bn = coords.shape[0]
    if K.pallas_enabled():
        while t.shape[-1] >= 2048 and i < bn:
            [t] = K.fold_tables_band([t], coords[i], 1, 1)
            i += 1
    for j in range(i, bn):
        t = multilin.fold(t, coords[j])
    return t[..., 0]


_evaluate_jit = jax.jit(_evaluate_hybrid)

_concat_flat = jax.jit(
    lambda *xs: jax.numpy.concatenate(
        [x.reshape(-1) for x in xs if x.size] or [jax.numpy.zeros(0, "uint32")]
    )
)


@jax.jit
def _hash_coeff_rows(*coeffs_rows):
    """Batch Fiat-Shamir: G arrays of (R, K, 16) round-coefficient rows ->
    (G, R, 16) challenges MimcHash(coeffs), all in one device program."""
    stacked = jnp.stack(coeffs_rows)  # (G, R, K, 16)
    g, r, k, _ = stacked.shape
    msgs = jnp.transpose(stacked.reshape(g * r, k, fr.L), (2, 1, 0))  # (16,K,N)
    hashed = mimc_hash_batch(msgs)  # (16, N)
    return jnp.transpose(hashed, (1, 0)).reshape(g, r, fr.L)


def _build_leaves(circuit: Circuit, proof: GKRProof, inputs: list, outputs,
                  qprime):
    """Dispatch all device work for one instance's verification and return
    the ordered leaf list (still async device arrays) plus the
    challenge-batch grouping."""
    nlayers = len(circuit)

    # the O(2**bn) multilinear evals
    out_eval_dev = _evaluate_jit(outputs, jax.numpy.asarray(qprime))[:, None]
    in_evals_dev = [
        _evaluate_jit(inputs[l], proof.qprimes[l][0])[:, None]
        for l in range(len(inputs))
    ]

    # batch-recompute every round challenge on device, grouped by the
    # (rounds, n_evals) shape class (cipher layers share one class, the
    # identity fan-out layer its own)
    groups: dict = {}
    for l in range(nlayers):
        p = proof.sumcheck_proofs[l]
        if p is None or p.coeffs.shape[0] == 0:
            continue
        groups.setdefault(p.coeffs.shape, []).append(l)
    chal_devs = {}
    for shape, layers in groups.items():
        chal_devs[shape] = _hash_coeff_rows(
            *(proof.sumcheck_proofs[l].coeffs for l in layers)
        )

    chal_leaves = [chal_devs[s] for s in groups]
    leaves = (
        [c for c in proof.claims if c is not None]
        + [q for q in proof.qprimes if q is not None]
        + [p.coeffs for p in proof.sumcheck_proofs if p is not None]
        + chal_leaves
        + [out_eval_dev]
        + in_evals_dev
        + [jax.numpy.asarray(qprime)]
    )
    return leaves, groups


def _fetch_leaves(leaves):
    """ONE transfer for everything the host math needs (a per-artifact
    device_get costs a full tunnel round trip on remote TPU backends)."""
    flat = np.asarray(jax.device_get(_concat_flat(*leaves)))
    out_leaves = []
    off = 0
    for l in leaves:
        size = int(np.prod(l.shape)) if l.shape else 1
        out_leaves.append(flat[off : off + size].reshape(l.shape))
        off += size
    return out_leaves


def verify(circuit: Circuit, proof: GKRProof, inputs: list, outputs, qprime) -> None:
    """inputs: list of (16, N) input tables; outputs: (16, N) output table;
    qprime: (bn, 16) Montgomery rows. Raises GKRError if invalid."""
    import os
    import sys
    import time

    trace = os.environ.get("GKR_TRACE_VERIFY") == "1"
    t0 = time.perf_counter()
    leaves, groups = _build_leaves(circuit, proof, inputs, outputs, qprime)
    if trace:
        t1 = time.perf_counter()
    fetched = _fetch_leaves(leaves)
    if trace:
        t2 = time.perf_counter()
    _host_verify(circuit, proof, fetched, groups, len(inputs))
    if trace:
        t3 = time.perf_counter()
        print(
            f"# verify phases: build+dispatch {1e3*(t1-t0):.0f} ms | "
            f"device+fetch {1e3*(t2-t1):.0f} ms | host {1e3*(t3-t2):.0f} ms",
            file=sys.stderr, flush=True,
        )


def _host_verify(circuit: Circuit, proof: GKRProof, out_leaves, groups,
                 n_inputs: int) -> None:
    nlayers = len(circuit)
    it = iter(out_leaves)

    def take(seq):
        return [next(it) if s is not None else None for s in seq]

    claims_np = take(proof.claims)
    qprimes_np = take(proof.qprimes)
    coeffs_np = take(proof.sumcheck_proofs)
    chals_np = {s: next(it) for s in groups}
    host = {
        "out_eval": next(it),
        "in_evals": [next(it) for _ in range(n_inputs)],
        "qprime": next(it),
    }

    claims_int = [
        rows_to_ints(c) if c is not None and c.shape[0] else [] for c in claims_np
    ]
    qprimes_int = [
        rows_to_ints(q) if q is not None and q.shape[0] else [] for q in qprimes_np
    ]
    qprime_int = rows_to_ints(host["qprime"])

    # per-layer challenge lists from the batched device hashes
    chals_int: list = [None] * nlayers
    for shape, layers in groups.items():
        rows = rows_to_ints(chals_np[shape])  # [g][round] ints
        for g, l in enumerate(layers):
            chals_int[l] = rows[g]
    for l in range(nlayers):
        p = proof.sumcheck_proofs[l]
        if p is not None and p.coeffs.shape[0] == 0:
            chals_int[l] = []

    if qprimes_int[nlayers - 1][0] != qprime_int:
        raise GKRError("initial qPrime does not match the proof")

    # the verifier computes the output claim itself (gkr/verifier.go:35-37)
    claims_int[nlayers - 1] = claims_int[nlayers - 1] + [
        fr.to_int(host["out_eval"])
    ]

    for layer in range(nlayers - 1, -1, -1):
        if circuit.is_input_layer(layer):
            break
        _test_sumcheck(
            circuit, coeffs_np, claims_int, qprimes_int, chals_int, layer
        )

    for layer in range(n_inputs):
        got = fr.to_int(host["in_evals"][layer])
        if got != claims_int[layer][0]:
            raise GKRError(
                f"input layer {layer} check failed: claim {claims_int[layer][0]} "
                f"!= eval {got}"
            )


def slice_group(proof: GKRProof, g: int) -> GKRProof:
    """Extract instance g from a grouped proof (artifacts carry the G axis
    right before the limb axis) as a standard single-instance GKRProof."""
    from ..sumcheck.prover import SumcheckProof

    sps = []
    for p in proof.sumcheck_proofs:
        if p is None:
            sps.append(None)
            continue
        sps.append(
            SumcheckProof(
                coeffs=p.coeffs[:, :, g],
                challenges=p.challenges[:, g] if p.challenges is not None else None,
                final_claims=(
                    p.final_claims[:, g] if p.final_claims is not None else None
                ),
            )
        )
    claims = [c[:, g] if c is not None else None for c in proof.claims]
    qprimes = [q[:, :, g] if q is not None else None for q in proof.qprimes]
    return GKRProof(sps, claims, qprimes)


def verify_grouped(circuit: Circuit, proof: GKRProof, inputs: list, outputs,
                   qprime) -> None:
    """Verify every instance of a grouped proof: inputs/outputs (16, G, N),
    qprime (bn, G, 16). Raises GKRError naming the failing group.

    All G lanes' device work is dispatched up front, then fetched with ONE
    transfer PER LANE: every lane's leaf list has identical shapes, so the
    concat/fetch program (and the per-lane dispatch programs) compile once
    and are shared with the single-instance verifier at the same size. (An
    earlier all-lanes concat was a G*n_leaves-arity XLA program whose
    compile alone dominated the first grouped verify.)"""
    n_groups = qprime.shape[1]
    per_group = []
    for g in range(n_groups):
        sliced = slice_group(proof, g)
        leaves, groups = _build_leaves(
            circuit,
            sliced,
            [x[:, g] for x in inputs],
            outputs[:, g],
            qprime[:, g],
        )
        per_group.append((sliced, groups, leaves))

    for g, (sliced, groups, leaves) in enumerate(per_group):
        try:
            _host_verify(
                circuit,
                sliced,
                _fetch_leaves(leaves),
                groups,
                len(inputs),
            )
        except GKRError as e:
            raise GKRError(f"group {g}: {e}") from e


def _test_sumcheck(circuit, coeffs_np, claims_int, qprimes_int, chals_int, layer) -> None:
    coeffs_int = rows_to_ints(coeffs_np[layer])

    try:
        next_qprime, next_claim, recomb_chal = sumcheck_verifier.verify(
            claims_int[layer], coeffs_int, challenges=chals_int[layer]
        )
    except sumcheck_verifier.SumcheckError as e:
        raise GKRError(f"layer {layer}: {e}") from e

    sub_claims = []
    for inp in circuit[layer].in_:
        slot = circuit.out_slot(inp, layer)
        if qprimes_int[inp][slot] != next_qprime:
            raise GKRError(f"layer {layer}: qPrime mismatch into layer {inp}")
        sub_claims.append(claims_int[inp][slot])

    expected = circuit[layer].gate.eval_scalar(sub_claims)

    eq_evals = [
        multilin.eq_eval_scalar(qp, next_qprime) for qp in qprimes_int[layer]
    ]
    eq_eval = eval_univariate(eq_evals, recomb_chal)

    from ..fields import scalar

    expected = scalar.mul(expected, eq_eval)
    if expected != next_claim:
        raise GKRError(f"layer {layer}: final claim mismatch")
