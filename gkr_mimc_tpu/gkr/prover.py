"""GKR prover: the output->input layer walk.

Parity with gkr/prover.go:21-91: walk layers from the output down to the
first non-input layer; per layer run one (multi-claim) sumcheck over the
layer's input tables; scatter each final claim + the next qPrime into the
consumer slot of the producing layer (slots ordered by the sorted Out list).

TPU-native shape: each per-layer sumcheck is a single jitted device program
(see sumcheck/prover.py); the walk is a Python loop that only shuffles tiny
(16,)-sized claim tensors between dispatches, so the device pipeline never
drains. The reference's copy-on-reuse of input tables
(circuit/assignment.go:46-53) disappears: tables are functional values.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax.numpy as jnp

import jax

from ..circuits.circuit import Circuit
from ..fields import fr
from ..sumcheck import prover as sumcheck_prover
from ..sumcheck.prover import SumcheckProof

# Every per-layer bookkeeping op is jitted: an eager dispatch costs ~20ms
# through a remote-device tunnel, a jitted call ~0.04ms. Cached per shape.
_stack0 = jax.jit(lambda *xs: jnp.stack(xs, axis=0))
_claims_pack = jax.jit(
    lambda *cs: (jnp.stack(cs, axis=0), jnp.moveaxis(jnp.stack(cs, axis=0), -1, 0))
)
_row = jax.jit(lambda fc, i: jax.lax.dynamic_index_in_dim(fc, i, 0, keepdims=False))
_empty_claims = jax.jit(lambda: jnp.zeros((0, fr.L), dtype=jnp.uint32))
_empty_claims_g = partial(jax.jit, static_argnums=0)(
    lambda g: jnp.zeros((0, g, fr.L), dtype=jnp.uint32)
)


@dataclass
class GKRProof:
    """Indexed [layer]; entries are None for input layers.

    sumcheck_proofs[l]: SumcheckProof for layer l
    claims[l]:          (J_l, 16) Montgomery rows, J_l = len(out) claims
                        (empty (0,16) for the output layer: the verifier
                        recomputes the output claim itself,
                        gkr/verifier.go:35-37)
    qprimes[l]:         (J_l, bn, 16) Montgomery rows
    """

    sumcheck_proofs: list[Optional[SumcheckProof]]
    claims: list[Optional[jnp.ndarray]]
    qprimes: list[Optional[jnp.ndarray]]


def prove(circuit: Circuit, assignment: list, qprime) -> GKRProof:
    """assignment: list of (16, N) tables (from circuits.assign);
    qprime: (bn, 16) Montgomery rows — the initial evaluation point.

    Grouped mode (G independent instances in one walk, amortizing the
    per-round Fiat-Shamir latency): assignment tables (16, G, N), qprime
    (bn, G, 16); every proof artifact gains a G axis before the limb
    axis. Slice with gkr.verifier.slice_group / verify_grouped."""
    nlayers = len(circuit)
    bn = qprime.shape[0]
    grouped = qprime.ndim == 3

    # slot -> value stores, one slot per consumer of each layer
    claim_store: list[list] = [[None] * len(l.out) for l in circuit]
    qprime_store: list[list] = [[None] * len(l.out) for l in circuit]

    proofs: list[Optional[SumcheckProof]] = [None] * nlayers
    claims_out: list[Optional[jnp.ndarray]] = [None] * nlayers
    qprimes_out: list[Optional[jnp.ndarray]] = [None] * nlayers

    # output layer: a single qPrime, no claims (gkr/prover.go:31)
    qprimes_out[nlayers - 1] = _stack0(jnp.asarray(qprime))
    claims_out[nlayers - 1] = (
        _empty_claims_g(qprime.shape[1]) if grouped else _empty_claims()
    )

    # GKR_TRACE_LAYERS=1: force after every layer and print per-layer ms
    # (diagnostic only — serializing the async pipeline inflates totals)
    import os as _os

    trace = _os.environ.get("GKR_TRACE_LAYERS") == "1"
    if trace:
        import sys as _sys
        import time as _time

        import numpy as _np

    for layer in range(nlayers - 1, -1, -1):
        if circuit.is_input_layer(layer):
            break

        if layer == nlayers - 1:
            qprimes = qprimes_out[layer]
            claims = None
        else:
            qprimes = _stack0(*qprime_store[layer])
            claim_rows, claims = _claims_pack(*claim_store[layer])
            qprimes_out[layer] = qprimes
            claims_out[layer] = claim_rows

        if trace:
            t0 = _time.perf_counter()
        xs = [assignment[j] for j in circuit[layer].in_]
        if trace:
            _np.asarray(jax.device_get(xs[-1][:1, ..., :1]))
            t1 = _time.perf_counter()
        scp = sumcheck_prover.prove(xs, qprimes, claims, circuit[layer].gate)
        proofs[layer] = scp
        if trace:
            _np.asarray(jax.device_get(scp.challenges[:1]))
            print(
                f"# layer {layer}: inputs {1e3*(t1-t0):.1f} ms + "
                f"sumcheck {1e3*(_time.perf_counter()-t1):.1f} ms",
                file=_sys.stderr, flush=True,
            )

        next_qprime = scp.challenges  # (bn, 16)
        for i, inp in enumerate(circuit[layer].in_):
            slot = circuit.out_slot(inp, layer)
            claim_store[inp][slot] = _row(scp.final_claims, 1 + i)
            qprime_store[inp][slot] = next_qprime

    # materialize claims/qprimes for input layers (needed by the verifier's
    # final input checks, gkr/verifier.go:120-132)
    for layer in range(nlayers):
        if not circuit.is_input_layer(layer):
            continue
        if claim_store[layer] and claim_store[layer][0] is not None:
            claims_out[layer] = _stack0(*claim_store[layer])
            qprimes_out[layer] = _stack0(*qprime_store[layer])

    return GKRProof(proofs, claims_out, qprimes_out)
