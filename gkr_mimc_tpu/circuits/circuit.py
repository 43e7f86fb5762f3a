"""Layered circuit DAG + witness assignment.

Parity with circuit/circuit.go:11-91 and circuit/assignment.go:9-64:
a Circuit is a list of layers; a layer lists its input layer indices (empty
=> input layer) and a gate; `build()` computes the sorted consumer (`out`)
lists and enforces the explicit multi-instance rule (an input used more than
once must go through an Identity layer).

TPU-native assignment: the reference evaluates each layer with a goroutine
fork-join (circuit/circuit.go:48-64); here each layer eval is one fused
batched kernel over the whole hypercube, jit-cached per gate type, and the
full assignment lives in HBM as a list of (16, N) tables.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax

from ..fields import fr
from .gates import Gate


@dataclass
class Layer:
    in_: list[int]
    gate: Optional[Gate] = None
    out: list[int] = field(default_factory=list)


class Circuit(list):
    """A list of Layers with computed wiring metadata."""

    def __init__(self, layers):
        super().__init__(layers)
        self.build()

    def build(self):
        """Compute Out lists; validate the multi-instance rule
        (circuit/circuit.go:28-44)."""
        for l in self:
            l.out = []
        for idx, l in enumerate(self):
            for pos in l.in_:
                self[pos].out.append(idx)
        for idx, l in enumerate(self):
            l.out.sort()
            if len(l.in_) == 0 and len(l.out) > 1:
                raise ValueError(
                    f"layer {idx} is an input layer but has {len(l.out)} consumers; "
                    "multi-instances must be explicit Identity layers"
                )

    def is_input_layer(self, layer: int) -> bool:
        has_no_inputs = len(self[layer].in_) == 0
        has_no_gate = self[layer].gate is None
        if has_no_inputs != has_no_gate:
            raise ValueError(f"layer {layer} input/gate flags disagree")
        return has_no_inputs

    def input_arity(self) -> int:
        count = 0
        for layer in range(len(self)):
            if not self.is_input_layer(layer):
                break
            count += 1
        return count

    def out_slot(self, inp_layer: int, consumer: int) -> int:
        """Position of `consumer` in self[inp_layer].out (sorted); the claim
        scatter/gather index used by prover and verifier
        (gkr/prover.go:79-84, gkr/verifier.go:84-90)."""
        out = self[inp_layer].out
        pos = bisect.bisect_left(out, consumer)
        if pos == len(out) or out[pos] != consumer:
            raise ValueError(f"layer {consumer} is not a consumer of {inp_layer}")
        return pos


# jit cache for layer evaluation, keyed by gate static key (+ shapes via jit)
@partial(jax.jit, static_argnums=(0,))
def _eval_layer_jit(gate: Gate, params, xs):
    return gate.eval_batch(params, xs)


def assign(circuit: Circuit, inputs: list) -> list:
    """Full witness: a[l] = (16, N) table of layer l over all instances.
    Parity with circuit/assignment.go:12-32 (Assign)."""
    a: list = [None] * len(circuit)
    for i, inp in enumerate(inputs):
        a[i] = inp
    for l in range(len(inputs), len(circuit)):
        layer = circuit[l]
        xs = [a[j] for j in layer.in_]
        a[l] = _eval_layer_jit(layer.gate, layer.gate.params(), xs)
    return a


def assign_scalar(circuit: Circuit, inputs: list[list[int]]) -> list[list[int]]:
    """Host-int oracle of assign (for tests)."""
    a: list = [None] * len(circuit)
    for i, inp in enumerate(inputs):
        a[i] = list(inp)
    for l in range(len(inputs), len(circuit)):
        layer = circuit[l]
        n = len(a[layer.in_[0]])
        a[l] = [
            layer.gate.eval_scalar([a[j][i] for j in layer.in_]) for i in range(n)
        ]
    return a
