"""The MiMC GKR circuit (the reference's flagship "model").

Parity with examples/mimc.go:10-37: 94 layers —
  layer 0: input `block` (the permutation key)
  layer 1: input `initial state`
  layer 2: Identity copy of layer 0 (explicit multi-instance layer;
           it feeds all 91 cipher layers, so its sumcheck carries 91 claims)
  layer 3+i (i=0..90): CipherGate(Arks[i]) with In = {2, i+2}
           (i=0 takes layer 1 — the state — directly)
Output layer 93 computes MimcKeyedPermutation(state, block) per instance.

`assign_fused` is the TPU-native witness path: one jitted lax.scan over the
91 Ark constants writes all cipher-layer tables in a single device program
(the reference evaluates layer-by-layer with a goroutine pool,
circuit/circuit.go:48-64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..circuits.circuit import Circuit, Layer
from ..circuits.gates import CipherGate, IdentityGate
from ..fields import fr
from ..hashes.ark import ARKS_INT, arks_scan_tensor

MIMC_ROUNDS = 91


def mimc_circuit() -> Circuit:
    layers = [Layer(in_=[]), Layer(in_=[]), Layer(in_=[0], gate=IdentityGate())]
    for i in range(MIMC_ROUNDS):
        inp = i + 2 if i > 0 else 1
        layers.append(Layer(in_=[2, inp], gate=CipherGate(ARKS_INT[i])))
    return Circuit(layers)


@jax.jit
def _assign_fused_jit(block, state):
    arks = arks_scan_tensor(MIMC_ROUNDS)

    def body(cur, ark):
        a = ark.reshape((fr.L,) + (1,) * (cur.ndim - 1))
        nxt = fr.pow7(fr.add(fr.add(cur, block), a))
        return nxt, nxt

    _, states = jax.lax.scan(body, state, arks)
    return states  # (91, 16, N): cipher layer tables in walk order


import numpy as _np
from functools import lru_cache


@lru_cache(maxsize=None)
def _arks_cols_np():
    return _np.ascontiguousarray(arks_scan_tensor(MIMC_ROUNDS).T)


def _arks_cols():
    return _arks_cols_np()


def assign_fused(block, state) -> list:
    """Witness tables for mimc_circuit(): [block, state, copy, cipher0..90].

    On TPU this is ONE fused Pallas kernel writing all 91 cipher tables
    (ops/kernels.py mimc_witness); elsewhere a jitted lax.scan. Grouped
    inputs (16, G, N) flatten through the (elementwise) kernel and reshape
    back — group boundaries are irrelevant to the witness."""
    from ..ops import kernels as K

    if K.pallas_enabled() and block.shape[-1] >= 512:
        shape = block.shape
        if block.ndim == 3:
            wit = K.mimc_witness(
                block.reshape(fr.L, -1), state.reshape(fr.L, -1), _arks_cols()
            )
            wit = wit.reshape((wit.shape[0],) + shape)
        else:
            wit = K.mimc_witness(block, state, _arks_cols())
        return [block, state, block] + _unstack(wit)
    states = _assign_fused_jit(block, state)
    return [block, state, block] + _unstack(states)


_unstack = jax.jit(lambda w: [w[i] for i in range(w.shape[0])])
