"""Deterministic sumcheck test fixtures.

Parity with sumcheck/testing.go:11-57 (InitializeCipherGateInstance and
InitializeMultiInstance) — the same deterministic inputs, so transcripts are
comparable run-to-run and against the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..circuits.gates import CipherGate, IdentityGate
from ..fields import fr, scalar
from ..poly import multilin
from ..utils.common import random_fr_array
from ..utils.convert import ints_to_rows


def evaluation_scalar(gate, qprimes_int, claims_int, xs_int) -> int:
    """Host-int oracle of the (RLC-combined) sum, parity with
    sumcheck/instance.go:49-68 + makeEqTable (sumcheck/prover.go:102-144)."""
    from ..utils.common import get_challenge

    eq = multilin.eq_table_scalar(qprimes_int[0])
    if len(claims_int) >= 1 and len(qprimes_int) > 1:
        rlc = get_challenge(claims_int)
        mult = rlc
        for i in range(1, len(qprimes_int)):
            table_i = multilin.eq_table_scalar(qprimes_int[i], mult)
            eq = [scalar.add(a, b) for a, b in zip(eq, table_i)]
            mult = scalar.mul(mult, rlc)

    res = 0
    for n in range(len(xs_int[0])):
        g = gate.eval_scalar([x[n] for x in xs_int])
        res = scalar.add(res, scalar.mul(g, eq[n]))
    return res


def initialize_cipher_gate_instance(bn: int):
    """-> (xs device tables, claims_int, qprimes_int, gate)."""
    q = random_fr_array(bn)
    gate = CipherGate(145646)
    n = 1 << bn
    vals = list(range(n))
    l_int, r_int = vals, vals
    claim = evaluation_scalar(gate, [q], [], [l_int, r_int])
    xs = [fr.from_ints_mont(l_int), fr.from_ints_mont(r_int)]
    return xs, [claim], [q], gate


def initialize_multi_instance(bn: int, n_instance: int):
    """-> (xs device tables, claims_int, qprimes_int, gate)."""
    n = 1 << bn
    gate = IdentityGate()
    qs = [[(i * j + i) for j in range(bn)] for i in range(n_instance)]
    vals = list(range(n))
    claims = [evaluation_scalar(gate, [q], [], [vals, vals]) for q in qs]
    xs = [fr.from_ints_mont(vals), fr.from_ints_mont(vals)]
    return xs, claims, qs, gate


def to_device_qprimes(qprimes_int):
    """list of J bn-length int lists -> (J, bn, 16) Montgomery rows."""
    return jnp.asarray(ints_to_rows(qprimes_int))


def to_device_claims(claims_int):
    """list of J ints -> (16, J) Montgomery tensor (or None if empty)."""
    if not claims_int:
        return None
    return jnp.asarray(fr.encode_mont_ints(claims_int))
