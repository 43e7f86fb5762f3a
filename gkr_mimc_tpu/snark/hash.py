"""In-circuit MiMC hash (snark/hash/mimc.go:10-26 mirror).

Transcript-compatible with hashes.mimc.mimc_hash: same 91 rounds, same
Miyaguchi-Preneel chaining, x^7 as the 4-mul chain — so the in-circuit
Fiat-Shamir challenges equal the native prover's bit-for-bit. Cost:
4 constraints per round, 364 per message word.
"""

from __future__ import annotations

from ..hashes.ark import ARKS_INT
from ..hashes.mimc import MIMC_ROUNDS
from .cs import ConstraintSystem, Variable


def mimc_hash(cs: ConstraintSystem, *stream) -> Variable:
    state = cs.constant(0)
    for m in stream:
        new_m = m
        for i in range(MIMC_ROUNDS):
            new_m = cs.add(new_m, state)
            new_m = cs.add(new_m, cs.constant(ARKS_INT[i]))
            tmp = cs.mul(new_m, new_m)  # ^2
            tmp = cs.mul(new_m, tmp)  # ^3
            tmp = cs.mul(tmp, tmp)  # ^6
            new_m = cs.mul(new_m, tmp)  # ^7
        state = cs.add(state, new_m, state, m)
    return state
