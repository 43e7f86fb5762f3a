"""GkrGadget: the batch-hashing service API (SNARK-integration analog).

Parity with prover/gadget/{gadget,gadget_api}.go. The reference gadget
lives inside a gnark circuit: `UpdateHasher` hint-computes each MiMC hash
while recording the io wires, and `Close` pads the batch, derives the
initial Fiat-Shamir randomness from a commitment to all ios (MSM +
Keccak), runs the native GKR prover as a hint, and emits the verifier
constraints. The TPU-native shape keeps the identical protocol pipeline —
same padding, same ρ→qPrime expansion (gadget.go:77-84), same proof wire
format — but replaces the constraint system with eager host/device
execution:

  * `update_hasher`       — per-call host hash (HashHint analog,
                            hints.go:135-145) for chained/streaming use.
  * `update_hasher_batch` — N independent hashes in one fused TPU scan;
                            the idiomatic path for bulk workloads.
  * `close`               — pad → commit(MSM+Keccak) → ρ → qPrime →
                            assign+prove on TPU → serialize → self-check.

The Groth16 wrapper around this (cs.go, prove.go's pairing-side MSMs) is
deliberately out of the TPU core: `GadgetProof` carries exactly what that
layer would consume (ρ, KrsGkrPriv, the proof vector in hint layout).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..circuits import circuit as circ_mod
from ..circuits.circuit import Circuit
from ..fields import fr, scalar
from ..gkr import prover as gkr_prover
from ..gkr import verifier as gkr_verifier
from ..hashes.mimc import mimc_keyed_permutation, mimc_keyed_permutation_device
from ..models.mimc import mimc_circuit
from ..utils.common import log2_ceil
from ..utils.convert import ints_to_rows
from . import bn254_g1 as g1
from .io_store import IoStore
from .serialize import proof_to_vec
from .setup import GadgetSetup, dummy_setup

# Perm_0(0): the padding output (gadget.go:19-31 hashOfZeroes; since state
# and block are both zero the Miyaguchi-Preneel completion adds nothing).
_HASH_OF_ZEROES = mimc_keyed_permutation(0, 0)


@dataclass
class GadgetProof:
    """What the reference's Proof + public witness carry for the GKR part
    (prove.go:18-24): the σ-marked private io commitment, the public
    initial randomness, and the serialized GKR proof (hint layout)."""

    bn: int
    initial_randomness: int
    krs_gkr_priv: tuple  # Jacobian G1 point
    proof_vec: list[int]


def expand_qprime(rho: int, bn: int) -> list[int]:
    """qPrime = [ρ, ρ², ρ⁴, …] by successive squaring (gadget.go:77-84)."""
    out = []
    tmp = rho
    for _ in range(bn):
        out.append(tmp)
        tmp = scalar.mul(tmp, tmp)
    return out


class GkrGadget:
    def __init__(self, circuit: Circuit | None = None):
        # like the reference, the default circuit is MiMC-91
        # (gadget.go:46-55); unlike the reference, ANY circuit works: the
        # MiMC-specific `update_hasher` API sits on top of the generic
        # `push_io`, and padding uses the circuit's own zero-output.
        self.circuit = circuit if circuit is not None else mimc_circuit()
        self.io_store = IoStore(input_arity=self.circuit.input_arity())
        self._zero_output: int | None = None

    def push_io(self, inputs: list[int], output: int, public: bool = False) -> None:
        """Record one generic io entry (inputs in the circuit's input-layer
        order). The caller is responsible for `output` being the circuit's
        output on `inputs` — close(check=True) cross-checks the whole batch
        against the device witness."""
        self.io_store.push(inputs, output, public)

    def _pad_output(self) -> int:
        """The circuit's output on all-zero inputs — the padding entry's
        recorded output (generalizes the reference's cached hashOfZeroes,
        gadget.go:19-31)."""
        if self._zero_output is None:
            from ..circuits.circuit import assign_scalar

            arity = self.circuit.input_arity()
            a = assign_scalar(self.circuit, [[0]] * arity)
            self._zero_output = a[-1][0]
            # sanity: for the default MiMC circuit this IS Perm_0(0)
            assert (
                len(self.circuit) != 94 or self._zero_output == _HASH_OF_ZEROES
            )
        return self._zero_output

    def update_hasher(self, state: int, msg: int, public: bool = False) -> int:
        """One Miyaguchi-Preneel update; returns the new hasher state
        (gadget_api.go:9-29). The GKR circuit only proves the keyed
        permutation, so the completion `perm + 2·state + msg` happens here."""
        perm = mimc_keyed_permutation(msg, state)
        self.io_store.push([state, msg], perm, public)
        return scalar.add(scalar.add(perm, scalar.add(state, state)), msg)

    def update_hasher_batch(
        self, states: list[int], msgs: list[int], public: bool = False
    ) -> list[int]:
        """N independent updates in one fused device scan — the TPU-first
        bulk path (no reference analog: gnark forces per-hash hints)."""
        if len(states) != len(msgs):
            raise ValueError("states and msgs must have equal length")
        st = jnp.asarray(ints_to_rows(states).T)  # (16, N)
        mg = jnp.asarray(ints_to_rows(msgs).T)
        perms = _perm_batch_jit(mg, st)
        perm_ints = fr.to_ints(perms)
        out = []
        for s, m, p in zip(states, msgs, perm_ints):
            self.io_store.push([s, m], p, public)
            out.append(scalar.add(scalar.add(p, scalar.add(s, s)), m))
        return out

    def _pad(self) -> int:
        """Pad the io batch to a power of two with all-zero-input entries
        (gadget.go:103-111); returns bN."""
        if self.io_store.index == 0:
            raise ValueError("close() on an empty gadget")
        bn = log2_ceil(self.io_store.index)
        zeros = [0] * self.io_store.input_arity
        pad_out = self._pad_output()
        while self.io_store.index < (1 << bn):
            self.io_store.push(zeros, pad_out, public=False)
        return bn

    def get_initial_randomness(self, setup: GadgetSetup) -> tuple[int, tuple, tuple]:
        """Commit to all ios with the split MSM and Keccak-derive ρ
        (hints.go:162-192). Returns (ρ, KrsGkr, KrsGkrPriv)."""
        scalars = self.io_store.dump_for_multiexp()
        mask = self.io_store.multiexp_public_mask()
        pub = [s for s, m in zip(scalars, mask) if m]
        priv = [s for s, m in zip(scalars, mask) if not m]
        if len(pub) != len(setup.pub_k_gkr) or len(priv) != len(
            setup.priv_k_gkr_sigma
        ):
            raise ValueError(
                f"setup sized for ({len(setup.pub_k_gkr)} pub, "
                f"{len(setup.priv_k_gkr_sigma)} priv) ios, "
                f"gadget has ({len(pub)}, {len(priv)})"
            )
        krs_priv = g1.msm(setup.priv_k_gkr_sigma, priv)
        krs = g1.add(g1.msm(setup.pub_k_gkr, pub), krs_priv)
        return g1.derive_randomness_from_point(krs), krs, krs_priv

    def make_setup(self, seed: bytes = b"gkr-mimc-tpu") -> GadgetSetup:
        """Dummy setup sized to this gadget's (padded) io partition."""
        bn = log2_ceil(max(self.io_store.index, 1))
        n = (1 << bn) * (self.io_store.input_arity + 1)
        n_pub = sum(self.io_store.public) * (self.io_store.input_arity + 1)
        # padding entries are private
        return dummy_setup(n_pub, n - n_pub, seed)

    def close(self, setup: GadgetSetup | None = None, check: bool = True) -> GadgetProof:
        """Pad, commit, prove on TPU, serialize; optionally self-verify
        (the AssertValid call of gadget.go:115 — here the host verifier)."""
        bn = self._pad()
        if setup is None:
            setup = self.make_setup()
        rho, _krs, krs_priv = self.get_initial_randomness(setup)
        qprime_ints = expand_qprime(rho, bn)

        # device witness + proof (GkrProverHint analog, hints.go:197-233)
        inputs = [
            jnp.asarray(ints_to_rows(col).T)  # (16, N)
            for col in self.io_store.inputs_for_verifier()
        ]
        qprime = jnp.asarray(ints_to_rows(qprime_ints))
        a = circ_mod.assign(self.circuit, inputs)
        proof = gkr_prover.prove(self.circuit, a, qprime)

        if check:
            gkr_verifier.verify(self.circuit, proof, inputs, a[-1], qprime)
            got = fr.to_ints(a[-1])
            if got != self.io_store.outputs_for_verifier():
                raise ValueError("witness outputs disagree with recorded ios")

        return GadgetProof(
            bn=bn,
            initial_randomness=rho,
            krs_gkr_priv=krs_priv,
            proof_vec=proof_to_vec(self.circuit, proof),
        )


_perm_batch_jit = jax.jit(mimc_keyed_permutation_device)
