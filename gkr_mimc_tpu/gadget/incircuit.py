"""The in-circuit GKR gadget + the Compile/Setup/Solve/Prove pipeline.

This is the analog of the reference's wrapped-circuit flow
(prover/gadget/{circuit,gadget,cs,solution}.go): a user circuit calls
`gadget.update_hasher(cs, state, msg)` for every MiMC hash; `close`
pads the batch, commits to all ios (split MSM -> Keccak -> rho), runs the
device GKR prover, and emits the full in-circuit GKR verification as R1CS
constraints (snark/gkr AssertValid) — so N hashes cost the outer SNARK
~3 constraints each plus the verifier overhead instead of 91*N.

Eager-tracing collapse (documented in snark/r1cs.py): gnark separates the
symbolic Compile from the witness Solve; here both are one eager pass over
the RecordingCS. `compile()` traces with a zero commitment (the hints
don't fire at gnark-compile time either, gadget.go:72-92), `solve()`
retraces with the setup keys so the commitment/randomness are real — the
constraint STRUCTURE of both passes is identical, which compile checks.

The InitialRandomness public input (wire 1) keeps the reference's
placeholder mechanics: it is traced as 0, the last constraint is the
deliberately-unsatisfied placeholder `1 * rho_pub == rho_computed`, and
`Solution.fix_solution` patches wire 1 and the placeholder's B value
exactly like solution.go:52-82.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from ..circuits import circuit as circ_mod
from ..circuits.circuit import Circuit
from ..fields import scalar
from ..gkr import prover as gkr_prover
from ..hashes.mimc import mimc_keyed_permutation
from ..models.mimc import mimc_circuit
from ..snark import gkr as snark_gkr
from ..snark.polynomial import MultiLin
from ..snark.r1cs import CompiledR1CS, RecordingCS, RVariable
from ..utils.common import log2_ceil
from ..utils.convert import ints_to_rows
from . import bn254_g1 as g1
from .gadget import _HASH_OF_ZEROES, expand_qprime
from .groth16 import Groth16ProvingKey, Groth16VerifyingKey
from . import groth16 as groth16_mod


@dataclass
class _IoEntry:
    vars: list  # input RVariables + [output RVariable]
    values: list  # ints, same order


class InCircuitIoStore:
    """IoStore over RecordingCS variables (io_store.go:15-166 analog):
    records values, wire ids and is-constant flags; dump order is
    inputs[0] || inputs[1] || ... || outputs (io_store.go:93-110)."""

    def __init__(self, input_arity: int = 2):
        self.input_arity = input_arity
        self.inputs: list[list[RVariable]] = [[] for _ in range(input_arity)]
        self.outputs: list[RVariable] = []
        self.index = 0

    def push(self, cs: RecordingCS, inputs: list[RVariable], output: RVariable):
        assert len(inputs) == self.input_arity
        for i, v in enumerate(inputs):
            self.inputs[i].append(v)
        self.outputs.append(output)
        self.index += 1

    def dump_vars(self) -> list[RVariable]:
        res = []
        for col in self.inputs:
            res.extend(col)
        res.extend(self.outputs)
        return res

    def input_values(self) -> list[list[int]]:
        return [[v.value for v in col] for col in self.inputs]

    def output_values(self) -> list[int]:
        return [v.value for v in self.outputs]


def _wire_of(v: RVariable):
    """The single wire id of a freshly-allocated variable, or None for
    constants / compound LCs (the is-constant flag of io_store.go)."""
    if v.is_constant or len(v.lc) != 1:
        return None
    w, c = v.lc[0]
    return w if c == 1 and w != 0 else None


def _enforce_wire(cs: RecordingCS, v: RVariable) -> RVariable:
    """Pin an io variable to a dedicated wire (the fork's cs.EnforceWire,
    io_store.go:60-83): the initial-randomness commitment multiexps WIRE
    values, so every non-constant io must BE a wire — a compound linear
    combination is materialized as a fresh wire plus one equality."""
    if v.is_constant or _wire_of(v) is not None:
        return v
    nv = cs.witness(v.value)
    cs.assert_is_equal(nv, v)
    return nv


class InCircuitGkrGadget:
    """gadget.go:34-119 analog over the RecordingCS."""

    def __init__(self, circuit: Circuit | None = None):
        self.circuit = circuit if circuit is not None else mimc_circuit()
        self.io = InCircuitIoStore(self.circuit.input_arity())

    def update_hasher(self, cs: RecordingCS, state, msg) -> RVariable:
        """One Miyaguchi-Preneel update (gadget_api.go:9-29): the keyed
        permutation is hint-computed (a fresh witness wire), the completion
        `perm + 2*state + msg` happens in linear constraints."""
        state = _enforce_wire(cs, cs._lift(state))
        msg = _enforce_wire(cs, cs._lift(msg))
        perm = mimc_keyed_permutation(msg.value, state.value)
        perm_var = cs.witness(perm)  # HashHint output (hints.go:135-145)
        self.io.push(cs, [state, msg], perm_var)
        return cs.add(perm_var, state, state, msg)

    def update_hasher_batch(self, cs: RecordingCS, states, msgs):
        """N independent updates with the hash hint fired ONCE for the
        whole batch (one fused device scan instead of N pure-Python 91-round
        permutations) — constraint structure identical to N update_hasher
        calls, so proofs and keys are unchanged. This is what lets the
        pipeline scale to the reference's bench sizes
        (performances_test.go:17-27)."""
        from ..fields import fr as _fr
        from .gadget import _perm_batch_jit

        if len(states) != len(msgs):
            raise ValueError("states and msgs must have equal length")
        svars = [_enforce_wire(cs, cs._lift(s)) for s in states]
        mvars = [_enforce_wire(cs, cs._lift(m)) for m in msgs]
        st = jnp.asarray(ints_to_rows([v.value for v in svars]).T)
        mg = jnp.asarray(ints_to_rows([v.value for v in mvars]).T)
        perm_ints = _fr.to_ints(_perm_batch_jit(mg, st))
        outs = []
        for sv, mv, p in zip(svars, mvars, perm_ints):
            perm_var = cs.witness(p)
            self.io.push(cs, [sv, mv], perm_var)
            outs.append(cs.add(perm_var, sv, sv, mv))
        return outs

    def _pad(self, cs: RecordingCS) -> int:
        if self.io.index == 0:
            raise ValueError("close() on an empty gadget")
        bn = log2_ceil(self.io.index)
        zero = cs.constant(0)
        # padding output = the circuit's own zero-input output (for the
        # default MiMC circuit this is Perm_0(0), gadget.go:19-31; for a
        # custom circuit the device witness would otherwise disagree)
        from ..circuits.circuit import assign_scalar

        pad_out = assign_scalar(
            self.circuit, [[0]] * self.io.input_arity
        )[-1][0]
        assert len(self.circuit) != 94 or pad_out == _HASH_OF_ZEROES
        hz = cs.constant(pad_out)
        while self.io.index < (1 << bn):
            # constant padding entries (gadget.go:58-66): no wires
            self.io.push(cs, [zero] * self.io.input_arity, hz)
        return bn

    def gkr_wire_ids(self) -> list[int]:
        """First-occurrence wire ids of the non-constant ios in dump order
        (the dedup of cs.go:43-56)."""
        seen = []
        seen_set = set()
        for v in self.io.dump_vars():
            w = _wire_of(v)
            if w is not None and w not in seen_set:
                seen_set.add(w)
                seen.append(w)
        return seen

    def close(self, cs: RecordingCS, rho_pub: RVariable, commit_keys=None):
        """gadget.go:103-119: pad, commit->rho, qPrime expansion, device
        GKR prove, in-circuit AssertValid, placeholder constraint.

        commit_keys: None at compile time (hints don't fire under gnark's
        symbolic compile either); at solve time a (pub_points, priv_points,
        pub_wires, priv_wires) tuple from the setup. Returns
        (rho, krs_gkr_priv)."""
        bn = self._pad(cs)

        # InitialRandomnessHint (hints.go:162-192)
        krs_gkr_priv = g1.INF
        if commit_keys is None:
            rho = 0
        else:
            pub_pts, priv_pts, pub_wires, priv_wires = commit_keys
            zvals = {w: None for w in pub_wires + priv_wires}
            for v in self.io.dump_vars():
                w = _wire_of(v)
                if w in zvals and zvals[w] is None:
                    zvals[w] = v.value
            krs_pub = groth16_mod._msm(pub_pts, [zvals[w] for w in pub_wires])
            krs_gkr_priv = groth16_mod._msm(
                priv_pts, [zvals[w] for w in priv_wires]
            )
            rho = g1.derive_randomness_from_point(g1.add(krs_pub, krs_gkr_priv))

        rho_var = cs.witness(rho)

        # qPrime by successive squaring, in constraints (gadget.go:77-84)
        qprime_vars = []
        tmp = rho_var
        for _ in range(bn):
            qprime_vars.append(tmp)
            tmp = cs.mul(tmp, tmp)

        # GkrProverHint (hints.go:197-233): device witness + proof
        qprime_ints = [v.value for v in qprime_vars]
        inputs_dev = [
            jnp.asarray(ints_to_rows(col).T) for col in self.io.input_values()
        ]
        qprime_dev = jnp.asarray(ints_to_rows(qprime_ints))
        assignment = circ_mod.assign(self.circuit, inputs_dev)
        proof = gkr_prover.prove(self.circuit, assignment, qprime_dev)

        # the in-circuit verification relation (gadget.go:115)
        sproof = snark_gkr.Proof.assign(cs, self.circuit, proof)
        sproof.assert_valid(
            cs,
            self.circuit,
            qprime_vars,
            [MultiLin(col) for col in self.io.inputs],
            MultiLin(self.io.outputs),
        )

        # the placeholder constraint the reference's solver leaves
        # unsatisfied for fixSolution (solution.go:52-82, gadget.go:118):
        # 1 * InitialRandomness == rho_computed, with B traced as 0
        cs.raw_constraint(
            ((0, 1),), tuple(rho_pub.lc), tuple(rho_var.lc), 1, 0, rho
        )
        return rho, krs_gkr_priv


@dataclass
class Solution:
    """solution.go:16-18: the wire vector + per-constraint values."""

    wires: list
    abc: list

    def fix_solution(self) -> None:
        """solution.go:52-82: the last constraint must be the placeholder
        (a=1, b=0, c=rho != 0) and wire 1 unset; patch both."""
        a, b, c = self.abc[-1]
        errs = []
        if a != 1:
            errs.append(f"a[last] should be 1, got {a}")
        if b != 0:
            errs.append(f"b[last] should be 0, got {b}")
        if c == 0:
            errs.append("c[last] should be nonzero")
        if self.wires[1] != 0:
            errs.append(f"w[1] should be 0, got {self.wires[1]}")
        if errs:
            raise ValueError("; ".join(errs))
        self.abc[-1] = (a, c, c)
        self.wires[1] = c


@dataclass
class GadgetR1CS:
    """R1CS + the GKR wire partition (the R1CS wrapper of cs.go:11-19)."""

    r1cs: CompiledR1CS
    pub_gkr: list
    priv_gkr: list
    pub_not_gkr: list
    priv_not_gkr: list
    bn: int

    @property
    def partition(self):
        return (self.pub_gkr, self.priv_gkr, self.pub_not_gkr, self.priv_not_gkr)


class GadgetCircuit:
    """WrapCircuitUsingGkr analog (circuit.go:8-47): `define(cs, gadget)`
    is the user circuit; the wrapper adds the public InitialRandomness
    input (wire 1) and the gadget close."""

    def __init__(self, define, circuit: Circuit | None = None):
        self.define = define
        self.circuit = circuit if circuit is not None else mimc_circuit()

    def _trace(self, commit_keys=None):
        cs = RecordingCS()
        gadget = InCircuitGkrGadget(self.circuit)
        rho_pub = cs.public_input(0)  # wire 1 (gadget.go:37 `gnark:",public"`)
        self.define(cs, gadget)
        rho, krs_gkr_priv = gadget.close(cs, rho_pub, commit_keys)
        return cs, gadget, rho, krs_gkr_priv

    def compile(self) -> GadgetR1CS:
        """Compile pass (cs.go:22-101): trace with a zero commitment and
        build the GKR wire partition."""
        cs, gadget, _, _ = self._trace(commit_keys=None)
        r1cs = cs.compile()
        gkr_orig = gadget.gkr_wire_ids()
        gkr_canon = {r1cs.wire_map[w] for w in gkr_orig}
        n_pub = r1cs.n_public
        pub_gkr = [w for w in range(1, n_pub + 1) if w in gkr_canon]
        pub_not_gkr = [w for w in range(1, n_pub + 1) if w not in gkr_canon]
        priv_gkr = [w for w in range(n_pub + 1, r1cs.n_wires) if w in gkr_canon]
        priv_not_gkr = [
            w for w in range(n_pub + 1, r1cs.n_wires) if w not in gkr_canon
        ]
        return GadgetR1CS(
            r1cs=r1cs,
            pub_gkr=pub_gkr,
            priv_gkr=priv_gkr,
            pub_not_gkr=pub_not_gkr,
            priv_not_gkr=priv_not_gkr,
            bn=log2_ceil(max(gadget.io.index, 1)),
        )

    def solve(
        self, compiled: GadgetR1CS, pk: Groth16ProvingKey, vk: Groth16VerifyingKey
    ):
        """Solve pass (solution.go:27-50): retrace with the commitment keys
        firing, check the structure matches the compile pass, fix the
        placeholder. Returns (solution, krs_gkr_priv, rho)."""
        # the key partitions carry CANONICAL (post-compile-remap) wire ids;
        # close() matches them against the RAW trace ids of _wire_of —
        # translate back through the compile pass's wire map (the solve
        # trace replays the identical allocation sequence, so raw ids match)
        raw_of = {v: k for k, v in compiled.r1cs.wire_map.items()}
        commit_keys = (
            vk.pub_k_gkr,
            pk.priv_k_gkr_sigma,
            [raw_of[w] for w in vk.pub_gkr_wires],
            [raw_of[w] for w in pk.priv_gkr_wires],
        )
        cs, gadget, rho, krs_gkr_priv = self._trace(commit_keys=commit_keys)
        if cs.nb_constraints != len(compiled.r1cs.constraints):
            raise ValueError(
                "solve trace diverged from the compiled structure: "
                f"{cs.nb_constraints} vs {len(compiled.r1cs.constraints)}"
            )
        # the solve trace replays the compile pass's allocation sequence
        # exactly, so the COMPILE pass's wire remap applies verbatim —
        # re-running the full R1CS remap here (27s at 1.3M constraints)
        # would rebuild constraint LCs the prover never reads
        remap = compiled.r1cs.wire_map
        wires = [0] * compiled.r1cs.n_wires
        for raw, v in enumerate(cs.wire_values):
            wires[remap[raw]] = v
        wires[0] = 1
        solution = Solution(wires=wires, abc=list(cs.abc))
        solution.fix_solution()
        return solution, krs_gkr_priv, rho

    def prove(
        self,
        compiled: GadgetR1CS,
        pk: Groth16ProvingKey,
        vk: Groth16VerifyingKey,
        seed: bytes | None = None,
    ):
        """Prove = Solve + ComputeProof (prove.go:26-42). seed=None (the
        default) samples fresh r/s blinding per proof (prove.go:161-167)."""
        solution, krs_gkr_priv, rho = self.solve(compiled, pk, vk)
        solved = CompiledR1CS(
            constraints=compiled.r1cs.constraints,
            n_public=compiled.r1cs.n_public,
            n_wires=compiled.r1cs.n_wires,
            abc=solution.abc,
            wires=solution.wires,
            wire_map=compiled.r1cs.wire_map,
        )
        solved.check()
        proof = groth16_mod.prove(solved, pk, krs_gkr_priv, rho, seed=seed)
        public_values = solution.wires[1 : compiled.r1cs.n_public + 1]
        return proof, public_values


def setup(compiled: GadgetR1CS, seed: bytes | None = None):
    """Setup (seed=None: os.urandom toxic waste) / DummySetup (explicit
    seed), one code path (setup.go:44-82)."""
    return groth16_mod.setup(compiled.r1cs, compiled.partition, seed=seed)
