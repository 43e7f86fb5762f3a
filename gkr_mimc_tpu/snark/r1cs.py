"""Recording constraint system: eager evaluation + R1CS emission.

The counting tracer (snark/cs.py) preserves the reference's verification
relation and cost model; this module upgrades it to a full R1CS *recorder*
so a real Groth16 can run on top (the reference gets this from the gnark
frontend, prover/gadget/cs.go:22-101). Same eager execution model — every
variable carries its concrete value — plus:

  * wires: index 0 is the constant 1; public wires come first, then
    private (gnark's layout, which the K-split of setup.go relies on);
  * every Variable carries a linear combination over wires; linear ops
    stay free (they fold into LCs), each var*var mul allocates one wire
    and one constraint; assertions emit one constraint;
  * the per-constraint evaluated values (a_c, b_c, c_c) are recorded as
    they are traced — tracing IS solving (the eager collapse of gnark's
    Compile/Solve split, documented in snark/cs.py).

R1CS convention: constraint c is <A_c, z> * <B_c, z> = <C_c, z> over the
wire vector z with z[0] = 1.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields import scalar


class UnsatisfiedConstraint(Exception):
    pass


class RVariable:
    """Eager variable: concrete value + linear combination over wires.

    lc: tuple of (wire_id, coeff) pairs; constants use wire 0 (== 1).
    Plain __slots__ class — millions are allocated while tracing, and a
    frozen dataclass costs ~3x more per instance."""

    __slots__ = ("value", "is_constant", "lc")

    def __init__(self, value: int, is_constant: bool = False, lc: tuple = ()):
        self.value = value
        self.is_constant = is_constant
        self.lc = lc


def _lc_scale(lc: tuple, k: int) -> tuple:
    if k == 1:
        return lc
    return tuple((w, c * k % scalar.P) for w, c in lc)


def _lc_add(*lcs) -> tuple:
    acc: dict = {}
    for lc in lcs:
        for w, c in lc:
            acc[w] = (acc.get(w, 0) + c) % scalar.P
    return tuple((w, c) for w, c in acc.items() if c != 0)


class RecordingCS:
    """API-compatible superset of snark.cs.ConstraintSystem that records
    the R1CS and the solution vector while eagerly checking satisfiability."""

    def __init__(self):
        # wire 0 is the constant 1
        self.wire_values: list[int] = [1]
        self.wire_public: list[bool] = [False]  # wire 0 handled specially
        self.constraints: list[tuple] = []  # (A_lc, B_lc, C_lc)
        self.abc: list[tuple] = []  # evaluated (a, b, c) per constraint
        self.nb_multiplications = 0
        self.nb_assertions = 0
        self.nb_wires = 0

    @property
    def nb_constraints(self) -> int:
        return len(self.constraints)

    # -- wire allocation -----------------------------------------------------
    def _new_wire(self, v: int, public: bool) -> int:
        self.wire_values.append(v % scalar.P)
        self.wire_public.append(public)
        return len(self.wire_values) - 1

    def public_input(self, v: int) -> RVariable:
        self.nb_wires += 1
        w = self._new_wire(v, True)
        return RVariable(v % scalar.P, False, ((w, 1),))

    def witness(self, v: int) -> RVariable:
        self.nb_wires += 1
        w = self._new_wire(v, False)
        return RVariable(v % scalar.P, False, ((w, 1),))

    # -- lifting -------------------------------------------------------------
    def constant(self, v) -> RVariable:
        if isinstance(v, RVariable):
            return v
        v = int(v) % scalar.P
        return RVariable(v, True, ((0, v),) if v else ())

    def _lift(self, v) -> RVariable:
        return v if isinstance(v, RVariable) else self.constant(v)

    # -- linear ops (free) ---------------------------------------------------
    def add(self, a, b, *rest) -> RVariable:
        terms = [self._lift(x) for x in (a, b, *rest)]
        val = 0
        for t in terms:
            val = scalar.add(val, t.value)
        return RVariable(
            val,
            all(t.is_constant for t in terms),
            _lc_add(*(t.lc for t in terms)),
        )

    def sub(self, a, b) -> RVariable:
        a, b = self._lift(a), self._lift(b)
        return RVariable(
            scalar.sub(a.value, b.value),
            a.is_constant and b.is_constant,
            _lc_add(a.lc, _lc_scale(b.lc, scalar.P - 1)),
        )

    def neg(self, a) -> RVariable:
        a = self._lift(a)
        return RVariable(
            scalar.sub(0, a.value), a.is_constant, _lc_scale(a.lc, scalar.P - 1)
        )

    # -- multiplication ------------------------------------------------------
    def mul(self, a, b) -> RVariable:
        a, b = self._lift(a), self._lift(b)
        val = scalar.mul(a.value, b.value)
        if a.is_constant or b.is_constant:
            if a.is_constant:
                k, lc = a.value, b.lc
            else:
                k, lc = b.value, a.lc
            return RVariable(
                val, a.is_constant and b.is_constant, _lc_scale(lc, k)
            )
        self.nb_multiplications += 1
        w = self._new_wire(val, False)
        self.nb_wires += 1
        self.constraints.append((a.lc, b.lc, ((w, 1),)))
        self.abc.append((a.value, b.value, val))
        return RVariable(val, False, ((w, 1),))

    # -- assertions ----------------------------------------------------------
    def assert_is_equal(self, a, b) -> None:
        a, b = self._lift(a), self._lift(b)
        self.nb_assertions += 1
        # a * 1 = b
        self.constraints.append((a.lc, ((0, 1),), b.lc))
        self.abc.append((a.value, 1, b.value))
        if a.value != b.value:
            raise UnsatisfiedConstraint(f"{a.value} != {b.value}")

    # -- raw constraint (the gadget's placeholder, solution.go:52-82) --------
    def raw_constraint(self, a_lc, b_lc, c_lc, a_v, b_v, c_v) -> None:
        self.constraints.append((tuple(a_lc), tuple(b_lc), tuple(c_lc)))
        self.abc.append((a_v % scalar.P, b_v % scalar.P, c_v % scalar.P))

    # -- compilation ---------------------------------------------------------
    def compile(self) -> "CompiledR1CS":
        """Freeze into the canonical wire order [1, publics..., privates...]
        and remap every LC (the layout the Groth16 K-split assumes)."""
        pub = [i for i in range(1, len(self.wire_values)) if self.wire_public[i]]
        priv = [i for i in range(1, len(self.wire_values)) if not self.wire_public[i]]
        remap = {0: 0}
        for j, i in enumerate(pub):
            remap[i] = 1 + j
        for j, i in enumerate(priv):
            remap[i] = 1 + len(pub) + j

        def m(lc):
            return tuple((remap[w], c) for w, c in lc)

        constraints = [(m(a), m(b), m(c)) for a, b, c in self.constraints]
        wires = [1] + [self.wire_values[i] for i in pub] + [
            self.wire_values[i] for i in priv
        ]
        return CompiledR1CS(
            constraints=constraints,
            n_public=len(pub),
            n_wires=len(wires),
            abc=list(self.abc),
            wires=wires,
            wire_map=remap,
        )


@dataclass
class CompiledR1CS:
    """R1CS in canonical wire order + the traced solution.

    wires[0] == 1, wires[1..n_public] public, rest private."""

    constraints: list
    n_public: int
    n_wires: int
    abc: list
    wires: list
    wire_map: dict  # original wire id -> canonical index

    def check(self) -> None:
        """Re-evaluate every constraint against the wire vector (a full
        independent solve — the analog of gnark's IsSolved)."""
        z = self.wires

        def ev(lc):
            s = 0
            for w, c in lc:
                s = (s + z[w] * c) % scalar.P
            return s

        for i, (a, b, c) in enumerate(self.constraints):
            av, bv, cv = ev(a), ev(b), ev(c)
            if av * bv % scalar.P != cv:
                raise UnsatisfiedConstraint(f"constraint {i}: {av}*{bv} != {cv}")
