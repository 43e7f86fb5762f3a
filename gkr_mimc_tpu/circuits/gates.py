"""Gate zoo for the layered GKR circuit model.

Parity with circuit/gates.go:9-21 plus circuit/gates/{cipher,copy,add,mul}.go.
TPU-native twist: a gate is a *static* type (so jit specializes on it) whose
parameters (e.g. the cipher Ark) are *traced* tensors — all 91 MiMC cipher
layers share one compiled sumcheck/eval kernel instead of retracing per Ark.

The reference's legacy AddGate/MulGate (circuit/gates/add.go:9-43,
circuit/gates/mul.go:9-41) are modernized here to the current interface.
"""

from __future__ import annotations

from ..fields import fr, scalar


class Gate:
    """degree: the gate's degree in hPrime (circuit/gates.go:19-20)."""

    name: str = "Gate"
    degree: int = 1
    arity: int = 2

    def params(self):
        """Traced parameter pytree (passed through jit boundaries)."""
        return ()

    def eval_batch(self, params, xs):
        """xs: list of (16, *S) Montgomery tensors -> (16, *S)."""
        raise NotImplementedError

    def eval_scalar(self, xs):
        """Host oracle on Python ints."""
        raise NotImplementedError

    def gnark_eval(self, cs, xs):
        """Evaluate inside a constraint system (Gate.GnarkEval,
        circuit/gates.go:12-13); xs are snark.cs Variables."""
        raise NotImplementedError

    # jit specialization key: gates of the same type compile once —
    # parameters (e.g. Ark) are traced, so e.g. all 91 cipher layers share
    # one compiled kernel.
    def static_key(self):
        return (type(self).__name__,)

    def __hash__(self):
        return hash(self.static_key())

    def __eq__(self, other):
        return type(other) is type(self) and self.static_key() == other.static_key()


class CipherGate(Gate):
    """(vL + vR + Ark)^7 — one MiMC round (circuit/gates/cipher.go:10-70)."""

    name = "CipherGate"
    degree = 7

    def __init__(self, ark: int):
        self.ark = ark % scalar.P
        self._params = None

    def params(self):
        if self._params is None:
            self._params = (fr.from_int_mont(self.ark),)
        return self._params

    def eval_batch(self, params, xs):
        (ark,) = params
        a = ark.reshape((fr.L,) + (1,) * (xs[0].ndim - 1))
        return fr.pow7(fr.add(fr.add(xs[1], a), xs[0]))

    def eval_scalar(self, xs):
        return scalar.pow7(scalar.add(scalar.add(xs[1], self.ark), xs[0]))

    def gnark_eval(self, cs, xs):
        # (vL + vR + ark)^7, the x^7 as the 4-mul chain of
        # circuit/gates/cipher.go GnarkEval
        t = cs.add(xs[0], xs[1], cs.constant(self.ark))
        tmp = cs.mul(t, t)  # ^2
        tmp = cs.mul(t, tmp)  # ^3
        tmp = cs.mul(tmp, tmp)  # ^6
        return cs.mul(t, tmp)  # ^7


class IdentityGate(Gate):
    """Copies vL; the explicit multi-instance fan-out gate
    (circuit/gates/copy.go:9-32)."""

    name = "IdentityGate"
    degree = 1
    arity = 1

    def eval_batch(self, params, xs):
        return xs[0]

    def eval_scalar(self, xs):
        return xs[0]

    def gnark_eval(self, cs, xs):
        return xs[0]


class AddGate(Gate):
    """vL + vR (modernized from circuit/gates/add.go:9-43)."""

    name = "AddGate"
    degree = 1

    def eval_batch(self, params, xs):
        return fr.add(xs[0], xs[1])

    def eval_scalar(self, xs):
        return scalar.add(xs[0], xs[1])

    def gnark_eval(self, cs, xs):
        return cs.add(xs[0], xs[1])


class MulGate(Gate):
    """vL * vR (modernized from circuit/gates/mul.go:9-41)."""

    name = "MulGate"
    degree = 2

    def eval_batch(self, params, xs):
        return fr.mul(xs[0], xs[1])

    def eval_scalar(self, xs):
        return scalar.mul(xs[0], xs[1])

    def gnark_eval(self, cs, xs):
        return cs.mul(xs[0], xs[1])


class SBoxGate(Gate):
    """vL^7 on a single input — used by the GMiMC/Poseidon GKR circuits
    (no reference analog; those hashes have no circuit in the reference)."""

    name = "SBoxGate"
    degree = 7
    arity = 1

    def eval_batch(self, params, xs):
        return fr.pow7(xs[0])

    def eval_scalar(self, xs):
        return scalar.pow7(xs[0])

    def gnark_eval(self, cs, xs):
        t = xs[0]
        tmp = cs.mul(t, t)
        tmp = cs.mul(t, tmp)
        tmp = cs.mul(tmp, tmp)
        return cs.mul(t, tmp)


class LinearGate(Gate):
    """sum_j c_j * v_j + c_const over k inputs — the MDS-row gate for the
    Poseidon GKR circuit (no reference analog; Poseidon has no circuit in
    the reference, hash/poseidon.go is hash-only). Degree 1 in hPrime."""

    name = "LinearGate"
    degree = 1

    def __init__(self, coeffs: list[int], const: int = 0):
        self.coeffs = [c % scalar.P for c in coeffs]
        self.const = const % scalar.P
        self.arity = len(coeffs)
        self._params = None

    def static_key(self):
        return (type(self).__name__, self.arity, self.const == 0)

    def params(self):
        if self._params is None:
            cs = tuple(fr.from_int_mont(c) for c in self.coeffs)
            if self.const:
                cs = cs + (fr.from_int_mont(self.const),)
            self._params = cs
        return self._params

    def eval_batch(self, params, xs):
        nd = xs[0].ndim - 1
        cs = [p.reshape((fr.L,) + (1,) * nd) for p in params]
        acc = fr.mul(cs[0], xs[0])
        for j in range(1, self.arity):
            acc = fr.add(acc, fr.mul(cs[j], xs[j]))
        if self.const:
            acc = fr.add(acc, cs[self.arity])
        return acc

    def eval_scalar(self, xs):
        acc = self.const
        for c, x in zip(self.coeffs, xs):
            acc = scalar.add(acc, scalar.mul(c, x))
        return acc

    def gnark_eval(self, cs, xs):
        acc = cs.constant(self.const)
        for c, x in zip(self.coeffs, xs):
            acc = cs.add(acc, cs.mul(cs.constant(c), x))
        return acc


class AffineGate(Gate):
    """c0*vL + c1*vR + c2 — general linear-combination gate used to express
    MDS rows / ark additions for Poseidon-style circuits."""

    name = "AffineGate"
    degree = 1

    def __init__(self, c0: int, c1: int, c2: int = 0):
        self.c0, self.c1, self.c2 = c0 % scalar.P, c1 % scalar.P, c2 % scalar.P

    def params(self):
        return (
            fr.from_int_mont(self.c0),
            fr.from_int_mont(self.c1),
            fr.from_int_mont(self.c2),
        )

    def eval_batch(self, params, xs):
        c0, c1, c2 = (p.reshape((fr.L,) + (1,) * (xs[0].ndim - 1)) for p in params)
        t = fr.add(fr.mul(c0, xs[0]), fr.mul(c1, xs[1]))
        return fr.add(t, c2)

    def eval_scalar(self, xs):
        return scalar.add(
            scalar.add(scalar.mul(self.c0, xs[0]), scalar.mul(self.c1, xs[1])),
            self.c2,
        )

    def gnark_eval(self, cs, xs):
        return cs.add(
            cs.mul(cs.constant(self.c0), xs[0]),
            cs.mul(cs.constant(self.c1), xs[1]),
            cs.constant(self.c2),
        )
