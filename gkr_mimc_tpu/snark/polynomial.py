"""In-circuit polynomial gadgets (snark/polynomial/* mirrors).

MultiLin: a table of Variables with Fold/Eval — each Eval costs O(2^bN)
constraints, the dominant in-circuit cost (snark/polynomial/
multilinear.go:40-66). Univariate: Horner Eval + ZeroAndOne
(univariate.go:35-54). Eq: product form (eq.go:9-25).
"""

from __future__ import annotations

from .cs import ConstraintSystem, Variable


class MultiLin(list):
    """snark/polynomial/multilinear.go:11-66."""

    @classmethod
    def from_ints(cls, cs: ConstraintSystem, values: list[int]) -> "MultiLin":
        return cls(cs.witness(v) for v in values)

    def fold(self, cs: ConstraintSystem, x: Variable) -> None:
        k = len(self) // 2
        for i in range(k):
            tmp = cs.sub(self[i + k], self[i])
            self[i] = cs.add(self[i], cs.mul(tmp, x))
        del self[k:]

    def eval(self, cs: ConstraintSystem, xs: list[Variable]) -> Variable:
        f = MultiLin(self)
        for x in xs:
            f.fold(cs, x)
        return f[0]


class Univariate(list):
    """snark/polynomial/univariate.go:10-54; coefficient form a0..ad."""

    @classmethod
    def from_ints(cls, cs: ConstraintSystem, coeffs: list[int]) -> "Univariate":
        return cls(cs.witness(c) for c in coeffs)

    def eval(self, cs: ConstraintSystem, x: Variable) -> Variable:
        res = cs.constant(0)
        aux = cs.constant(0)
        for i in range(len(self) - 1, -1, -1):
            if i != len(self) - 1:
                res = cs.mul(aux, x)
            aux = cs.add(res, self[i])
        return aux

    def zero_and_one(self, cs: ConstraintSystem) -> Variable:
        """p(0) + p(1) = 2*a0 + a1 + ... + ad as one Add
        (univariate.go:51-54)."""
        return cs.add(self[0], self[0], *self[1:])


def univariate_eq_eval(cs: ConstraintSystem, q, h) -> Variable:
    """1 - q - h + 2qh (snark/polynomial/eq.go:9-16)."""
    res = cs.sub(cs.constant(1), q)
    res = cs.sub(res, h)
    return cs.add(res, cs.mul(cs.constant(2), cs.mul(q, h)))


def eq_eval(cs: ConstraintSystem, qprime: list, hprime: list) -> Variable:
    """Eq(q', h') = prod univariate factors (eq.go:18-25)."""
    res = cs.constant(1)
    for q, h in zip(qprime, hprime):
        res = cs.mul(res, univariate_eq_eval(cs, q, h))
    return res
