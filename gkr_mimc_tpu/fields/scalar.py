"""Host-side (Python int) BN254 fr arithmetic.

This is the slow, obviously-correct oracle used by the verifier, the test
suite, and the host-side protocol bookkeeping. It mirrors the semantics of
gnark-crypto's `fr.Element` (reference: the external dependency used from
e.g. /root/reference/hash/mimc.go:4) at the level of *values* — the TPU
prover must agree with these numbers bit-exactly.
"""

from .bn254 import P


def add(a: int, b: int) -> int:
    s = a + b
    return s - P if s >= P else s


def sub(a: int, b: int) -> int:
    d = a - b
    return d + P if d < 0 else d


def neg(a: int) -> int:
    return (P - a) % P


def mul(a: int, b: int) -> int:
    return a * b % P


def square(a: int) -> int:
    return a * a % P


def inverse(a: int) -> int:
    return pow(a, -1, P)


def pow7(a: int) -> int:
    """x^7 with the same op chain as the reference S-box.

    Reference: hash/poseidon.go:129-135 (SBoxInplace: sq, mul, sq, mul).
    Value-identical to pow(a, 7, P).
    """
    return pow(a, 7, P)


def from_uint64(x: int) -> int:
    """gnark fr.Element.SetUint64 semantics (value mod p)."""
    return x % P
