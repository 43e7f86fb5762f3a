"""Poseidon hashers (t in {2,4,8}), Cauchy MDS, Miyaguchi-Preneel.

Semantics: RF=8 leading full rounds, RP partial rounds (82/83/84), RF
trailing full rounds; every round adds (block[i] + Ark[r]) to each word,
S-boxes (all words / word 0), then multiplies by the Cauchy matrix
1/(x_i + y_j) — the algorithm hash/poseidon.go:18-157 *intends*.

KNOWN PARITY DIVERGENCE from the Go reference's caller-visible values:
`MatrixMultiplication` returns a NEW slice, so the reference's
`PoseidonHasher.Update` (hash/poseidon.go:68-97) rebinds its local
`state` variable after the first MDS multiply — every later round and
the final Miyaguchi-Preneel recombination write into that new slice,
never the caller's array. `Hash` (hash/poseidon.go:43-63) then reads
`state[0]` from ITS array, which only saw the first round's in-place
ark/S-box — a Go aliasing accident, not a protocol choice. This module
implements the intended Miyaguchi-Preneel construction, so `hash()`
outputs differ from the Go binary's. Nothing downstream is affected:
Poseidon never feeds a transcript (the Fiat-Shamir hash is MiMC,
common/challenge.go:10-12) and the reference has no Poseidon GKR
circuit. The GKR-circuit parity target (models/poseidon.py) is the
*permutation*, which both implementations agree on.
"""

from __future__ import annotations

import jax

from ..fields import fr, scalar
from .ark import ARKS_INT, XARR_INT, YARR_INT, arks_scan_tensor


def generate_mds_matrix(t: int) -> list[list[int]]:
    return [
        [scalar.inverse(scalar.add(XARR_INT[i], YARR_INT[j])) for j in range(t)]
        for i in range(t)
    ]


class PoseidonHasher:
    def __init__(self, t: int, n_rounds_f: int, n_rounds_p: int):
        self.t = t
        self.n_rounds_f = n_rounds_f
        self.n_rounds_p = n_rounds_p
        self.cauchy = generate_mds_matrix(t)

    # -- scalar (host oracle) ------------------------------------------------

    def _matmul(self, vec):
        return [
            sum(scalar.mul(self.cauchy[i][j], vec[j]) for j in range(self.t)) % scalar.P
            for i in range(self.t)
        ]

    def update(self, state: list[int], block: list[int]) -> list[int]:
        old = list(state)
        s = list(state)
        rf, rp = self.n_rounds_f, self.n_rounds_p
        for r in range(2 * rf + rp):
            s = [scalar.add(scalar.add(x, block[i]), ARKS_INT[r]) for i, x in enumerate(s)]
            if rf <= r < rf + rp:
                s[0] = scalar.pow7(s[0])
            else:
                s = [scalar.pow7(x) for x in s]
            s = self._matmul(s)
        return [scalar.add(scalar.add(x, old[i]), block[i]) for i, x in enumerate(s)]

    def hash(self, msg: list[int]) -> int:
        state = [0] * self.t
        i = 0
        while True:
            block = [0] * self.t
            for j, w in enumerate(msg[i : i + self.t]):
                block[j] = w
            state = self.update(state, block)
            i += self.t
            if i >= len(msg):
                break
        return state[0]

    # -- device (batched) ----------------------------------------------------

    def update_device(self, state, block):
        """state/block: lists of t (16, *S) Montgomery tensors.

        The full/partial round split is data-independent, so the three phases
        are three scans; the MDS multiply is t^2 field mults (t <= 8, so this
        stays a small fused kernel rather than an MXU matmul — the batch axis
        is where the parallelism is).
        """
        batch_ndim = state[0].ndim - 1
        rf, rp = self.n_rounds_f, self.n_rounds_p
        arks = arks_scan_tensor(2 * rf + rp)
        mds = [
            [fr.const_mont(self.cauchy[i][j], batch_ndim) for j in range(self.t)]
            for i in range(self.t)
        ]

        def mds_mul(s):
            out = []
            for i in range(self.t):
                acc = fr.mul(mds[i][0], s[0])
                for j in range(1, self.t):
                    acc = fr.add(acc, fr.mul(mds[i][j], s[j]))
                out.append(acc)
            return out

        def make_body(partial):
            def body(carry, ark):
                s = list(carry)
                a = ark.reshape((fr.L,) + (1,) * batch_ndim)
                s = [fr.add(fr.add(x, block[i]), a) for i, x in enumerate(s)]
                if partial:
                    s[0] = fr.pow7(s[0])
                else:
                    s = [fr.pow7(x) for x in s]
                return tuple(mds_mul(s)), None

            return body

        s = tuple(state)
        s, _ = jax.lax.scan(make_body(False), s, arks[:rf])
        s, _ = jax.lax.scan(make_body(True), s, arks[rf : rf + rp])
        s, _ = jax.lax.scan(make_body(False), s, arks[rf + rp :])
        return [fr.add(fr.add(x, state[i]), block[i]) for i, x in enumerate(s)]

    def hash_batch(self, msgs):
        """msgs: (16, K, N) -> (16, N)."""
        k = msgs.shape[1]
        state = [fr.zeros(msgs.shape[2:]) for _ in range(self.t)]
        i = 0
        while True:
            block = [
                msgs[:, i + j] if i + j < k else fr.zeros(msgs.shape[2:])
                for j in range(self.t)
            ]
            state = self.update_device(state, block)
            i += self.t
            if i >= k:
                break
        return state[0]


POSEIDON_T2 = PoseidonHasher(2, 8, 82)
POSEIDON_T4 = PoseidonHasher(4, 8, 83)
POSEIDON_T8 = PoseidonHasher(8, 8, 84)
