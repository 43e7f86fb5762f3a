"""GMiMC sponge-width hashers (t in {2,4,8}), Miyaguchi-Preneel.

Semantics parity with the reference hash/gmimc.go:8-74: each round adds
(block[i] + Ark[r]) to every state word, applies the x^7 S-box to word 0,
then rotates the state left by one.
"""

from __future__ import annotations

import jax

from ..fields import fr, scalar
from .ark import ARKS_INT, arks_scan_tensor


class GMimcHasher:
    def __init__(self, t: int, n_rounds: int = 91):
        self.t = t
        self.n_rounds = n_rounds

    # -- scalar (host oracle) ------------------------------------------------

    def update(self, state: list[int], block: list[int]) -> list[int]:
        old = list(state)
        s = list(state)
        for r in range(self.n_rounds):
            s = [scalar.add(scalar.add(x, block[i]), ARKS_INT[r]) for i, x in enumerate(s)]
            s[0] = scalar.pow7(s[0])
            s = s[1:] + s[:1]
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
        """state/block: lists of t (16, *S) Montgomery tensors."""
        batch_ndim = state[0].ndim - 1
        arks = arks_scan_tensor(self.n_rounds)

        import jax.numpy as jnp

        def body(carry, ark):
            s = list(carry)
            a = ark.reshape((fr.L,) + (1,) * batch_ndim)
            s = [fr.add(fr.add(x, block[i]), a) for i, x in enumerate(s)]
            s[0] = fr.pow7(s[0])
            s = s[1:] + s[:1]
            return tuple(s), None

        out, _ = jax.lax.scan(body, tuple(state), arks)
        return [fr.add(fr.add(x, state[i]), block[i]) for i, x in enumerate(out)]

    def hash_batch(self, msgs):
        """msgs: (16, K, N) -> (16, N), N independent K-element messages."""
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


GMIMC_T2 = GMimcHasher(2)
GMIMC_T4 = GMimcHasher(4)
GMIMC_T8 = GMimcHasher(8)
