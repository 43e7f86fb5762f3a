"""MiMC (91 rounds, x^7 S-box, Miyaguchi-Preneel) over BN254 fr.

Semantics parity with the reference hash/mimc.go:8-49:
  * keyed permutation: res = x; 91x: res = (res + key + Ark[i])^7
  * block cipher:      E_k(x) = Perm_k(x) + k
  * hash update:       state' = state + E_state(block) + block
  * MimcHash: chain updates from state 0.

MimcHash doubles as the Fiat-Shamir challenge function
(common/challenge.go:10-12), so the device version below runs *inside* the
sumcheck jit: transcript hashing never leaves the TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields import fr, scalar
from .ark import ARKS_INT, arks_scan_tensor

MIMC_ROUNDS = 91

# ---------------------------------------------------------------------------
# Scalar (host oracle)
# ---------------------------------------------------------------------------


def mimc_keyed_permutation(x: int, key: int) -> int:
    res = x
    for i in range(MIMC_ROUNDS):
        res = scalar.pow7(scalar.add(scalar.add(res, key), ARKS_INT[i]))
    return res


def mimc_block_cipher(msg: int, key: int) -> int:
    return scalar.add(mimc_keyed_permutation(msg, key), key)


def mimc_update(state: int, block: int) -> int:
    new_state = mimc_block_cipher(block, state)
    return scalar.add(scalar.add(state, new_state), block)


def mimc_hash(inputs: list[int]) -> int:
    state = 0
    for x in inputs:
        state = mimc_update(state, x)
    return state


# ---------------------------------------------------------------------------
# Device (batched / in-jit)
# ---------------------------------------------------------------------------


def mimc_keyed_permutation_device(x, key):
    """Batched keyed permutation: x, key are (16, *S) Montgomery tensors.

    The 91 rounds run as a `lax.scan` over the Ark constants so the jitted
    graph stays small; each round body is one fused (add, add, x^7) kernel.
    """
    batch_ndim = x.ndim - 1
    arks = arks_scan_tensor(MIMC_ROUNDS)

    def body(res, ark):
        a = ark.reshape((fr.L,) + (1,) * batch_ndim)
        t = fr.add(fr.add(res, key), a)
        return fr.pow7(t), None

    res, _ = jax.lax.scan(body, x, arks)
    return res


def mimc_update_device(state, block):
    """One Miyaguchi-Preneel update: state' = Perm_state(block) + 2*state + block."""
    perm = mimc_keyed_permutation_device(block, state)
    return fr.add(fr.add(perm, fr.add(state, state)), block)


def mimc_hash_device(msgs):
    """Transcript hash of K field elements, msgs shape (16, K) -> (16,).

    This hash sits on the sumcheck's per-round critical path (the
    Fiat-Shamir challenge, common/challenge.go:10-12). On TPU it runs as a
    Pallas kernel with the 91*K-step chain on the sequential grid
    (ops/kernels.py mimc_hash_fs) — as a plain XLA scan the sequential
    tiny-op chain costs ~35-40ms per hash, which dominated the bn=20 walk.
    The portable path is the nested scan (outer over the K message words,
    inner over the 91 rounds).
    """
    import os

    from ..ops import kernels as K

    # NB: GKR_FS_KERNEL (like all kernel env knobs) is read at TRACE time;
    # programs are cached per shape, so flipping it mid-process does not
    # retrace — A/B it across separate processes (tests/test_hotpath.py).
    if K.pallas_enabled() and os.environ.get("GKR_FS_KERNEL", "1") == "1":
        if msgs.ndim == 3:  # grouped: (16, K, G) -> (16, G)
            return K.mimc_hash_fs_g(msgs)
        return K.mimc_hash_fs(msgs)

    blocks = jnp.moveaxis(msgs, 1, 0)  # (K, 16[, G])

    def upd(state, block):
        return mimc_update_device(state, block), None

    state, _ = jax.lax.scan(upd, fr.zeros(msgs.shape[2:]), blocks)
    return state


def mimc_hash_batch(msgs):
    """Row-parallel MimcHash over a batch: msgs (16, K, N) -> (16, N).

    Hashes N independent K-element messages (the analog of firing the
    reference's per-hash HashHint over a whole batch at once,
    prover/gadget/hints.go:135-145). On TPU the batch rides the grouped
    Pallas FS kernel (N lockstep lanes — the 91*K-round chain is ONE
    kernel instead of a 91*K-step XLA scan of portable field ops, which
    dominated the verifier's hot path); the portable path is the scan.
    """
    from ..ops import kernels as K

    n = msgs.shape[2]
    # cap lanes per kernel call: the (16, N) state block must fit VMEM
    if K.pallas_enabled() and 0 < n <= 8192:
        # lane-pad to a vreg multiple; extra lanes hash garbage, dropped
        pad = (-n) % 128
        if pad:
            msgs_p = jnp.pad(msgs, ((0, 0), (0, 0), (0, pad)))
            return K.mimc_hash_fs_g(msgs_p)[:, :n]
        return K.mimc_hash_fs_g(msgs)
    if K.pallas_enabled() and n > 8192:
        parts = [
            mimc_hash_batch(msgs[:, :, i : i + 8192])
            for i in range(0, n, 8192)
        ]
        return jnp.concatenate(parts, axis=-1)

    blocks = jnp.moveaxis(msgs, 1, 0)  # (K, 16, N)

    def upd(state, block):
        return mimc_update_device(state, block), None

    state, _ = jax.lax.scan(upd, fr.zeros(msgs.shape[2:]), blocks)
    return state
