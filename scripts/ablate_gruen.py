"""In-program ablation of one bn=20 Gruen cipher-layer sumcheck: stub each
component out (value-breaking, timing-preserving) and measure the delta.
Ground truth for round-4 optimization priorities."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.ops import kernels as K
from gkr_mimc_tpu.sumcheck import prover as sp
from gkr_mimc_tpu.circuits.gates import CipherGate


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(leaves[0]))


def rand_tab(shape, seed):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 1 << 16, size=shape, dtype=np.uint32)
    if shape[0] == 16:
        t[15] &= 0x1FFF
    else:
        t[..., 15] &= 0x1FFF
    return jnp.asarray(t)


def time_layer(bn, reps=3):
    jax.clear_caches()
    n = 1 << bn
    x0, x1 = rand_tab((16, n), 2), rand_tab((16, n), 3)
    qprimes = rand_tab((1, bn, 16), 11)
    claims = rand_tab((16, 1), 13)
    gate = CipherGate(145646)

    def layer():
        p, c, f = sp._prove_rounds(gate, gate.params(), [x0, x1], qprimes, claims)
        return p

    force(layer())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = layer()
    force(out)
    return (time.perf_counter() - t0) / reps


def main():
    bn = int(os.environ.get("MBN", "20"))
    base = time_layer(bn)
    print(f"whole layer            : {base*1e3:7.1f} ms")

    # --- stub the gruen PE kernel (keep shapes/dataflow)
    orig_acc = K.cipher_gruen_acc

    def fake_acc(s, x0, x1, ark, g):
        z = jnp.zeros((g, 4, 32, 512), jnp.uint32)
        # keep a data dependency on the inputs so nothing is DCE'd
        z = z.at[0, 0, 0, 0].set(x0[0, 0] ^ x1[0, 0] ^ s[0, 0])
        return z

    K.cipher_gruen_acc = fake_acc
    t = time_layer(bn)
    print(f"- gruen_acc kernel     : {t*1e3:7.1f} ms  (PE = {(base-t)*1e3:5.1f})")
    K.cipher_gruen_acc = orig_acc

    # --- stub finish (tiny, should be ~0)
    orig_fin = K.finish_gruen_acc
    K.finish_gruen_acc = jax.jit(
        lambda acc: jnp.swapaxes(acc[:, 0, :16, :8].transpose(2, 1, 0), 0, 1)
    )
    t = time_layer(bn)
    print(f"- finish               : {t*1e3:7.1f} ms  (finish = {(base-t)*1e3:5.1f})")
    K.finish_gruen_acc = orig_fin

    # --- stub fold (return halves)
    orig_fold = K.fold_tables_gm

    def fake_fold(tables, r, nt, g):
        outs = []
        for tbl in tables:
            half = tbl[:, : tbl.shape[-1] // 2]
            outs.append(half ^ jnp.broadcast_to(r.reshape(fr.L, -1)[:, :1], half.shape))
        return outs

    K.fold_tables_gm = fake_fold
    t = time_layer(bn)
    print(f"- fold                 : {t*1e3:7.1f} ms  (fold = {(base-t)*1e3:5.1f})")
    K.fold_tables_gm = orig_fold

    # --- stub the FS hash (constant challenge with a data dep)
    from gkr_mimc_tpu.hashes import mimc as hm

    orig_hash = hm.mimc_hash_device

    def fake_hash(msgs):
        red = jnp.max(msgs.astype(jnp.int32), axis=1).astype(jnp.uint32)
        return (red & jnp.uint32(0x1FFF)) | jnp.uint32(1)

    hm.mimc_hash_device = fake_hash
    sp.mimc_hash_device = fake_hash
    t = time_layer(bn)
    print(f"- FS hash              : {t*1e3:7.1f} ms  (FS = {(base-t)*1e3:5.1f})")
    hm.mimc_hash_device = orig_hash
    sp.mimc_hash_device = orig_hash

    # --- stub the suffix build (constant tables with a data dep)
    orig_suffix = sp._suffix_tables

    def fake_suffix(q, n_head):
        bnq = q.shape[0]
        seed = jnp.max(q.astype(jnp.int32)).astype(jnp.uint32) & jnp.uint32(0xFFF)
        out = []
        for k in range(n_head):
            size = 1 << (bnq - 1 - k)
            out.append(jnp.full((fr.L, size), 3, jnp.uint32).at[0, 0].set(seed))
        return out

    sp._suffix_tables = fake_suffix
    t = time_layer(bn)
    print(f"- suffix build         : {t*1e3:7.1f} ms  (suffix = {(base-t)*1e3:5.1f})")
    sp._suffix_tables = orig_suffix

    # --- stub the tail (skip everything below 2^tail_bits)
    orig_tail = sp._tail_body

    def fake_tail(gate, gate_params, eq, xs):
        tb = eq.shape[-1].bit_length() - 1
        coeffs = jnp.zeros((tb, fr.L, gate.degree + 2), jnp.uint32).at[0, 0, 0].set(
            eq[0, 0] ^ xs[0][0, 0]
        )
        rs = jnp.zeros((tb, fr.L), jnp.uint32).at[0, 0].set(eq[0, 0])
        fc_ = jnp.zeros((len(xs) + 1, fr.L), jnp.uint32)
        return coeffs, rs, fc_

    sp._tail_body = fake_tail
    t = time_layer(bn)
    print(f"- tail                 : {t*1e3:7.1f} ms  (tail = {(base-t)*1e3:5.1f})")
    sp._tail_body = orig_tail


if __name__ == "__main__":
    main()
