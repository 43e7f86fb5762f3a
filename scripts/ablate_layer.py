"""Ablation profile of one bn=20 cipher-layer sumcheck: stub each component
out (value-breaking, timing-preserving) and measure the delta — per-kernel
ground truth that standalone micro timings (inflated by dispatch overhead)
cannot give."""

import os
import sys
import time

os.environ.setdefault("GKR_MONOLITH", "0")  # per-round: cheap recompiles

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


def rand_tab(n, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))


def time_layer(bn, x0, x1, qprimes, claims, reps=3):
    sp._ROUND_JIT_CACHE.clear()
    jax.clear_caches()
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
    n = 1 << bn
    x0, x1 = rand_tab(n, 2), rand_tab(n, 3)
    qprimes = jnp.asarray(
        np.random.default_rng(11).integers(0, 1 << 16, (1, bn, 16), np.uint32)
    )
    claims = rand_tab(1, 13)

    base = time_layer(bn, x0, x1, qprimes, claims)
    print(f"baseline layer: {base*1e3:8.2f} ms", flush=True)

    # --- no hash (stub the FS challenge with coeff column 0)
    orig_hash = sp.mimc_hash_device
    sp.mimc_hash_device = lambda m: m.reshape(fr.L, -1)[:, 0]
    t = time_layer(bn, x0, x1, qprimes, claims)
    sp.mimc_hash_device = orig_hash
    print(f"no-hash layer:  {t*1e3:8.2f} ms  (hash = {(base-t)*1e3:6.2f} ms)",
          flush=True)

    # --- no fold (slice halves, no math)
    orig_fold = K.fold_tables_gm
    K.fold_tables_gm = lambda tables, r, nt, g: [
        t[..., : t.shape[-1] // 2] for t in tables
    ]
    t = time_layer(bn, x0, x1, qprimes, claims)
    K.fold_tables_gm = orig_fold
    print(f"no-fold layer:  {t*1e3:8.2f} ms  (fold = {(base-t)*1e3:6.2f} ms)",
          flush=True)

    # --- no finish (cheap slice of the accumulator, so the PE kernel that
    # produces it is NOT dead-code-eliminated)
    orig_fin = K.finish_coeff_acc
    K.finish_coeff_acc = lambda acc, nr, d: jnp.transpose(
        acc[:, 0, : fr.L, : d + 2], (1, 2, 0)
    )
    t = time_layer(bn, x0, x1, qprimes, claims)
    K.finish_coeff_acc = orig_fin
    print(f"no-finish layer:{t*1e3:8.2f} ms  (finish = {(base-t)*1e3:6.2f} ms)",
          flush=True)

    # --- no PE (constant accumulator)
    orig_pe = K.cipher_coeff_acc
    K.cipher_coeff_acc = lambda eq, a, b, ark, g: jnp.ones(
        (g, 4, 64, 256), jnp.uint32
    )
    t = time_layer(bn, x0, x1, qprimes, claims)
    K.cipher_coeff_acc = orig_pe
    print(f"no-PE layer:    {t*1e3:8.2f} ms  (PE = {(base-t)*1e3:6.2f} ms)",
          flush=True)

    # --- no eq build (reuse x0 as the eq table)
    orig_eq = sp._make_eq_jit
    sp._make_eq_jit = lambda qp, cl: x0
    t = time_layer(bn, x0, x1, qprimes, claims)
    sp._make_eq_jit = orig_eq
    print(f"no-eq layer:    {t*1e3:8.2f} ms  (eq = {(base-t)*1e3:6.2f} ms)",
          flush=True)

    # --- no tail (head rounds only): raise PALLAS_MIN floor via TAIL stub
    orig_tail = sp._tail_jit_keep

    def fake_tail(gate, gp, eq, xs):
        tb = eq.shape[-1].bit_length() - 1
        ne = gate.degree + 2
        return (
            jnp.ones((tb, fr.L, ne), jnp.uint32),
            jnp.ones((tb, fr.L), jnp.uint32),
            jnp.ones((1 + len(xs), fr.L), jnp.uint32),
        )

    sp._tail_jit_keep = fake_tail
    sp._tail_jit_donate = fake_tail
    t = time_layer(bn, x0, x1, qprimes, claims)
    sp._tail_jit_keep = orig_tail
    print(f"no-tail layer:  {t*1e3:8.2f} ms  (tail = {(base-t)*1e3:6.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
