"""Correctness: coefficient-form PE (cipher_coeff_acc + finish_coeff_acc)
vs the portable evaluate-then-interpolate path, per group lane.

INTERP=1 (default): interpret-mode pallas on CPU. INTERP=0: compiled TPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERPRET = os.environ.get("INTERP", "1") == "1"
if INTERPRET:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from gkr_mimc_tpu.circuits.gates import CipherGate, IdentityGate
from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.poly import lagrange
from gkr_mimc_tpu.ops import kernels as K
from gkr_mimc_tpu.sumcheck.prover import _partial_evals

if INTERPRET:
    # route every pallas_call through the interpreter
    import jax.experimental.pallas as pl

    _orig = pl.pallas_call

    def _interp_call(*a, **kw):
        kw.setdefault("interpret", True)
        return _orig(*a, **kw)

    pl.pallas_call = _interp_call
    K.pl.pallas_call = _interp_call


def rand_mont(n, seed):
    rng = np.random.default_rng(seed)
    from gkr_mimc_tpu.fields.bn254 import P, int_to_limbs

    vals = [rng.integers(0, 1 << 62).item() * rng.integers(0, 1 << 62).item() % P
            for _ in range(n)]
    return jnp.asarray(np.stack([int_to_limbs(v) for v in vals], 1).astype(np.uint32))


def main():
    g, bn = 2, 9
    n = 1 << bn
    gate = CipherGate(145646)
    eq = rand_mont(g * n, 1)
    x0 = rand_mont(g * n, 2)
    x1 = rand_mont(g * n, 3)
    ark = jnp.broadcast_to(gate.params()[0].reshape(fr.L, 1), (fr.L, g))

    acc = K.cipher_coeff_acc(eq, x0, x1, ark, g)
    coeffs = K.finish_coeff_acc(acc, 8, 7)  # (16, 9, G)

    ok = True
    for gi in range(g):
        sl = slice(gi * n, (gi + 1) * n)
        evals = _partial_evals(gate, gate.params(), eq[:, sl], [x0[:, sl], x1[:, sl]])
        want = lagrange.interpolate_on_range_device(evals)  # (16, 9)
        got = coeffs[:, :, gi]
        same = bool(jnp.all(fr.canonicalize(got) == fr.canonicalize(want)))
        print(f"cipher group {gi}: {'OK' if same else 'MISMATCH'}")
        ok &= same

    acc = K.identity_coeff_acc(eq, x0, g)
    coeffs = K.finish_coeff_acc(acc, 2, 1)
    igate = IdentityGate()
    for gi in range(g):
        sl = slice(gi * n, (gi + 1) * n)
        evals = _partial_evals(igate, igate.params(), eq[:, sl], [x0[:, sl]])
        want = lagrange.interpolate_on_range_device(evals)
        got = coeffs[:, :, gi]
        same = bool(jnp.all(fr.canonicalize(got) == fr.canonicalize(want)))
        print(f"identity group {gi}: {'OK' if same else 'MISMATCH'}")
        ok &= same

    print("ALL OK" if ok else "FAILED")


if __name__ == "__main__":
    main()
