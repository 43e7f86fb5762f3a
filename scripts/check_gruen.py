"""Bit-equality check: the Gruen-factored cipher sumcheck vs the direct
coefficient path, plus timing at bn=20. Run on the TPU host."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.circuits.gates import CipherGate
from gkr_mimc_tpu.sumcheck import prover as sp


def get(x):
    return np.asarray(jax.device_get(x))


def rand_tab(shape, seed):
    """Random VALID field elements (top limb masked so value < p) —
    arbitrary 256-bit limbs would violate the lazy-rep precondition and
    produce op-order-dependent garbage."""
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 1 << 16, size=shape, dtype=np.uint32)
    lrow = 15 if shape[0] == 16 else None
    if lrow is not None:
        t[15] &= 0x1FFF
    else:
        t[..., 15] &= 0x1FFF
    return jnp.asarray(t)


def run(bn, grouped_g=None, gruen=True):
    n = 1 << bn
    shape = (16, grouped_g, n) if grouped_g else (16, n)
    x0, x1 = rand_tab(shape, 2), rand_tab(shape, 3)
    if grouped_g:
        qprimes = rand_tab((1, bn, grouped_g, 16), 11)
        claims = rand_tab((16, 1, grouped_g), 13)
    else:
        qprimes = rand_tab((1, bn, 16), 11)
        claims = rand_tab((16, 1), 13)
    gate = CipherGate(145646)
    os.environ["GKR_GRUEN"] = "1" if gruen else "0"
    p, c, f = sp._prove_rounds(gate, gate.params(), [x0, x1], qprimes, claims)
    return get(p), get(c), get(f)


def main():
    for bn in (10, 12):
        for g in (None, 2):
            a = run(bn, g, gruen=True)
            b = run(bn, g, gruen=False)
            for name, x, y in zip(("coeffs", "chals", "final"), a, b):
                assert (x == y).all(), f"bn={bn} g={g} {name} diverge"
            print(f"bn={bn} g={g}: gruen == direct (bit-exact)")

    # timing at bn=20 (single)
    bn = 20
    n = 1 << bn
    x0, x1 = rand_tab((16, n), 2), rand_tab((16, n), 3)
    qprimes = rand_tab((1, bn, 16), 11)
    claims = rand_tab((16, 1), 13)
    gate = CipherGate(145646)
    for gruen in (False, True):
        os.environ["GKR_GRUEN"] = "1" if gruen else "0"

        def layer():
            p, c, f = sp._prove_rounds(
                gate, gate.params(), [x0, x1], qprimes, claims
            )
            return p

        get(layer())
        t0 = time.perf_counter()
        for _ in range(3):
            out = layer()
        get(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"bn=20 layer ({'gruen' if gruen else 'direct'}): {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
