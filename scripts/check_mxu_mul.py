"""Correctness check for fieldcore.mul_mxu vs the portable fr.mul.

Runs the kernel in interpret mode (CPU) or compiled (TPU) and compares
values against fields/fr.py on random lazy representatives.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.fields.bn254 import L, P, RINV, limbs_to_int, int_to_limbs
from gkr_mimc_tpu.ops import fieldcore as fc

B = 256


def kern(m1_ref, m2_ref, a_ref, b_ref, o_ref, o2_ref, o3_ref):
    m1, m2 = m1_ref[:], m2_ref[:]
    o_ref[:] = fc.mul_mxu(a_ref[:], b_ref[:], m1, m2)
    o2_ref[:] = fc.square_mxu(a_ref[:], m1, m2)
    o3_ref[:] = fc.pow7_mxu(a_ref[:], m1, m2)


@jax.jit
def run(a, b):
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((L, B), jnp.uint32)] * 3,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        interpret=INTERPRET,
    )(jnp.asarray(fc.REDC_M1), jnp.asarray(fc.REDC_M2), a, b)


def main():
    rng = np.random.default_rng(42)
    # lazy representatives in [0, 2p)
    av = [rng.integers(0, 1 << 62).item() * rng.integers(0, 1 << 62).item() % (2 * P) for _ in range(B)]
    bv = [rng.integers(0, 1 << 62).item() * rng.integers(0, 1 << 62).item() % (2 * P) for _ in range(B)]
    # include edge cases
    av[:4] = [0, 1, P - 1, 2 * P - 1]
    bv[:4] = [2 * P - 1, P, 1, 2 * P - 1]
    a = jnp.asarray(np.stack([int_to_limbs(x) for x in av], axis=1).astype(np.uint32))
    b = jnp.asarray(np.stack([int_to_limbs(x) for x in bv], axis=1).astype(np.uint32))

    o, o2, o3 = run(a, b)
    o, o2, o3 = np.asarray(o), np.asarray(o2), np.asarray(o3)
    bad = 0
    for i in range(B):
        got = limbs_to_int(o[:, i])
        want = av[i] * bv[i] * RINV % P
        if got % P != want or got >= 2 * P:
            bad += 1
            if bad < 5:
                print(f"MUL MISMATCH i={i}: got {got % P} want {want} (raw {got}, 2p={2*P})")
        got2 = limbs_to_int(o2[:, i])
        want2 = av[i] * av[i] * RINV % P
        if got2 % P != want2 or got2 >= 2 * P:
            bad += 1
            if bad < 5:
                print(f"SQ  MISMATCH i={i}: got {got2 % P} want {want2}")
        got3 = limbs_to_int(o3[:, i])
        # pow7 in Montgomery: x^7 * R^-6... value check via Montgomery decode
        xv = av[i] * RINV % P
        want3 = pow(xv, 7, P) * (1 << 256) % P
        if got3 % P != want3 or got3 >= 2 * P:
            bad += 1
            if bad < 5:
                print(f"POW7 MISMATCH i={i}: got {got3 % P} want {want3}")
    print("OK" if bad == 0 else f"FAILED: {bad} mismatches")


if __name__ == "__main__":
    main()
