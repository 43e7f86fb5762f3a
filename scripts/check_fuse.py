"""TPU parity check: GKR_GRUEN_FUSE=1 (fused round-scalar kernel) must
produce bit-identical sumcheck transcripts to the unfused path."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gkr_mimc_tpu_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.ops import kernels as K
from gkr_mimc_tpu.sumcheck import prover as sp
from gkr_mimc_tpu.circuits.gates import CipherGate
from gkr_mimc_tpu.utils.common import random_fr_array
from gkr_mimc_tpu.utils.convert import ints_to_rows


def get(x):
    return np.asarray(jax.device_get(x))


def run(bn, g, fuse):
    os.environ["GKR_GRUEN_FUSE"] = "1" if fuse else "0"
    sp._prove_gruen_jit = jax.jit(sp._prove_gruen_body, static_argnums=(0,))
    n = 1 << bn
    gate = CipherGate(145646)
    if g == 0:
        xs = [
            fr.from_ints_mont(random_fr_array(n)),
            fr.from_ints_mont(random_fr_array(n + 1)[1:]),
        ]
        qp = jnp.asarray(ints_to_rows(random_fr_array(bn)))[None]
        claims = fr.from_ints_mont(random_fr_array(1)).reshape(fr.L, 1)
    else:
        xs = [
            fr.from_ints_mont(random_fr_array(g * n)).reshape(fr.L, g, n),
            fr.from_ints_mont(random_fr_array(g * n + 1)[1:]).reshape(fr.L, g, n),
        ]
        qp = jnp.stack(
            [jnp.asarray(ints_to_rows(random_fr_array(bn + j)[j:]))
             for j in range(g)],
            axis=1,
        )[None]
        claims = fr.from_ints_mont(random_fr_array(g)).reshape(fr.L, 1, g)
    return sp.prove(xs, qp, claims, gate)


def main():
    bn = int(os.environ.get("MBN", "14"))
    for g in (0, 2):
        a = run(bn, g, False)
        b = run(bn, g, True)
        for name, x, y in (
            ("coeffs", a.coeffs, b.coeffs),
            ("challenges", a.challenges, b.challenges),
            ("final_claims", a.final_claims, b.final_claims),
        ):
            ga, gb = get(x), get(y)
            assert ga.shape == gb.shape, (name, ga.shape, gb.shape)
            assert (ga == gb).all(), f"fused mismatch: {name} g={g}"
        print(f"bn={bn} g={g or 1}: fused == unfused (bit-exact)", flush=True)


if __name__ == "__main__":
    main()
