"""Real-TPU bit-equality checks for the Pallas-only paths:

  1. grouped prover (per-lane Pallas eq builds): every lane's proof must
     equal the single-instance proof of that lane's inputs
  2. sharded prover at D=1 (coeff-kernel rounds + psum): transcript must
     equal the unsharded prover's

Run on the TPU host: python scripts/check_tpu_paths.py [bn=12] [g=4]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gkr_mimc_tpu.fields import fr
from gkr_mimc_tpu.gkr import prover as gkr_prover
from gkr_mimc_tpu.models.mimc import assign_fused, mimc_circuit
from gkr_mimc_tpu.utils.common import random_fr_array
from gkr_mimc_tpu.utils.convert import ints_to_rows


def get(x):
    return np.asarray(jax.device_get(x))


def main():
    bn = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = 1 << bn
    c = mimc_circuit()

    # ---- grouped vs single, per lane
    block = fr.from_ints_mont(random_fr_array(g * n)).reshape(fr.L, g, n)
    state = fr.from_ints_mont(
        [x for x in random_fr_array(g * n + 1)[1:]]
    ).reshape(fr.L, g, n)
    qprime = jnp.stack(
        [
            jnp.asarray(ints_to_rows(random_fr_array(bn + gi)[gi:]))
            for gi in range(g)
        ],
        axis=1,
    )  # (bn, G, 16)

    a_g = assign_fused(block, state)
    proof_g = gkr_prover.prove(c, a_g, qprime)

    for gi in range(g):
        a_s = assign_fused(block[:, gi], state[:, gi])
        proof_s = gkr_prover.prove(c, a_s, qprime[:, gi])
        for l in (2, 3, 50, 93):
            pg = get(proof_g.sumcheck_proofs[l].coeffs[:, :, gi])
            ps = get(proof_s.sumcheck_proofs[l].coeffs)
            assert (pg == ps).all(), f"lane {gi} layer {l} coeffs diverge"
            cg = get(proof_g.sumcheck_proofs[l].challenges[:, gi])
            cs = get(proof_s.sumcheck_proofs[l].challenges)
            assert (cg == cs).all(), f"lane {gi} layer {l} challenges diverge"
    print(f"grouped G={g} bn={bn}: all lanes bit-identical to single OK")

    # ---- sharded D=1 vs unsharded
    from gkr_mimc_tpu.parallel import mesh as pmesh

    m = pmesh.make_mesh(1)
    block1 = fr.from_ints_mont(random_fr_array(n))
    state1 = fr.from_ints_mont(random_fr_array(n))
    qp1 = jnp.asarray(ints_to_rows(random_fr_array(bn)))

    a1 = assign_fused(block1, state1)
    ref = gkr_prover.prove(c, a1, qp1)

    bsh = pmesh.shard_table(block1, m)
    ssh = pmesh.shard_table(state1, m)
    ash = pmesh.assign_sharded_mimc(bsh, ssh)
    got = pmesh.prove_gkr_sharded(c, ash, qp1, m)
    for l in (2, 3, 50, 93):
        assert (
            get(got.sumcheck_proofs[l].coeffs)
            == get(ref.sumcheck_proofs[l].coeffs)
        ).all(), f"sharded layer {l} coeffs diverge"
        assert (
            get(got.sumcheck_proofs[l].challenges)
            == get(ref.sumcheck_proofs[l].challenges)
        ).all(), f"sharded layer {l} challenges diverge"
    print(f"sharded D=1 bn={bn}: transcript bit-identical to unsharded OK")


if __name__ == "__main__":
    main()
