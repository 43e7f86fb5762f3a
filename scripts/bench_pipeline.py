"""Full-SNARK pipeline bench: Compile -> Setup -> Solve/Prove -> Verify at
N hashes (the reference benches this at N=2^18..2^24,
prover/gadget/performances_test.go:17-27; the constraint-count story is
printed by snark/gkr/gkr_test.go:123-124).

Usage: python scripts/bench_pipeline.py [log2_n=10]

Prints per-phase wall times, total constraints, constraints-per-hash, and
the 91*N direct-MiMC baseline the GKR gadget displaces; writes
PIPELINE.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gkr_mimc_tpu_jax_cache")

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize clobbers the env var; force via config
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gkr_mimc_tpu.gadget import incircuit
from gkr_mimc_tpu.gadget.incircuit import GadgetCircuit, setup
from gkr_mimc_tpu.gadget import groth16 as groth16_mod
from gkr_mimc_tpu.utils.common import random_fr_array


def main():
    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n = 1 << log2_n
    msgs = random_fr_array(n)

    def define(cs, gadget):
        states = [cs.witness(0) for _ in range(n)]
        gadget.update_hasher_batch(cs, states, [cs.witness(m) for m in msgs])

    circ = GadgetCircuit(define)

    t0 = time.time()
    compiled = circ.compile()
    t_compile = time.time() - t0
    n_constraints = len(compiled.r1cs.constraints)
    print(f"compile: {t_compile:.1f}s, {n_constraints} constraints "
          f"({n_constraints / n:.1f}/hash vs 91*N={91 * n} direct), "
          f"{compiled.r1cs.n_wires} wires, bn={compiled.bn}", flush=True)

    t0 = time.time()
    pk, vk = setup(compiled, seed=b"pipeline-bench")  # DummySetup analog
    t_setup = time.time() - t0
    print(f"setup:   {t_setup:.1f}s", flush=True)

    t0 = time.time()
    proof, public_values = circ.prove(compiled, pk, vk)
    t_prove = time.time() - t0
    print(f"prove:   {t_prove:.1f}s (solve trace + Groth16 MSMs/NTT)",
          flush=True)

    t0 = time.time()
    groth16_mod.verify(proof, vk, public_values)  # raises if invalid
    t_verify = time.time() - t0
    print(f"verify:  {t_verify:.2f}s OK", flush=True)

    out = {
        "n_hashes": n,
        "constraints": n_constraints,
        "constraints_per_hash": round(n_constraints / n, 2),
        "direct_constraints_91N": 91 * n,
        "wires": compiled.r1cs.n_wires,
        "compile_s": round(t_compile, 1),
        "setup_s": round(t_setup, 1),
        "prove_s": round(t_prove, 1),
        "verify_s": round(t_verify, 2),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PIPELINE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
