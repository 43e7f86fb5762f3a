"""Multi-chip sharded GKR prover.

The reference parallelizes with a shared-memory goroutine pool over table
chunks (common/parallelize.go, sumcheck/worker.go). The TPU-native analog
(SURVEY.md §2.10): partition the 2**bn hypercube over a 1-D device mesh,
reduce each round's partial evaluations with `jax.lax.psum` over ICI,
derive the (identical) Fiat-Shamir challenge on every shard, and fold
shard-locally.

Layout: hypercube index x lives on shard d = x mod D at local position
q = x div D ("cyclic" / low-bit sharding). Sumcheck folds pair (x, x + n/2),
which share low bits — so every fold is shard-local until the table shrinks
to one element per shard; the tiny remainder is all-gathered and finished
replicated. Each shard seeds its local eq table with the prefix product of
its residue bits — the same math as the reference's chunked eq build
(poly/eq.go:62-89 ChunkOfEqTable), applied to low bits instead of high.

Transcript parity: the per-round evaluations are exact modular sums (psum
of limb columns + wide REDC), so coefficients, challenges and proofs are
bit-identical to the single-chip prover — asserted by tests/test_parallel.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..circuits.circuit import Circuit
from ..circuits.gates import Gate
from ..fields import fr
from ..gkr.prover import GKRProof, _claims_pack, _empty_claims, _row, _stack0
from ..hashes.mimc import mimc_hash_device
from ..ops import kernels as K
from ..poly import lagrange, multilin
from ..sumcheck.prover import (
    PALLAS_MIN,
    SumcheckProof,
    _canon_rows,
    _fold,
    _pallas_gate_kind,
    _partial_evals,
)

AXIS = "hc"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only {len(devs)} "
                f"JAX devices are visible ({devs[0].platform}); for a "
                "virtual CPU mesh set jax_platforms=cpu and "
                "--xla_force_host_platform_device_count before backend init"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def shard_table(x, mesh: Mesh):
    """(16, N) lexicographic table -> (16, D, N/D) cyclic-sharded device
    array: entry (d, q) = x[q*D + d]."""
    d = mesh.shape[AXIS]
    n = x.shape[-1]
    assert n % d == 0
    resh = jnp.moveaxis(x.reshape(fr.L, n // d, d), 2, 1)  # (16, D, N/D)
    return jax.device_put(resh, NamedSharding(mesh, P(None, AXIS, None)))


def unshard_table(xs):
    """(16, D, M) cyclic-sharded -> (16, D*M) lexicographic (host ok)."""
    return jnp.moveaxis(xs, 1, 2).reshape(fr.L, -1)


def _renorm_psum(cols, axis_name):
    """psum of lazy limb reps -> lazy rep (exact): the summed columns are
    < D * 2**16 < 2**31, one wide REDC + R^2 multiply renormalizes."""
    summed = jax.lax.psum(cols, axis_name)
    plain = fr._redc_wide(summed)
    return fr.mul(plain, fr._r2_tensor(plain.ndim - 1))


def _make_eq_local(qprimes, claims, d, local_bn):
    """Shard-local combined eq table (16, 2**local_bn)."""
    n_claims = qprimes.shape[0]
    if local_bn >= 13 and K.pallas_enabled():
        return _make_eq_local_fast(qprimes, claims, d, local_bn)
    pref = multilin.eq_prefix(qprimes[0, local_bn:], d)
    eq = multilin.eq_table(qprimes[0, :local_bn], multiplier=pref)
    if n_claims <= 1:
        return eq
    rlc = mimc_hash_device(claims)

    def body(carry, qp):
        acc, mult = carry
        pj = multilin.eq_prefix(qp[local_bn:], d)
        acc = fr.add(acc, multilin.eq_table(qp[:local_bn], multiplier=fr.mul(mult, pj)))
        return (acc, fr.mul(mult, rlc)), None

    (eq, _), _ = jax.lax.scan(body, (eq, rlc), qprimes[1:])
    return eq


def _make_eq_local_fast(qprimes, claims, d, local_bn):
    """Shard-local single-pass multi-claim eq build: the per-claim shard
    prefix eq(q_j[local_bn:], d-bits) folds into the RLC multiplier, then
    the hi/lo streaming contraction of sumcheck.prover._make_eq_multiclaim_fast
    runs on the local bits only."""
    j = qprimes.shape[0]
    one = fr.one(())
    if j == 1:
        ms = one[:, None]
    else:
        rlc = mimc_hash_device(claims)

        def body(m, _):
            nm = fr.mul(m, rlc)
            return nm, nm

        _, ms_rest = jax.lax.scan(body, one, None, length=j - 1)
        ms = jnp.moveaxis(jnp.concatenate([one[None], ms_rest], axis=0), -1, 0)
    prefs = jnp.stack(
        [multilin.eq_prefix(qprimes[jj, local_bn:], d) for jj in range(j)],
        axis=1,
    )  # (16, J)
    ms = fr.mul(ms, prefs)

    k = min(local_bn, 10)
    hi_bits = local_bn - k
    hi = multilin.eq_table_grouped(
        jnp.moveaxis(qprimes[:, :hi_bits], 0, 1), multiplier=ms
    )
    lo = multilin.eq_table_grouped(jnp.moveaxis(qprimes[:, hi_bits:local_bn], 0, 1))
    mh = jnp.transpose(hi, (2, 0, 1))  # (C, 16, J)
    return K.multi_eq_accum(mh, lo)


# Per-round-size compiled shard_map programs, cached across layers and bn
# (the same restructure as the single-chip prover, sumcheck/prover.py:
# a sharded round at local size m is the same program for every layer).
_EQ_CACHE: dict = {}
_ROUND_CACHE: dict = {}
_GATHER_CACHE: dict = {}


def _shmap(body, mesh, in_specs, out_specs, donate=()):
    from jax.experimental.shard_map import shard_map

    return jax.jit(
        shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False),
        donate_argnums=donate,
    )


def _eq_fn(mesh: Mesh, local_bn: int):
    key = (mesh, local_bn)
    f = _EQ_CACHE.get(key)
    if f is None:
        def body(qprimes, claims):
            d = jax.lax.axis_index(AXIS)
            return _make_eq_local(qprimes, claims, d, local_bn)[:, None]

        f = _shmap(body, mesh, (P(), P()), P(None, AXIS, None))
        _EQ_CACHE[key] = f
    return f


def _round_fn(gate: Gate, n_tables: int, mesh: Mesh, donate: bool = False):
    """One shard-local round: psum'd partial evals -> coeffs -> challenge
    (recomputed identically on every shard) -> local fold. Rounds never
    donate (outputs are half-size — no aliasing is possible; see
    sumcheck.prover._round_jit)."""
    donate = False
    # advisor r3: include the GKR_COEFF_PE toggle in the cache key so the
    # sharded prover honors the same A/B knob as the single-chip path
    from ..sumcheck.prover import _coeff_pe_enabled

    use_coeff = _coeff_pe_enabled()
    key = (gate, n_tables, mesh, donate, use_coeff)
    f = _ROUND_CACHE.get(key)
    if f is None:
        kind = _pallas_gate_kind(gate, [None] * n_tables)
        if not use_coeff:
            kind = None

        def body(gate_params, eq_b, *xs_blocks):
            eq = eq_b.reshape(fr.L, -1)
            xs = [b.reshape(fr.L, -1) for b in xs_blocks]
            if kind is not None and eq.shape[-1] >= PALLAS_MIN:
                # the fast single-chip kernels, per shard: the raw integer
                # coefficient accumulator is an exact sum of digit products,
                # so psum-then-REDC equals the single-chip global sum bit
                # for bit (the consumeAccumulate analog, SURVEY.md §2.10)
                if kind == "cipher":
                    ark = gate_params[0].reshape(fr.L, 1)
                    acc = K.cipher_coeff_acc(eq, xs[0], xs[1], ark, 1)
                    acc = jax.lax.psum(acc, AXIS)
                    coeffs = K.finish_coeff_acc(acc, 8, 7)[..., 0]
                else:
                    acc = K.identity_coeff_acc(eq, xs[0], 1)
                    acc = jax.lax.psum(acc, AXIS)
                    coeffs = K.finish_coeff_acc(acc, 2, 1)[..., 0]
                r = mimc_hash_device(coeffs)
                folded = K.fold_tables_gm([eq] + xs, r, 1 + len(xs), 1)
                eq, xs = folded[0], folded[1:]
            else:
                evals = _renorm_psum(
                    _partial_evals(gate, gate_params, eq, xs, None), AXIS
                )
                coeffs = lagrange.interpolate_on_range_device(evals)
                r = mimc_hash_device(coeffs)
                eq = _fold(eq, r, None)
                xs = [_fold(x, r, None) for x in xs]
            return (
                eq[:, None],
                tuple(x[:, None] for x in xs),
                coeffs,
                r,
            )

        sh = P(None, AXIS, None)
        in_specs = (P(), sh) + tuple(sh for _ in range(n_tables))
        out_specs = (sh, tuple(sh for _ in range(n_tables)), P(), P())
        f = _shmap(body, mesh, in_specs, out_specs,
                   donate=tuple(range(1, 2 + n_tables)) if donate else ())
        _ROUND_CACHE[key] = f
    return f


def _gather_fn(n_tables: int, mesh: Mesh):
    """Local size 1 -> replicated (16, D) tables (the sharded->replicated
    tail transition, SURVEY.md §5 'shrinking tables')."""
    key = (n_tables, mesh)
    f = _GATHER_CACHE.get(key)
    if f is None:
        def body(eq_b, *xs_blocks):
            def g(b):
                return jnp.moveaxis(jax.lax.all_gather(b[:, 0, 0], AXIS), -1, 0)

            return g(eq_b), tuple(g(b) for b in xs_blocks)

        sh = P(None, AXIS, None)
        f = _shmap(body, mesh, (sh,) + tuple(sh for _ in range(n_tables)),
                   (P(), tuple(P() for _ in range(n_tables))))
        _GATHER_CACHE[key] = f
    return f


def prove_sharded(xs_sharded, qprimes, claims, gate: Gate, mesh: Mesh) -> SumcheckProof:
    """Sharded analog of sumcheck.prover.prove: xs are (16, D, M) cyclic
    tables; outputs bit-identical to the single-chip prover."""
    from ..sumcheck import prover as sp

    bn = int(qprimes.shape[1])
    if claims is None:
        claims = sp._no_claims()
    d = mesh.shape[AXIS]
    log_d = int(np.log2(d))
    local_bn = bn - log_d
    assert local_bn >= 0, "hypercube smaller than the mesh"

    # XLA:CPU collective rendezvous aborts if a device thread lags >40s
    # behind its peers — on oversubscribed hosts (2 cores / 8 virtual
    # devices) a deep async queue of collective programs does exactly that.
    # Serialize dispatches on CPU; on TPU the async pipeline stays deep.
    sync = jax.devices()[0].platform == "cpu"

    eq = _eq_fn(mesh, local_bn)(qprimes, claims)
    xs = tuple(xs_sharded)

    head_coeffs, head_rs = [], []
    for k in range(local_bn):
        f = _round_fn(gate, len(xs), mesh, donate=k > 0)
        eq, xs, coeffs, r = f(gate.params(), eq, *xs)
        head_coeffs.append(coeffs)
        head_rs.append(r)
        if sync:
            jax.block_until_ready(r)

    # replicated tail: gather the per-shard scalars, reuse the single-chip
    # tail program (identical math -> identical transcript)
    eq, xs = _gather_fn(len(xs), mesh)(eq, *xs)
    if sync:
        jax.block_until_ready(eq)
    if log_d > 0:
        tail_coeffs, tail_rs, final_claims = sp._tail_jit_keep(
            gate, gate.params(), eq, list(xs)
        )
    else:
        tail_coeffs = tail_rs = None
        final_claims = sp._final_claims_jit(eq, tuple(xs))

    proof, chals, fc = sp._package_jit(
        len(head_coeffs), gate.degree + 2, tuple(head_coeffs), tuple(head_rs),
        tail_coeffs, tail_rs, final_claims,
    )
    return SumcheckProof(coeffs=proof, challenges=chals, final_claims=fc)


_WITNESS_CACHE: dict = {}


def assign_sharded_mimc(block_sh, state_sh):
    """Witness over cyclic-sharded inputs: elementwise, so the single-chip
    program works unchanged per shard. On TPU the fused Pallas witness
    kernel (ops/kernels.py mimc_witness) runs shard-locally via shard_map;
    elsewhere the jitted lax.scan relies on sharding propagation."""
    from ..models.mimc import MIMC_ROUNDS, _arks_cols, _assign_fused_jit

    mesh = getattr(block_sh.sharding, "mesh", None)
    # block_sh global shape is (16, D, M) with axis 1 sharded: shape[-1]
    # is already the per-device lane count (advisor r3: dividing by D again
    # disabled the fused witness kernel until M >= 512*D)
    assert block_sh.ndim == 3, block_sh.shape
    local = block_sh.shape[-1]
    if K.pallas_enabled() and mesh is not None and local >= 512:
        key = (mesh, block_sh.shape)
        f = _WITNESS_CACHE.get(key)
        if f is None:
            def body(arks, block_b, state_b):
                wit = K.mimc_witness(
                    block_b.reshape(fr.L, -1), state_b.reshape(fr.L, -1), arks
                )
                return wit[:, :, None, :]

            sh = P(None, AXIS, None)
            f = _shmap(body, mesh, (P(), sh, sh), P(None, None, AXIS, None))
            _WITNESS_CACHE[key] = f
        wit = f(jnp.asarray(_arks_cols()), block_sh, state_sh)
        states = [wit[i] for i in range(MIMC_ROUNDS)]
    else:
        w = _assign_fused_jit(block_sh, state_sh)
        states = [w[i] for i in range(MIMC_ROUNDS)]
    return [block_sh, state_sh, block_sh] + states


def prove_gkr_sharded(circuit: Circuit, assignment, qprime, mesh: Mesh) -> GKRProof:
    """The GKR layer walk over sharded assignment tables."""
    nlayers = len(circuit)
    bn = qprime.shape[0]

    claim_store: list[list] = [[None] * len(l.out) for l in circuit]
    qprime_store: list[list] = [[None] * len(l.out) for l in circuit]
    proofs = [None] * nlayers
    claims_out = [None] * nlayers
    qprimes_out = [None] * nlayers

    qprimes_out[nlayers - 1] = _stack0(jnp.asarray(qprime))
    claims_out[nlayers - 1] = _empty_claims()

    for layer in range(nlayers - 1, -1, -1):
        if circuit.is_input_layer(layer):
            break
        if layer == nlayers - 1:
            qprimes = qprimes_out[layer]
            claims = None
        else:
            qprimes = _stack0(*qprime_store[layer])
            claim_rows, claims = _claims_pack(*claim_store[layer])
            qprimes_out[layer] = qprimes
            claims_out[layer] = claim_rows

        xs = [assignment[j] for j in circuit[layer].in_]
        scp = prove_sharded(xs, qprimes, claims, circuit[layer].gate, mesh)
        proofs[layer] = scp

        for i, inp in enumerate(circuit[layer].in_):
            slot = circuit.out_slot(inp, layer)
            claim_store[inp][slot] = _row(scp.final_claims, 1 + i)
            qprime_store[inp][slot] = scp.challenges

    for layer in range(nlayers):
        if not circuit.is_input_layer(layer):
            continue
        if claim_store[layer] and claim_store[layer][0] is not None:
            claims_out[layer] = _stack0(*claim_store[layer])
            qprimes_out[layer] = _stack0(*qprime_store[layer])

    return GKRProof(proofs, claims_out, qprimes_out)


def dryrun(n_devices: int) -> None:
    """Driver hook: jit the full sharded GKR prove over an n_devices mesh
    and run one step on tiny shapes."""
    import os

    from ..models.mimc import mimc_circuit
    from ..utils.common import random_fr_array
    from ..utils.convert import ints_to_rows

    # Force the virtual CPU mesh BEFORE any device query: a TPU plugin
    # sitecustomize may clobber JAX_PLATFORMS, and once a backend is
    # initialized the platform can no longer be switched. (make_mesh
    # raises a clear error if this came too late to take effect.)
    if os.environ.get("GKR_DRYRUN_REAL_DEVICES") != "1":
        flag = f"--xla_force_host_platform_device_count={n_devices}"
        if "--xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""
        ):
            os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " " + flag
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import time

    mesh = make_mesh(n_devices)
    log_d = int(np.log2(n_devices))
    bn = log_d + 2
    n = 1 << bn

    c = mimc_circuit()
    block = shard_table(fr.from_ints_mont(random_fr_array(n)), mesh)
    state = shard_table(fr.from_ints_mont(random_fr_array(n)), mesh)
    a = assign_sharded_mimc(block, state)
    qprime = jnp.asarray(ints_to_rows(random_fr_array(bn)))

    t0 = time.time()
    proof = prove_gkr_sharded(c, a, qprime, mesh)
    proof.sumcheck_proofs[2].coeffs.block_until_ready()
    t_cold = time.time() - t0
    t0 = time.time()
    proof = prove_gkr_sharded(c, a, qprime, mesh)
    proof.sumcheck_proofs[2].coeffs.block_until_ready()
    t_warm = time.time() - t0
    print(
        f"dryrun_multichip OK: {n_devices} devices, bn={bn}, "
        f"sharded prove {t_cold:.1f}s cold / {t_warm:.2f}s warm"
    )
