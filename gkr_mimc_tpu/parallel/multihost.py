"""Multi-host (DCN) deployment of the sharded GKR prover.

The reference is a single-process library (SURVEY.md §2.10); scaling past
one host is new capability this framework owns. The design keeps the
single-host `parallel.mesh` programs unchanged:

* The hypercube axis shards over a 1-D mesh of ALL global devices — XLA
  routes the per-round psum over ICI within each host and DCN across
  hosts automatically (device order groups same-host chips contiguously).
* There is no explicit "host-0 transcript authority" message: the psum
  leaves the reduced round coefficients replicated on every shard, each
  shard recomputes the identical MiMC Fiat-Shamir challenge locally
  (parallel/mesh.py _round_fn), so transcripts agree across hosts by
  construction — the property tests/test_parallel.py pins down per round.
* Every process materializes only its addressable shards
  (`shard_table_global` below); no host ever holds the full 2^bN table.

Usage on an N-host pod slice:

    from gkr_mimc_tpu.parallel import multihost
    multihost.initialize()            # jax.distributed (env-driven)
    mesh = multihost.make_global_mesh()
    x = multihost.shard_table_global(mesh, n, local_vals_fn)
    ... parallel.mesh.prove_gkr_sharded(circuit, a, qprime, mesh)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import fr
from .mesh import AXIS


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bring-up. With no arguments, cluster auto-detection
    (TPU pod metadata / env vars) applies; explicit args cover manual
    bring-up. No-op when already initialized or single-process.

    Failure policy: when the caller EXPLICITLY requested a multi-process
    cluster (any argument given, or num_processes > 1 detected from env),
    a bring-up failure is fatal — silently degrading a real pod to
    single-process would produce wrong-scale results. Only the
    zero-config single-process case may fall through."""
    # detect an existing distributed context WITHOUT jax.process_count():
    # that call initializes the XLA backend, after which initialize() is
    # forbidden (tests/test_multihost.py exercises this ordering)
    try:
        from jax._src import distributed as _dist

        # pinned against jax 0.9.0's layout; verified by hasattr so a
        # private-API rename degrades to the RuntimeError fallback below
        # instead of silently skipping the guard (advisor r3)
        if hasattr(_dist, "global_state") and getattr(
            _dist.global_state, "client", None
        ) is not None:
            return  # already initialized
    except Exception:  # pragma: no cover - private-API drift
        pass
    explicit = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        if "already initialized" in str(e).lower():
            return  # no-op, same as the private-API fast path above
        if explicit:
            raise RuntimeError(
                "jax.distributed bring-up failed for an explicitly requested "
                f"multi-process cluster: {e}"
            ) from e
        # zero-config single-process run (tests, one-host benches)
        pass


def make_global_mesh() -> Mesh:
    """1-D mesh over every device in the job, all processes. jax.devices()
    orders same-host chips contiguously, so the cyclic hypercube layout
    puts the dense fold traffic on ICI and only the (deg+2)-coefficient
    psum tail crosses DCN."""
    return Mesh(np.array(jax.devices()), (AXIS,))


def sharding(mesh: Mesh) -> NamedSharding:
    """The (16, D, M) cyclic table sharding used by parallel.mesh."""
    return NamedSharding(mesh, P(None, AXIS, None))


def shard_table_global(mesh: Mesh, n: int, fill) -> jax.Array:
    """Build a (16, D, n//D) cyclic-sharded global table where each process
    materializes only its addressable shards.

    `fill(lo, hi)` must return the (16, hi-lo) limb slab for hypercube
    indices [lo, hi) in *shard-local* order: shard d holds indices
    {d, d+D, d+2D, ...}; its slab is fill_for_shard(d) = the (16, n//D)
    columns [d, d+D, ...]. To keep `fill` writable as a plain lexicographic
    generator, it receives the shard id via `fill(d, n_per_shard)`.
    """
    d_total = mesh.shape[AXIS]
    assert n % d_total == 0
    m = n // d_total
    sh = sharding(mesh)

    def cb(index):
        # index selects one shard along axis 1: recover the device position
        d = index[1].start if index[1].start is not None else 0
        return np.asarray(fill(d, m))[:, None, :]

    return jax.make_array_from_callback((fr.L, d_total, m), sh, cb)


def shard_mimc_inputs_global(mesh: Mesh, n: int, gen_fn):
    """Deterministic inputs for the multi-host bench: `gen_fn(idx_array)`
    maps global hypercube indices -> (16, k) limb slab (e.g. the reference
    RandomFrArray generator applied per index). Returns the cyclic-sharded
    global array."""
    d_total = mesh.shape[AXIS]

    def fill(d, m):
        idx = d + d_total * np.arange(m, dtype=np.int64)
        return gen_fn(idx)

    return shard_table_global(mesh, n, fill)


def process_local_report() -> dict:
    """Small observability record for multi-host runs."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.devices()[0].platform,
    }
