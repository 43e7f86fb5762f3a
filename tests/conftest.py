"""Test harness config: CPU backend with a virtual 8-device mesh (the
multi-chip sharding tests run here; real-TPU runs happen via bench.py), and
a persistent XLA compilation cache so repeated runs skip the heavy compiles.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
# Scope the CPU cache per machine: XLA:CPU cache entries embed AOT host
# code, and the cache key does NOT cover the exact CPU feature set — an
# entry written on a different box loads with "could lead to execution
# errors such as SIGILL" warnings and intermittently crashes mid-suite
# (the round-3 "poisoned cache" segfaults). TPU entries are unaffected
# (bench.py keeps the shared dir; TPU code runs on the TPU).
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    from gkr_mimc_tpu.utils.cachesafe import machine_scoped_cpu_cache_dir

    os.environ["JAX_COMPILATION_CACHE_DIR"] = machine_scoped_cpu_cache_dir()

import jax  # noqa: E402
import pytest  # noqa: E402

# jax may already be imported (e.g. a TPU plugin registered via
# sitecustomize), in which case env vars are too late: force via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(autouse=True, scope="module")
def _clear_jit_caches_per_module():
    """XLA:CPU intermittently segfaults once hundreds of live compiled
    programs accumulate in one process (observed mid-suite in a fresh
    compile — of a TINY program, with 122 GB RAM free — never in isolated
    modules; the round-5 reproductions put the crash inside
    backend_compile_and_load and executable.serialize respectively, so it
    is a live-executable-population bug, not memory pressure or a corrupt
    cache entry). Dropping the in-memory executable caches around every
    module keeps the population bounded; the persistent on-disk cache
    makes the recompiles cheap."""
    import gc

    def _purge():
        # module-level jit handles pin their executables past
        # jax.clear_caches(); drop the library's own caches too
        try:
            from gkr_mimc_tpu.sumcheck import prover as _sp

            _sp._ROUND_JIT_CACHE.clear()
        except Exception:
            pass
        jax.clear_caches()
        gc.collect()

    _purge()
    yield
    _purge()
