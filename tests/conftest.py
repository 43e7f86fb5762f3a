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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gkr_mimc_tpu_jax_cache")

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
    compile, never in isolated modules). Dropping the in-memory executable
    caches between modules keeps the population bounded; the persistent
    on-disk cache makes the recompiles cheap."""
    yield
    jax.clear_caches()
