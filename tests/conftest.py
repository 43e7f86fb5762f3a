"""Test harness config: CPU backend with a virtual 8-device mesh (the
multi-chip sharding tests run here; real-TPU runs happen via bench.py), and
a persistent XLA compilation cache so repeated runs skip the heavy compiles.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gkr_mimc_tpu_jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
