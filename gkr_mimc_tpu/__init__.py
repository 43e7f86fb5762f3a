"""gkr_mimc_tpu: TPU-native GKR prover framework for batched MiMC-family hashes over BN254."""
__version__ = "0.1.0"

# Crash-safe persistent compilation cache (atomic writes + corrupt-entry
# eviction): a killed process must never poison later runs. Installed at
# import so every entry point (bench, tests, scripts, driver) is covered.
from .utils import cachesafe as _cachesafe

_cachesafe.install()
del _cachesafe
