"""gkr_mimc_tpu: TPU-native GKR prover framework for batched MiMC-family hashes over BN254."""
__version__ = "0.1.0"
