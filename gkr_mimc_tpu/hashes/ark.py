"""Round constants (as field ints + device tensors).

Data parity with the reference constants table hash/ark.go:13-337:
100 constants each for Arks (MiMC/GMiMC/Poseidon round constants) and
xArr/yArr (Poseidon Cauchy-MDS generators).
"""

import numpy as np
import jax.numpy as jnp

from ..fields.bn254 import L, P, R1, int_to_limbs
from .ark_data import ARKS, XARR, YARR

ARKS_INT = [a % P for a in ARKS]
XARR_INT = [a % P for a in XARR]
YARR_INT = [a % P for a in YARR]


def arks_scan_tensor(n: int) -> np.ndarray:
    """First n Arks in Montgomery form, shape (n, 16) — a `lax.scan` xs.
    Returned as numpy (host) so callers can stay off-device until traced."""
    out = np.empty((n, L), dtype=np.uint32)
    for i in range(n):
        out[i] = int_to_limbs(ARKS_INT[i] * R1 % P)
    return out
