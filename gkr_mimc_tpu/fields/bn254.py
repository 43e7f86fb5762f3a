"""BN254 scalar-field (fr) constants for the TPU limb representation.

The reference (Consensys/gkr-mimc) delegates all field arithmetic to
gnark-crypto's `bn254/fr` (4x64-bit limbs, Montgomery form, x86-64 asm).
Here we re-derive every Montgomery constant for a TPU-native representation:
16 limbs x 16 bits held in uint32 lanes, Montgomery radix R = 2**256.

16-bit limbs are chosen so that a limb product a_i*b_j < 2**32 is exact in a
single uint32 lane multiply, and so that schoolbook column sums (<= 32 terms
of 16-bit values) stay below 2**21 << 2**32 without intermediate carries.
"""

# BN254 (alt_bn128) scalar field modulus.
P = 21888242871839275222246405745257275088548364400416034343698204186575808495617

W = 16                # limb width in bits
L = 16                # number of limbs (16*16 = 256 bits >= 254)
MASK = (1 << W) - 1
R_BITS = W * L        # Montgomery radix exponent: R = 2**256

R1 = (1 << R_BITS) % P          # R   mod p  (the Montgomery image of 1)
RINV = pow(1 << R_BITS, -1, P)  # R^-1 mod p (host-side Montgomery decode)
R2 = (R1 * R1) % P              # R^2 mod p  (to-Montgomery conversion factor)
R3 = (R2 * R1) % P
PINV = pow(P, -1, 1 << R_BITS)  # p^-1 mod R
NPRIME = (1 << R_BITS) - PINV   # -p^-1 mod R  (big-REDC multiplier)


def int_to_limbs(x: int, n: int = L) -> list[int]:
    """Little-endian W-bit limb decomposition of a Python int."""
    return [(x >> (W * i)) & MASK for i in range(n)]


def limbs_to_int(limbs) -> int:
    """Inverse of int_to_limbs (accepts any iterable of ints)."""
    x = 0
    for i, limb in enumerate(limbs):
        x += int(limb) << (W * i)
    return x


P_LIMBS = int_to_limbs(P)
NPRIME_LIMBS = int_to_limbs(NPRIME)
R1_LIMBS = int_to_limbs(R1)
R2_LIMBS = int_to_limbs(R2)

# 2**(16k) mod p for folding extended limbs back into the field.
POW16 = [pow(2, W * k, P) for k in range(40)]
