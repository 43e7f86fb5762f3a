"""Native host runtime bindings (C++ BN254 G1 + Keccak, via ctypes).

The reference delegates its host-side group arithmetic to gnark-crypto
(Go + x86-64 assembly; prover/gadget/hints.go:182-184, setup.go:133-146).
This package is the TPU framework's native equivalent: `native/bn254.cpp`
compiled on first use with g++ into a shared library and bound with
ctypes (no pybind11 dependency). Pure-Python fallbacks live in
gadget/bn254_g1.py and gadget/keccak.py; callers route through
`msm` / `batch_scalar_mul` / `keccak256` here and get the native path
automatically when the toolchain is present.

ABI: coordinates are 4x uint64 little-endian limbs, plain representation;
points Jacobian (X, Y, Z) = 12 limbs, Z == 0 for infinity.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "bn254.cpp")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build_and_load() -> ctypes.CDLL | None:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    cache = os.environ.get("GKR_NATIVE_CACHE", "/tmp/gkr_mimc_tpu_native")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "libgkrbn254.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        tmp = so + f".build.{os.getpid()}"
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
               src, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except Exception:
            return None
        os.replace(tmp, so)  # atomic under concurrent builders
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.gkr_g1_msm.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
    lib.gkr_g1_batch_scalar_mul.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
    lib.gkr_g1_add.argtypes = [u64p, u64p, u64p]
    lib.gkr_keccak256.argtypes = [u8p, ctypes.c_uint64, u8p]
    lib.gkr_g2_msm.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
    lib.gkr_g2_batch_scalar_mul.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
    lib.gkr_g2_add.argtypes = [u64p, u64p, u64p]
    lib.gkr_fr_compute_h.argtypes = [
        u64p, u64p, u64p, ctypes.c_uint64, ctypes.c_uint64, u64p,
    ]
    return lib


def _lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            if os.environ.get("GKR_NATIVE_DISABLE") == "1":
                _LIB = None
            else:
                _LIB = _build_and_load()
            _TRIED = True
    return _LIB


def available() -> bool:
    return _lib() is not None


# -- limb packing -------------------------------------------------------------

def _int_to_limbs(x: int, out: np.ndarray) -> None:
    for i in range(4):
        out[i] = x & 0xFFFFFFFFFFFFFFFF
        x >>= 64


def _limbs_to_int(a: np.ndarray) -> int:
    return int(a[0]) | int(a[1]) << 64 | int(a[2]) << 128 | int(a[3]) << 192


# Packing is bytes-based: int.to_bytes / int.from_bytes over a contiguous
# little-endian buffer is ~6x faster than per-limb Python assembly, and the
# profile showed these conversions (25M _limbs_to_int calls at N=16)
# dominating the whole Groth16 setup phase.


def _pack_points(points: list) -> np.ndarray:
    raw = b"".join(
        x.to_bytes(32, "little")
        + y.to_bytes(32, "little")
        + z.to_bytes(32, "little")
        for (x, y, z) in points
    )
    return np.frombuffer(raw, dtype=np.uint64).reshape(len(points), 12).copy()


def _pack_scalars(scalars: list[int]) -> np.ndarray:
    raw = b"".join(s.to_bytes(32, "little") for s in scalars)
    return np.frombuffer(raw, dtype=np.uint64).reshape(len(scalars), 4).copy()


def _unpack_point(buf: np.ndarray) -> tuple:
    return (
        _limbs_to_int(buf[0:4]),
        _limbs_to_int(buf[4:8]),
        _limbs_to_int(buf[8:12]),
    )


def _unpack_points_batch(buf: np.ndarray) -> list:
    """(n, 12) uint64 Jacobian buffer -> list of (x, y, z) int tuples."""
    raw = buf.tobytes()
    out = []
    for i in range(buf.shape[0]):
        o = i * 96
        out.append(
            (
                int.from_bytes(raw[o : o + 32], "little"),
                int.from_bytes(raw[o + 32 : o + 64], "little"),
                int.from_bytes(raw[o + 64 : o + 96], "little"),
            )
        )
    return out


def _u64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


# -- public ops (None when native unavailable; callers fall back) -------------

def msm(points: list, scalars: list[int]):
    """sum_i scalars[i]*points[i]; Jacobian int-tuples in and out."""
    lib = _lib()
    if lib is None:
        return None
    from ..gadget.bn254_g1 import R

    pts = _pack_points(points)
    sc = _pack_scalars([s % R for s in scalars])
    out = np.zeros(12, dtype=np.uint64)
    lib.gkr_g1_msm(_u64p(pts), _u64p(sc), len(points), _u64p(out))
    return _unpack_point(out)


def batch_scalar_mul(base: tuple, scalars: list[int]):
    """[s*base for s in scalars] with a shared fixed-base window table."""
    lib = _lib()
    if lib is None:
        return None
    from ..gadget.bn254_g1 import R

    bp = _pack_points([base])
    sc = _pack_scalars([s % R for s in scalars])
    out = np.zeros((len(scalars), 12), dtype=np.uint64)
    lib.gkr_g1_batch_scalar_mul(_u64p(bp), _u64p(sc), len(scalars), _u64p(out))
    return _unpack_points_batch(out)


def keccak256(data: bytes):
    lib = _lib()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * max(len(data), 1)).from_buffer_copy(
        data if data else b"\x00"
    )
    out = (ctypes.c_uint8 * 32)()
    lib.gkr_keccak256(buf, len(data), out)
    return bytes(out)


# -- G2 (points are Jacobian ((x0,x1),(y0,y1),(z0,z1)) Fp2 int-tuples) --------

def _pack_points_g2(points: list) -> np.ndarray:
    raw = b"".join(
        x[0].to_bytes(32, "little") + x[1].to_bytes(32, "little")
        + y[0].to_bytes(32, "little") + y[1].to_bytes(32, "little")
        + z[0].to_bytes(32, "little") + z[1].to_bytes(32, "little")
        for (x, y, z) in points
    )
    return np.frombuffer(raw, dtype=np.uint64).reshape(len(points), 24).copy()


def _unpack_points_g2_batch(buf: np.ndarray) -> list:
    raw = buf.tobytes()
    out = []
    for i in range(buf.shape[0]):
        o = i * 192
        c = [
            int.from_bytes(raw[o + 32 * k : o + 32 * (k + 1)], "little")
            for k in range(6)
        ]
        out.append(((c[0], c[1]), (c[2], c[3]), (c[4], c[5])))
    return out


def _unpack_point_g2(buf: np.ndarray) -> tuple:
    return (
        (_limbs_to_int(buf[0:4]), _limbs_to_int(buf[4:8])),
        (_limbs_to_int(buf[8:12]), _limbs_to_int(buf[12:16])),
        (_limbs_to_int(buf[16:20]), _limbs_to_int(buf[20:24])),
    )


def msm_g2(points: list, scalars: list[int]):
    lib = _lib()
    if lib is None:
        return None
    from ..gadget.bn254_g1 import R

    pts = _pack_points_g2(points)
    sc = _pack_scalars([s % R for s in scalars])
    out = np.zeros(24, dtype=np.uint64)
    lib.gkr_g2_msm(_u64p(pts), _u64p(sc), len(points), _u64p(out))
    return _unpack_point_g2(out)


def batch_scalar_mul_g2(base: tuple, scalars: list[int]):
    lib = _lib()
    if lib is None:
        return None
    from ..gadget.bn254_g1 import R

    bp = _pack_points_g2([base])
    sc = _pack_scalars([s % R for s in scalars])
    out = np.zeros((len(scalars), 24), dtype=np.uint64)
    lib.gkr_g2_batch_scalar_mul(_u64p(bp), _u64p(sc), len(scalars), _u64p(out))
    return _unpack_points_g2_batch(out)


# -- Groth16 computeH ---------------------------------------------------------

def compute_h(a: list[int], b: list[int], c: list[int], d: int):
    """h(X) = (A(X)B(X) - C(X)) / (X^d - 1) coefficient vector (d ints,
    top coefficient 0); a/b/c are the per-constraint values. None when the
    native library is unavailable (callers use the Python FFT fallback)."""
    lib = _lib()
    if lib is None:
        return None
    n = len(a)
    pa = _pack_scalars(a)
    pb = _pack_scalars(b)
    pc = _pack_scalars(c)
    out = np.zeros((d, 4), dtype=np.uint64)
    lib.gkr_fr_compute_h(_u64p(pa), _u64p(pb), _u64p(pc), n, d, _u64p(out))
    raw = out.tobytes()
    return [
        int.from_bytes(raw[i * 32 : (i + 1) * 32], "little") for i in range(d)
    ]
