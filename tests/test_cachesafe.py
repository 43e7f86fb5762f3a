"""Crash-safe compilation cache (utils/cachesafe.py): a truncated entry —
what a killed process used to leave behind — must read as a clean miss and
be evicted, and puts must be atomic (no partially-written .bin visible)."""

import os

import pytest

from gkr_mimc_tpu.utils import cachesafe


def _mk_cache(tmp_path):
    from jax._src.lru_cache import LRUCache

    cachesafe.install()
    return LRUCache(str(tmp_path), max_size=-1)


def _compress(data: bytes) -> bytes:
    try:
        import zstandard

        return zstandard.ZstdCompressor().compress(data)
    except ImportError:
        import zlib

        return zlib.compress(data)


def test_roundtrip(tmp_path):
    c = _mk_cache(tmp_path)
    val = _compress(b"executable bytes")
    c.put("k1", val)
    assert c.get("k1") == val
    # atomic write leaves no temp files behind
    assert [p for p in os.listdir(tmp_path) if p.endswith(".tmp")] == []


def test_truncated_entry_evicted(tmp_path):
    c = _mk_cache(tmp_path)
    val = _compress(b"x" * 4096)
    c.put("k2", val)
    # simulate a killed writer: truncate the entry on disk
    path = tmp_path / "k2-cache"
    path.write_bytes(val[: len(val) // 2])
    assert c.get("k2") is None  # miss, not garbage
    assert not path.exists()  # evicted
    # a fresh put repopulates
    c.put("k2", val)
    assert c.get("k2") == val


def test_garbage_entry_evicted(tmp_path):
    c = _mk_cache(tmp_path)
    (tmp_path / "k3-cache").write_bytes(b"\x00\x01\x02 not a frame")
    assert c.get("k3") is None
    assert not (tmp_path / "k3-cache").exists()


def test_valid_entries_untouched(tmp_path):
    c = _mk_cache(tmp_path)
    vals = {f"k{i}": _compress(os.urandom(256)) for i in range(4)}
    for k, v in vals.items():
        c.put(k, v)
    for k, v in vals.items():
        assert c.get(k) == v
