"""Hashing for the URL-seen set, bloom filter and partitioning.

Design note (scale): at a 10^10-URL frontier a 64-bit hash collides with
near-certainty (birthday bound ~2.7 expected collisions at 10^10 keys), and
a collision in a hash-keyed seen set silently drops a URL. Therefore:

- the EXACT seen set is keyed by the full url string (anti-join on `url`);
- 64-bit hashes are used only where a false positive is safe — bloom-filter
  probes (positives are re-checked exactly) and shard/partition routing.

Spark-side the engine uses the built-in ``xxhash64`` (JVM, codegen'd);
this module provides the bit-identical Python implementation so bloom
shards built in Arrow UDF batches agree with hashes computed by the JVM.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# xxHash64 constants (public algorithm, Yann Collet, BSD)
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M64


def xxhash64(data: bytes, seed: int = 42) -> int:
    """xxHash64 with seed 42 — matches Spark's ``xxhash64`` for a single
    string column (Spark hashes the UTF-8 bytes with seed 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxhash64_signed(s: str, seed: int = 42) -> int:
    """As a signed 64-bit value (Spark LongType representation)."""
    h = xxhash64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def hash_series(urls: pd.Series, seed: int = 42) -> pd.Series:
    """Vectorized-batch hash of a string Series -> int64 Series."""
    return pd.Series(
        np.fromiter(
            (xxhash64_signed(u, seed) if u is not None else 0 for u in urls),
            dtype=np.int64,
            count=len(urls),
        ),
        index=urls.index,
    )
