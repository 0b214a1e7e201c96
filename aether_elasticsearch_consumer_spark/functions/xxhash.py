"""Pure-Python xxHash64 matching Spark's ``F.xxhash64`` (seed 42).

Spark computes XxHash64(seed=42) over a string's UTF-8 bytes; having the
same hash driver-side lets query planning compute term-bucket partition
pruning without launching a Spark job (one fewer round-trip per search).
Implementation follows the public xxHash specification (Yann Collet,
xxhash.com, BSD); bucket parity with the JVM is pinned by a unit test.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1
PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME2) & MASK64
    return (_rotl(acc, 31) * PRIME1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * PRIME1 + PRIME4) & MASK64


def xxhash64(data: bytes | str, seed: int = SPARK_SEED) -> int:
    """xxHash64 of bytes (str → UTF-8), as unsigned 64-bit."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + PRIME1 + PRIME2) & MASK64
        v2 = (seed + PRIME2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - PRIME1) & MASK64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME5) & MASK64
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * PRIME1 + PRIME4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * PRIME1) & MASK64
        h = (_rotl(h, 23) * PRIME2 + PRIME3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * PRIME5) & MASK64
        h = (_rotl(h, 11) * PRIME1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * PRIME2) & MASK64
    h ^= h >> 29
    h = (h * PRIME3) & MASK64
    h ^= h >> 32
    return h


def xxhash64_signed(data: bytes | str, seed: int = SPARK_SEED) -> int:
    """Two's-complement signed value — exactly what Spark's xxhash64 returns."""
    h = xxhash64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_pmod_bucket(term: str, n_buckets: int) -> int:
    """Equivalent of F.pmod(F.xxhash64(term), n_buckets)."""
    return xxhash64_signed(term) % n_buckets
