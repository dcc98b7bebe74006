"""Driver-side XXH64 matching Spark's ``xxhash64`` on STRING columns.

Spark's ``F.xxhash64(string_col)`` applies the standard XXH64 algorithm
(Collet, public domain — the same spec Spark's
org.apache.spark.sql.catalyst.expressions.XXH64 implements) to the
string's UTF-8 bytes with seed 42 and returns the result as a SIGNED
64-bit long. The text-index search needs only |query terms| of these
hashes to pick posting buckets — computing them here avoids scheduling
a whole Spark job (~0.4 s of fixed overhead) for a handful of strings.
Parity with the JVM implementation is pinned in
tests/test_text_index.py against randomized inputs.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Standard XXH64 over ``data``; unsigned 64-bit result."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k = (int.from_bytes(data[i : i + 8], "little") * _P2) & _M
        h ^= (_rotl(k, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64_str(s: str) -> int:
    """``F.xxhash64(lit(s))`` for a STRING input: XXH64(seed 42) over
    UTF-8 bytes, reinterpreted as a SIGNED 64-bit long."""
    h = xxh64(s.encode("utf-8"))
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod_bucket(s: str, buckets: int) -> int:
    """``pmod(xxhash64(s), buckets)`` exactly as Spark computes it
    (Python % on the signed value already yields the positive residue)."""
    return spark_xxhash64_str(s) % buckets
