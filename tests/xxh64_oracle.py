"""Pure-Python XXH64 — an independent oracle for Spark's ``xxhash64``.

Implements the public xxHash64 algorithm (Yann Collet,
https://github.com/Cyan4973/xxHash — public spec) so the MinHash/SimHash
signatures built on ``F.xxhash64`` can be verified row-wise without DuckDB
(which lacks xxhash64).

Spark semantics being mirrored (public Spark source,
``org.apache.spark.sql.catalyst.expressions.XxHash64`` /
``org.apache.spark.sql.catalyst.expressions.XXH64``):

* default seed 42;
* multiple children hash LEFT-TO-RIGHT, each using the previous result as
  its seed;
* a string child hashes its UTF-8 bytes; an int child hashes its 4
  little-endian bytes; a long child hashes its 8 little-endian bytes;
* the result is a signed 64-bit long.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SEED = 42  # Spark's default xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """Unsigned XXH64 of *data* with *seed*."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        def _round(acc: int, k: int) -> int:
            return (_rotl((acc + k * _P2) & _M, 31) * _P1) & _M

        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _to_signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def _to_unsigned(x: int) -> int:
    return x & _M


def spark_xxhash64(*args) -> int:
    """Signed result of Spark's ``F.xxhash64(*args)`` for python values:
    str (UTF-8 bytes), int tagged by python type — pass plain ints for
    IntegerType children and the ``Long()`` wrapper for LongType children."""
    h = SEED
    for a in args:
        if isinstance(a, str):
            h = xxh64(a.encode("utf-8"), h)
        elif isinstance(a, Long):
            h = xxh64(struct.pack("<q", _to_signed(_to_unsigned(a.v))), h)
        elif isinstance(a, int):
            h = xxh64(struct.pack("<i", a), h)
        else:
            raise TypeError(type(a))
    return _to_signed(h)


class Long:
    """Marks an argument as a Spark LongType child (8-byte hash input)."""

    def __init__(self, v: int) -> None:
        self.v = v


# ---------------------------------------------------------------- oracles
def tokens(text: str) -> list:
    return [t for t in __import__("re").split(r"\s+", text) if t != ""]


def shingle_list(text: str, k: int) -> list:
    """Twin of ``evalidate_spark.functions.text.shingles``: k-token shingles,
    short docs yield one whole-text shingle."""
    toks = tokens(text)
    n = len(toks)
    return [" ".join(toks[i : i + k]) for i in range(max(n - k + 1, 1))]


def minhash_signature(text: str, num_hashes: int, shingle_k: int) -> list:
    """Twin of ``dedup.minhash_signature``: permutation i =
    min over shingles of xxhash64(xxhash64(shingle), i)."""
    base = [spark_xxhash64(s) for s in shingle_list(text, shingle_k)]
    sig = []
    for i in range(num_hashes):
        m = (1 << 63) - 1
        for h in base:
            v = spark_xxhash64(Long(h), i)
            if v < m:
                m = v
        sig.append(m)
    return sig


def simhash64(text: str, shingle_k: int) -> int:
    """Twin of ``dedup.simhash64``: per-bit majority vote over shingle
    hashes (signed 64-bit result)."""
    hs = [_to_unsigned(spark_xxhash64(s)) for s in shingle_list(text, shingle_k)]
    sig = 0
    for b in range(64):
        votes = sum(1 if (h >> b) & 1 else -1 for h in hs)
        if votes > 0:
            sig |= 1 << b
    return _to_signed(sig)
