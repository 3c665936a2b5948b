"""Spark-compatible XXH64 without a JVM.

``F.xxhash64`` is the standard XXH64 algorithm (Yann Collet's public
xxHash specification, BSD) with seed 42, applied to a type-specific
byte encoding (Spark's `XxHash64` expression): int/date as 4-byte
little-endian, long/timestamp-micros as 8-byte little-endian,
string/binary as raw bytes, boolean as int 0/1, float/double as IEEE
bit patterns at their natural width with -0.0 normalized to 0.0.

The task-level DSv2 writer (datasource.py) computes partition tuples
for ``bucket(N)`` specs inside plain Python workers — no SparkSession,
no JVM — so the hash is reimplemented here from the public spec and
pinned against ``F.xxhash64`` property-style in
tests/test_xxh64_parity.py.  Parity target: the reference's bucket
partition transform (docs/07-partitioning.md) under the engine-native
hash (the spec-portable murmur3 variant lives in murmur3.py).

Write-path only: the read/scan paths hash JVM-side via
``F.xxhash64`` — this module is never on a per-row hot read path.
"""

from __future__ import annotations

import struct

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

#: Spark's fixed seed for F.xxhash64 / HashPartitioning's xxhash64 form
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _merge(h: int, v: int) -> int:
    h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of raw bytes; returns SIGNED 64-bit (Spark LongType)."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while off + 32 <= n:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, off)
            v1 = (_rotl((v1 + k1 * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + k2 * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + k3 * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + k4 * _P2) & _M, 31) * _P1) & _M
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, off)
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if off + 4 <= n:
        (k,) = struct.unpack_from("<I", data, off)
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    h = _fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def hash_int(v: int, seed: int = SPARK_SEED) -> int:
    """Spark XxHash64 of IntegerType/ShortType/ByteType/DateType(days)."""
    return xxh64(struct.pack("<i", v), seed)


def hash_long(v: int, seed: int = SPARK_SEED) -> int:
    """Spark XxHash64 of LongType / TimestampType (epoch micros)."""
    return xxh64(struct.pack("<q", v), seed)


_EPOCH_UTC = None  # lazily built (datetime import kept off module load)


def spark_xxhash64(value, simple_type: str, seed: int = SPARK_SEED) -> int:
    """``F.xxhash64(col)`` of one non-null scalar, given the SOURCE
    COLUMN's Spark type (``DataType.simpleString()``).  Type matters:
    Spark hashes int32 and int64 under different widths (measured in
    transforms.py:152 — bucket[8] of 7 is 7 as int but 1 as long)."""
    import datetime as _dt

    t = simple_type
    if t in ("int", "smallint", "tinyint"):
        return hash_int(int(value), seed)
    if t == "bigint":
        return hash_long(int(value), seed)
    if t == "date":
        if isinstance(value, _dt.datetime):
            value = value.date()
        if isinstance(value, _dt.date):
            value = (value - _dt.date(1970, 1, 1)).days
        return hash_int(int(value), seed)
    if t in ("timestamp", "timestamp_ntz"):
        if isinstance(value, _dt.datetime):
            if value.tzinfo is not None:
                value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            d = value - _dt.datetime(1970, 1, 1)
            # exact integer arithmetic — total_seconds() is a float and
            # drops sub-micro precision at 2024-scale epochs
            value = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
        return hash_long(int(value), seed)
    if t == "string":
        return xxh64(str(value).encode("utf-8"), seed)
    if t == "binary":
        return xxh64(bytes(value), seed)
    if t == "boolean":
        return hash_int(1 if value else 0, seed)
    if t == "float":
        v = float(value)
        if v == 0.0:
            v = 0.0  # -0.0 normalizes to +0.0 (Spark hash normalization)
        (bits,) = struct.unpack("<i", struct.pack("<f", v))
        return hash_int(bits, seed)
    if t == "double":
        v = float(value)
        if v == 0.0:
            v = 0.0
        (bits,) = struct.unpack("<q", struct.pack("<d", v))
        return hash_long(bits, seed)
    if t.startswith("decimal("):
        # Spark hashes a compact decimal (precision ≤ 18) as its
        # UNSCALED LONG (measured: xxhash64(10.25 as decimal(9,2)) ==
        # xxhash64(1025L)); wider decimals hash the unscaled byte form
        # — unsupported here, callers fall back to the Spark-job twin
        import decimal as _decmod
        import re as _re

        m = _re.match(r"^decimal\((\d+),\s*(\d+)\)$", t)
        if m and int(m.group(1)) <= 18:
            d = (
                value
                if isinstance(value, _decmod.Decimal)
                else _decmod.Decimal(str(value))
            )
            u = d.scaleb(int(m.group(2)))
            if u == u.to_integral_value():
                return hash_long(int(u), seed)
    raise TypeError(f"bucket transform unsupported for source type {t!r}")


# ------------------------------------------------------- numpy fast path

def _np():
    import numpy as np

    return np


def _rotl_np(x, r: int):
    np = _np()
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix_np(h):
    np = _np()
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(_P2)
    h = h ^ (h >> np.uint64(29))
    h = h * np.uint64(_P3)
    h = h ^ (h >> np.uint64(32))
    return h


def hash_long_np(arr, seed: int = SPARK_SEED):
    """Vectorized :func:`hash_long` over an int64 ndarray → int64
    ndarray.  Pure uint64 modular arithmetic (numpy wraps unsigned
    silently, which IS the algorithm).  Parity with the scalar form is
    property-pinned in tests/test_xxh64_parity.py — the scalar form is
    itself pinned against F.xxhash64."""
    np = _np()
    x = np.ascontiguousarray(arr, dtype=np.int64).view(np.uint64)
    h0 = np.uint64((seed + _P5 + 8) & _M)
    k = _rotl_np(x * np.uint64(_P2), 31) * np.uint64(_P1)
    h = h0 ^ k
    h = _rotl_np(h, 27) * np.uint64(_P1) + np.uint64(_P4)
    return _fmix_np(h).view(np.int64)


def hash_int_np(arr, seed: int = SPARK_SEED):
    """Vectorized :func:`hash_int` over an int32 ndarray → int64."""
    np = _np()
    x = np.ascontiguousarray(arr, dtype=np.int32).view(np.uint32).astype(np.uint64)
    h0 = np.uint64((seed + _P5 + 4) & _M)
    h = h0 ^ (x * np.uint64(_P1))
    h = _rotl_np(h, 23) * np.uint64(_P2) + np.uint64(_P3)
    return _fmix_np(h).view(np.int64)
