"""murmur3_x86_32 (seed 0) and the Iceberg-spec bucket transform.

The Iceberg spec (Appendix B "32-bit Hash Requirements") fixes
``bucket[N](v) = (murmur3_x86_32(encoded(v)) & Integer.MAX_VALUE) % N``
with a defined byte encoding per type: int/long → 8-byte
little-endian long, date → days-since-epoch as long, time/timestamp →
micros as long, string → UTF-8 bytes, decimal → minimal big-endian
two's-complement unscaled value, binary → raw bytes.  MurmurHash3 is
public domain (Austin Appleby); this is a from-scratch implementation
of the x86 32-bit variant.

icepack's NATIVE bucket transform is Spark's xxhash64 (transforms.py
documents the deliberate incompat, SURVEY §2.7 F6); this module makes
the spec hash available as the optional ``mmh3bucket[N]`` transform so
tables exported via :mod:`icepack.iceberg_export` carry partition
values any external Iceberg engine reproduces.
"""

from __future__ import annotations

import datetime as _dt
import struct

_MASK = 0xFFFFFFFF
_EPOCH = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)


def timestamp_micros(value: _dt.datetime) -> int:
    """Exact micros-since-epoch for a datetime.

    ``total_seconds()*1e6`` float-rounds micros off-by-one for ~1% of
    values (e.g. 2005-03-28T19:42:50.536110 → …536109), which shifts
    the spec bucket — so micros are computed exactly from the
    timedelta's integer components.  tz-aware values are converted to
    UTC (the spec's timestamptz is micros from 1970-01-01 00:00:00 UTC);
    naive values are taken as already-UTC.
    """
    if value.tzinfo is not None:
        value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    td = value - _EPOCH_DT
    return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Returns the SIGNED 32-bit hash (Java int semantics, which is
    what the Iceberg spec's published test vectors use)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _MASK
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        (k,) = struct.unpack_from("<I", data, i * 4)
        k = (k * c1) & _MASK
        k = _rotl(k, 15)
        k = (k * c2) & _MASK
        h ^= k
        h = _rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & _MASK
    # tail
    k = 0
    tail = data[nblocks * 4 :]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _MASK
        k = _rotl(k, 15)
        k = (k * c2) & _MASK
        h ^= k
    # finalization
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def iceberg_hash_bytes(value, dtype_str: str | None = None) -> bytes:
    """The spec's per-type byte encoding fed to murmur3 (Appendix B).
    ``dtype_str`` is the Spark simpleString of the source column (for
    date/timestamp literals arriving as ISO strings)."""
    if isinstance(value, bool):
        raise TypeError("spec defines no bucket for boolean")
    if isinstance(value, bytes):
        return value
    if isinstance(value, int):
        return struct.pack("<q", value)
    if isinstance(value, _dt.datetime):
        return struct.pack("<q", timestamp_micros(value))
    if isinstance(value, _dt.date):
        return struct.pack("<q", (value - _EPOCH).days)
    if isinstance(value, str):
        if dtype_str in ("date",):
            return iceberg_hash_bytes(_dt.date.fromisoformat(value))
        if dtype_str in ("timestamp", "timestamp_ntz"):
            return iceberg_hash_bytes(_dt.datetime.fromisoformat(value))
        return value.encode("utf-8")
    import decimal as _decimal
    import uuid as _uuid

    if isinstance(value, _uuid.UUID):
        return value.bytes  # big-endian 16 bytes per spec
    if isinstance(value, _decimal.Decimal):
        unscaled = int(value.scaleb(-value.as_tuple().exponent))
        # minimal two's-complement per spec: ceil(bit_length/8) bytes,
        # +1 only when the sign bit overflows ((bl+8)//8 over-padded
        # negative powers of two, e.g. -128 → ff80 — ADVICE r10)
        n = max(1, (unscaled.bit_length() + 7) // 8)
        try:
            return unscaled.to_bytes(n, "big", signed=True)
        except OverflowError:
            return unscaled.to_bytes(n + 1, "big", signed=True)
    if isinstance(value, float):
        raise TypeError("spec defines no bucket for float/double")
    raise TypeError(f"no iceberg hash encoding for {type(value).__name__}")


def bucket(value, n: int, dtype_str: str | None = None) -> int | None:
    """Spec bucket: null → null; else (hash & MAX_INT) % n."""
    if value is None:
        return None
    h = murmur3_x86_32(iceberg_hash_bytes(value, dtype_str))
    return (h & 0x7FFFFFFF) % n
