"""Roaring-bitmap codec for Iceberg v3 deletion vectors.

The reference's MOR story (docs/08-acid-transactions.md:112-187) stores
position deletes as parquet (file_path, pos) rows — the Iceberg v2
form.  Iceberg format v3 replaces them with DELETION VECTORS: one
roaring bitmap of deleted row positions per data file, stored as a
blob inside a Puffin file (blob type ``deletion-vector-v1``).  This
module implements, from the PUBLIC specs only (the Iceberg table spec
"Delete Formats / Deletion Vectors" section and the RoaringFormatSpec
interoperable serialization), the pure-bytes layer:

- 32-bit roaring "portable" serialization (RoaringFormatSpec): the
  cookie/ descriptive-header/ offset-header/ container layout shared
  by CRoaring, RoaringBitmap (Java), and every engine that exchanges
  bitmaps on disk.  The WRITER emits array and bitmap containers only
  (always spec-valid); the READER additionally decodes run containers,
  which foreign writers (Java's ``runOptimize()``) commonly emit.
- the 64-bit extension used by deletion vectors: ``u64 LE`` count of
  32-bit bitmaps, then ascending ``(u32 LE high key, 32-bit portable
  bitmap)`` pairs.
- the DV blob framing from the Iceberg v3 spec: a big-endian u32
  length of (magic + vector), the 4-byte magic ``D1 D3 39 64``, the
  serialized vector, and a big-endian CRC-32 of (magic + vector).
  The reader also accepts the byte-order spelling Delta Lake documents
  for the same shared format (magic number 1681511377 little-endian =
  ``D1 33 39 64``) — offline we cannot differential-test against a
  real v3 engine, so the reader is tolerant of both spellings and the
  writer emits the Iceberg spec's.

Everything here is driver/executor-agnostic pure bytes; the Spark-side
plumbing (distributed decode, anti-join application, maintenance
consolidation) lives in table.py / maintenance.py.

Positions are validated to ``0 <= pos < 2**63`` (Iceberg positions are
long-typed row indexes; a negative or >63-bit value is corruption, not
data).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

#: RoaringFormatSpec cookies.
_SERIAL_COOKIE_NO_RUNS = 12346
_SERIAL_COOKIE = 12347
#: With the run cookie, offset headers appear only at >= this many
#: containers (RoaringFormatSpec "NO_OFFSET_THRESHOLD").
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096  # container cardinality above which bitmaps win

#: Iceberg v3 DV blob magic (spec byte order) + Delta's spelling of the
#: same shared format, accepted on read.
DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])
_DV_MAGIC_ALT = bytes([0xD1, 0x33, 0x39, 0x64])


# ---------------------------------------------------------------- 32-bit


def _serialize32(values: np.ndarray) -> bytes:
    """Portable serialization of a sorted, unique uint32 array."""
    keys = (values >> np.uint32(16)).astype(np.uint16)
    lows = (values & np.uint32(0xFFFF)).astype(np.uint16)
    uniq_keys, starts = np.unique(keys, return_index=True)
    bounds = np.append(starts, len(values))
    n = len(uniq_keys)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUNS, n)
    desc = bytearray()
    bodies: list[bytes] = []
    for i in range(n):
        card = int(bounds[i + 1] - bounds[i])
        desc += struct.pack("<HH", int(uniq_keys[i]), card - 1)
        vals = lows[bounds[i] : bounds[i + 1]]
        if card <= _ARRAY_MAX:
            bodies.append(vals.astype("<u2").tobytes())
        else:
            bits = np.zeros(65536, dtype=bool)
            bits[vals] = True
            bodies.append(np.packbits(bits, bitorder="little").tobytes())
    # offset header: container starts measured from the stream start
    off = 8 + len(desc) + 4 * n
    offs = bytearray()
    for b in bodies:
        offs += struct.pack("<I", off)
        off += len(b)
    return head + bytes(desc) + bytes(offs) + b"".join(bodies)


def _deserialize32(buf: memoryview, pos: int) -> tuple[np.ndarray, int]:
    """Decode one portable 32-bit bitmap at ``buf[pos:]``.  Returns
    (sorted uint32 values, next offset).  Handles array, bitmap, AND
    run containers (foreign writers run-optimize)."""
    (cookie16,) = struct.unpack_from("<H", buf, pos)
    has_runs = cookie16 == _SERIAL_COOKIE
    if has_runs:
        (n_minus1,) = struct.unpack_from("<H", buf, pos + 2)
        n = n_minus1 + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, np.uint8, nbytes, pos), bitorder="little"
        )[:n].astype(bool)
        pos += nbytes
    else:
        cookie, n = struct.unpack_from("<II", buf, pos)
        if cookie != _SERIAL_COOKIE_NO_RUNS:
            raise ValueError(f"bad roaring cookie {cookie}")
        pos += 8
        run_flags = np.zeros(n, dtype=bool)
    desc = np.frombuffer(buf, "<u2", 2 * n, pos).reshape(n, 2)
    pos += 4 * n
    if not has_runs or n >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n  # offset header present; containers are in order anyway
    out: list[np.ndarray] = []
    for i in range(n):
        key = np.uint32(desc[i, 0]) << np.uint32(16)
        card = int(desc[i, 1]) + 1
        if run_flags[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, "<u2", 2 * n_runs, pos).reshape(n_runs, 2)
            pos += 4 * n_runs
            vals = np.concatenate(
                [
                    np.arange(int(s), int(s) + int(l) + 1, dtype=np.uint32)
                    for s, l in runs
                ]
            ) if n_runs else np.empty(0, np.uint32)
        elif card <= _ARRAY_MAX:
            vals = np.frombuffer(buf, "<u2", card, pos).astype(np.uint32)
            pos += 2 * card
        else:
            bits = np.unpackbits(
                np.frombuffer(buf, np.uint8, 8192, pos), bitorder="little"
            )
            vals = np.nonzero(bits)[0].astype(np.uint32)
            pos += 8192
            if len(vals) != card:
                raise ValueError(
                    f"bitmap container cardinality mismatch ({len(vals)} != {card})"
                )
        out.append(vals | key)
    values = np.concatenate(out) if out else np.empty(0, np.uint32)
    return values, pos


# ---------------------------------------------------------------- 64-bit


def serialize_positions(positions) -> bytes:
    """Sorted-unique uint64 positions → portable 64-bit roaring bytes."""
    arr = np.unique(np.asarray(positions, dtype=np.int64))
    if len(arr) and (arr[0] < 0):
        raise ValueError("negative delete position")
    arr = arr.astype(np.uint64)
    highs = (arr >> np.uint64(32)).astype(np.uint32)
    lows = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    uniq, starts = np.unique(highs, return_index=True)
    bounds = np.append(starts, len(arr))
    parts = [struct.pack("<Q", len(uniq))]
    for i, hk in enumerate(uniq):
        parts.append(struct.pack("<I", int(hk)))
        parts.append(_serialize32(lows[bounds[i] : bounds[i + 1]]))
    return b"".join(parts)


def deserialize_positions(data: bytes) -> np.ndarray:
    """Portable 64-bit roaring bytes → sorted uint64 position array."""
    buf = memoryview(data)
    (n_maps,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    out: list[np.ndarray] = []
    for _ in range(n_maps):
        (high,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        vals, pos = _deserialize32(buf, pos)
        out.append(vals.astype(np.uint64) | (np.uint64(high) << np.uint64(32)))
    if pos != len(buf):
        raise ValueError(f"trailing bytes after roaring bitmap ({len(buf) - pos})")
    return np.concatenate(out) if out else np.empty(0, np.uint64)


# ------------------------------------------------------------- DV framing


def dv_blob_bytes(positions) -> bytes:
    """Frame positions as an Iceberg v3 ``deletion-vector-v1`` blob."""
    vec = serialize_positions(positions)
    body = DV_MAGIC + vec
    return struct.pack(">I", len(body)) + body + struct.pack(">I", zlib.crc32(body))


def read_dv_blob(data: bytes) -> np.ndarray:
    """Decode + verify a ``deletion-vector-v1`` blob → uint64 positions."""
    if len(data) < 12:
        raise ValueError("deletion-vector blob too short")
    (length,) = struct.unpack_from(">I", data, 0)
    body = data[4 : 4 + length]
    if len(body) != length:
        raise ValueError("deletion-vector blob truncated")
    if body[:4] not in (DV_MAGIC, _DV_MAGIC_ALT):
        raise ValueError(f"bad deletion-vector magic {body[:4].hex()}")
    (crc,) = struct.unpack_from(">I", data, 4 + length)
    if crc != zlib.crc32(body):
        raise ValueError("deletion-vector CRC mismatch")
    out = deserialize_positions(body[4:])
    if len(out) and int(out[-1]) >= 2**63:
        # positions are long-typed row ordinals downstream; a foreign
        # blob past 2^63 would wrap NEGATIVE in the int64 casts and
        # silently stop matching — corruption, refuse loudly
        raise ValueError("deletion-vector position exceeds 2^63")
    return out
