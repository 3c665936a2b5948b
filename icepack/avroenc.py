"""Minimal from-scratch Apache Avro binary codec + Object Container
File (OCF) reader/writer, implemented directly from the PUBLIC Avro
1.11 specification (binary encoding + object container files).  No
external avro library exists in this environment; the two Iceberg
manifest schemas are small, so a generic schema-driven codec is ~200
lines.

Used by :mod:`icepack.iceberg_export` to write SPEC-FORMAT Iceberg
manifests / manifest lists so an external Iceberg-speaking engine
(Trino, Snowflake, Spark+runtime-jar — docs/11-multi-engine-
compatibility.md:31-42,174-183) can read an exported icepack table.

Encoding rules implemented (Avro spec "Binary Encoding"):
- int/long: zig-zag base-128 varint
- float/double: IEEE-754 little-endian 4/8 bytes
- boolean: 1 byte; null: zero bytes
- bytes/string: long length prefix + raw/UTF-8 bytes
- fixed: raw bytes, no prefix
- record: fields concatenated in schema order
- enum: int position
- union: long branch index + encoded value
- array/map: blocks (long count, items, terminated by count 0)

OCF layout: magic ``Obj\\x01``, file-metadata map (``avro.schema``,
``avro.codec``), 16-byte sync marker, then data blocks of
(record count, byte size, payload, sync).

Codecs (Avro spec "Required"/"Optional" codecs): ``null``,
``deflate`` (raw RFC-1951), ``snappy`` (raw-format block + 4-byte
big-endian CRC32 of the UNCOMPRESSED data) and ``zstandard`` (one
zstd frame per block).  Snappy rides pyarrow's bundled codec (the
raw-snappy preamble is an unsigned LE varint of the uncompressed
length, which supplies the ``decompressed_size`` pyarrow requires);
zstandard uses the system ``libzstd`` via ctypes — frame-header
content size when present, streaming decompression when a foreign
writer omitted it.  Both gate behind availability checks and refuse
loudly rather than return garbage.
"""

from __future__ import annotations

import io
import json
import struct

MAGIC = b"Obj\x01"


# ----------------------------------------------------------------- encode


def _zigzag(n: int) -> bytes:
    """Avro int/long: zig-zag then base-128 little-endian varint."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_bytes(v: bytes) -> bytes:
    return _zigzag(len(v)) + v


def _encode_str(v: str) -> bytes:
    return _encode_bytes(v.encode("utf-8"))


def encode(value, schema, names: dict | None = None) -> bytes:
    """Schema-driven binary encoding of a Python value.

    *schema* is parsed Avro JSON: a type-name string, a dict, or a
    list (union).  Named records register in *names* so later
    references by name resolve (Avro named-type reuse)."""
    if names is None:
        names = {}
    if isinstance(schema, str):
        t = schema
        if t in names:
            return encode(value, names[t], names)
        if t == "null":
            if value is not None:
                raise ValueError(f"non-null {value!r} for null schema")
            return b""
        if t == "boolean":
            return b"\x01" if value else b"\x00"
        if t in ("int", "long"):
            return _zigzag(int(value))
        if t == "float":
            return struct.pack("<f", float(value))
        if t == "double":
            return struct.pack("<d", float(value))
        if t == "bytes":
            return _encode_bytes(bytes(value))
        if t == "string":
            return _encode_str(value)
        raise ValueError(f"unknown type {t!r}")
    if isinstance(schema, list):  # union: branch index + value
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                return _zigzag(i) + b""
            if value is not None and bt != "null":
                return _zigzag(i) + encode(value, branch, names)
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    t = schema["type"]
    if t == "record":
        names[schema["name"]] = schema
        out = bytearray()
        for f in schema["fields"]:
            if isinstance(value, dict):
                fv = value.get(f["name"])
            else:
                fv = getattr(value, f["name"])
            out += encode(fv, f["type"], names)
        return bytes(out)
    if t == "fixed":
        names[schema["name"]] = schema
        if len(value) != schema["size"]:
            raise ValueError(f"fixed size {schema['size']} != {len(value)}")
        return bytes(value)
    if t == "enum":
        names[schema["name"]] = schema
        return _zigzag(schema["symbols"].index(value))
    if t == "array":
        out = bytearray()
        items = list(value or [])
        if items:
            out += _zigzag(len(items))
            for it in items:
                out += encode(it, schema["items"], names)
        out += _zigzag(0)
        return bytes(out)
    if t == "map":
        out = bytearray()
        entries = dict(value or {})
        if entries:
            out += _zigzag(len(entries))
            for k, v in entries.items():
                out += _encode_str(k) + encode(v, schema["values"], names)
        out += _zigzag(0)
        return bytes(out)
    # {"type": "long", ...} wrapper (e.g. with logicalType attributes)
    return encode(value, t, names)


# ----------------------------------------------------------------- decode


class _Reader:
    def __init__(self, buf: bytes):
        self.io = io.BytesIO(buf)

    def read(self, n: int) -> bytes:
        b = self.io.read(n)
        if len(b) != n:
            raise EOFError("truncated avro data")
        return b

    def zigzag(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)


def decode(r: _Reader, schema, names: dict | None = None):
    """Schema-driven decode — the independent half of the round-trip
    proof (generic walker over the schema, shares no structure-specific
    code with the export writer)."""
    if names is None:
        names = {}
    if isinstance(schema, str):
        t = schema
        if t in names:
            return decode(r, names[t], names)
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) == b"\x01"
        if t in ("int", "long"):
            return r.zigzag()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.read(r.zigzag())
        if t == "string":
            return r.read(r.zigzag()).decode("utf-8")
        raise ValueError(f"unknown type {t!r}")
    if isinstance(schema, list):
        return decode(r, schema[r.zigzag()], names)
    t = schema["type"]
    if t == "record":
        names[schema["name"]] = schema
        return {f["name"]: decode(r, f["type"], names) for f in schema["fields"]}
    if t == "fixed":
        names[schema["name"]] = schema
        return r.read(schema["size"])
    if t == "enum":
        names[schema["name"]] = schema
        return schema["symbols"][r.zigzag()]
    if t == "array":
        out = []
        while True:
            n = r.zigzag()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                r.zigzag()
            for _ in range(n):
                out.append(decode(r, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            n = r.zigzag()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.zigzag()
            for _ in range(n):
                k = r.read(r.zigzag()).decode("utf-8")
                out[k] = decode(r, schema["values"], names)
    return decode(r, t, names)


# ------------------------------------------------------------ codecs

# Codec-string normalization: Avro's OCF metadata spells the zstd
# codec "zstandard" (that is what Java Avro writes); accept the
# common short spelling on input but always WRITE the spec spelling.
_CODEC_ALIASES = {"zstd": "zstandard", "": "null"}
WRITE_CODECS = ("null", "deflate", "snappy", "zstandard")


def _norm_codec(codec: str) -> str:
    c = codec.strip().lower()
    return _CODEC_ALIASES.get(c, c)


def _snappy_raw_len(buf: bytes) -> int:
    """Raw-snappy preamble: uncompressed length as unsigned LE varint."""
    n = shift = i = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated snappy block")
        b = buf[i]
        n |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return n
        shift += 7
        if shift > 35:
            raise ValueError("snappy length varint overflow")


class _Zstd:
    """ctypes bridge to the system libzstd (no Python zstd package in
    this environment; pyarrow's zstd codec requires a known
    decompressed size, which foreign frames may omit)."""

    _lib = None

    @classmethod
    def lib(cls):
        if cls._lib is None:
            import ctypes
            import ctypes.util

            name = ctypes.util.find_library("zstd") or "libzstd.so.1"
            lib = ctypes.CDLL(name)
            lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
            lib.ZSTD_getFrameContentSize.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
            ]
            lib.ZSTD_decompress.restype = ctypes.c_size_t
            lib.ZSTD_decompress.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_char_p,
                ctypes.c_size_t,
            ]
            lib.ZSTD_compressBound.restype = ctypes.c_size_t
            lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
            lib.ZSTD_compress.restype = ctypes.c_size_t
            lib.ZSTD_compress.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_int,
            ]
            lib.ZSTD_isError.restype = ctypes.c_uint
            lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
            cls._lib = lib
        return cls._lib

    # ZSTD_CONTENTSIZE_UNKNOWN / _ERROR are (0ULL-1) and (0ULL-2)
    _UNKNOWN = 2**64 - 1
    _ERROR = 2**64 - 2

    @classmethod
    def compress(cls, data: bytes, level: int = 3) -> bytes:
        import ctypes

        lib = cls.lib()
        bound = lib.ZSTD_compressBound(len(data))
        dst = ctypes.create_string_buffer(bound)
        n = lib.ZSTD_compress(dst, bound, data, len(data), level)
        if lib.ZSTD_isError(n):
            raise ValueError("zstd compression failed")
        return dst.raw[:n]

    @classmethod
    def decompress(cls, data: bytes) -> bytes:
        import ctypes

        lib = cls.lib()
        size = lib.ZSTD_getFrameContentSize(data, len(data))
        if size == cls._ERROR:
            raise ValueError("not a zstd frame")
        if size != cls._UNKNOWN:
            dst = ctypes.create_string_buffer(max(int(size), 1))
            n = lib.ZSTD_decompress(dst, int(size), data, len(data))
            if lib.ZSTD_isError(n) or n != size:
                raise ValueError("zstd decompression failed")
            return dst.raw[:size]
        return cls._decompress_stream(data)

    @classmethod
    def _decompress_stream(cls, data: bytes) -> bytes:
        """Streaming path for frames whose header omits the content
        size (foreign streaming writers)."""
        import ctypes

        lib = cls.lib()

        class _Buf(ctypes.Structure):
            _fields_ = [
                ("ptr", ctypes.c_void_p),
                ("size", ctypes.c_size_t),
                ("pos", ctypes.c_size_t),
            ]

        # argtypes matter: without them ctypes passes the 64-bit
        # DStream pointer as a C int and truncates it (segfault)
        lib.ZSTD_createDStream.restype = ctypes.c_void_p
        lib.ZSTD_createDStream.argtypes = []
        lib.ZSTD_decompressStream.restype = ctypes.c_size_t
        lib.ZSTD_decompressStream.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(_Buf),
            ctypes.POINTER(_Buf),
        ]
        lib.ZSTD_DStreamOutSize.restype = ctypes.c_size_t
        lib.ZSTD_DStreamOutSize.argtypes = []
        lib.ZSTD_freeDStream.restype = ctypes.c_size_t
        lib.ZSTD_freeDStream.argtypes = [ctypes.c_void_p]
        ds = lib.ZSTD_createDStream()
        try:
            src = ctypes.create_string_buffer(data, len(data))
            inp = _Buf(ctypes.cast(src, ctypes.c_void_p), len(data), 0)
            chunk = lib.ZSTD_DStreamOutSize()
            outbuf = ctypes.create_string_buffer(chunk)
            parts = []
            while True:
                out = _Buf(ctypes.cast(outbuf, ctypes.c_void_p), chunk, 0)
                r = lib.ZSTD_decompressStream(
                    ds, ctypes.byref(out), ctypes.byref(inp)
                )
                if lib.ZSTD_isError(r):
                    raise ValueError("zstd stream decompression failed")
                parts.append(outbuf.raw[: out.pos])
                if r == 0 and inp.pos >= inp.size:
                    break  # frame(s) fully flushed and input consumed
                if inp.pos >= inp.size and out.pos == 0:
                    # input exhausted mid-frame with nothing left to
                    # flush: a truncated content-size-less frame must
                    # ERROR, not silently return partial bytes
                    # (downstream Avro block decoding would fail
                    # confusingly or decode a truncated record set)
                    raise ValueError(
                        "truncated zstd frame: input ended before the "
                        "frame completed"
                    )
            return b"".join(parts)
        finally:
            lib.ZSTD_freeDStream(ds)


def _compress_block(codec: str, body: bytes) -> bytes:
    if codec == "null":
        return body
    if codec == "deflate":
        import zlib

        co = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate
        return co.compress(body) + co.flush()
    if codec == "snappy":
        import zlib

        import pyarrow as pa

        comp = pa.Codec("snappy").compress(body, asbytes=True)
        return comp + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    if codec == "zstandard":
        return _Zstd.compress(body)
    raise ValueError(f"unsupported avro write codec {codec!r}")


def _decompress_block(codec: str, payload: bytes) -> bytes:
    if codec == "null":
        return payload
    if codec == "deflate":
        import zlib

        return zlib.decompress(payload, -15)
    if codec == "snappy":
        import zlib

        import pyarrow as pa

        if len(payload) < 4:
            raise ValueError("snappy block too short for CRC trailer")
        comp, crc = payload[:-4], struct.unpack(">I", payload[-4:])[0]
        n = _snappy_raw_len(comp)
        body = pa.Codec("snappy").decompress(
            comp, decompressed_size=n, asbytes=True
        )
        if zlib.crc32(body) & 0xFFFFFFFF != crc:
            raise ValueError("snappy block CRC mismatch (corrupt container)")
        return body
    if codec == "zstandard":
        return _Zstd.decompress(payload)
    raise ValueError(f"unsupported avro codec {codec!r}")


# ------------------------------------------------------------ containers


def write_container(
    schema: dict,
    records: list,
    sync: bytes,
    extra_meta: dict[str, bytes] | None = None,
    codec: str = "null",
) -> bytes:
    """Serialize an Avro Object Container File (one data block).
    *sync* must be exactly 16 bytes; passing it in (rather than
    randomizing) keeps exports deterministic for byte-level golden
    tests.  *extra_meta* adds key→bytes entries to the OCF
    file-metadata map — the Iceberg spec requires manifests to embed
    ``schema``/``partition-spec``/``format-version``/… there, and
    Java-based readers hard-fail when they're absent.  *codec* is
    ``null``, ``deflate`` (raw RFC-1951, zlib level 6 — deterministic
    for goldens), ``snappy`` or ``zstandard`` (alias ``zstd``)."""
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    codec = _norm_codec(codec)
    if codec not in WRITE_CODECS:
        raise ValueError(f"unsupported avro write codec {codec!r}")
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    for k, v in (extra_meta or {}).items():
        if k.startswith("avro."):
            raise ValueError(f"reserved avro metadata key {k!r}")
        meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")
    out = bytearray(MAGIC)
    out += _zigzag(len(meta))
    for k, v in sorted(meta.items()):
        out += _encode_str(k) + _encode_bytes(v)
    out += _zigzag(0)
    out += sync
    payload = bytearray()
    names: dict = {}
    for rec in records:
        payload += encode(rec, schema, names)
    body = _compress_block(codec, bytes(payload))
    out += _zigzag(len(records)) + _zigzag(len(body)) + body + sync
    return bytes(out)


def read_container(buf: bytes) -> tuple[dict, list]:
    """Parse an OCF produced by any writer (null codec only): returns
    (schema, records)."""
    schema, records, _meta = read_container_with_meta(buf)
    return schema, records


def read_container_with_meta(buf: bytes) -> tuple[dict, list, dict]:
    """Like :func:`read_container` but also returns the OCF
    file-metadata map (key → raw bytes) so callers can check the
    spec-required Iceberg manifest properties."""
    r = _Reader(buf)
    if r.read(4) != MAGIC:
        raise ValueError("not an avro object container file")
    meta = {}
    while True:
        n = r.zigzag()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.zigzag()
        for _ in range(n):
            k = r.read(r.zigzag()).decode("utf-8")
            meta[k] = r.read(r.zigzag())
    codec = _norm_codec(meta.get("avro.codec", b"null").decode("utf-8"))
    if codec not in WRITE_CODECS:
        raise ValueError(f"unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = r.read(16)
    records = []
    while True:
        try:
            n = r.zigzag()
        except EOFError:
            return schema, records, meta
        size = r.zigzag()
        payload = _decompress_block(codec, r.read(size))
        block = _Reader(payload)
        names: dict = {}
        for _ in range(n):
            records.append(decode(block, schema, names))
        if r.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt container)")
