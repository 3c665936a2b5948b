"""Puffin statistics-file codec (Iceberg's ``puffin-spec``).

Puffin is the container Iceberg points its table-metadata
``statistics`` entries at.  Layout (all from the public spec):

    Magic | Blob1 | Blob2 | ... | Footer
    Footer = Magic | FooterPayload (UTF-8 JSON) |
             FooterPayloadSize (4-byte little-endian) |
             Flags (4 bytes) | Magic

``Magic`` is the FourCC ``PFA1`` (0x50 0x46 0x41 0x31).  Flag bit 0 of
byte 0 marks an LZ4-compressed footer payload — this writer always
emits an UNCOMPRESSED payload (flags = 0), but the READER handles
foreign compressed footers: the spec pins footer/blob ``lz4`` to "a
single LZ4 frame with content size present", so the frame header's
content-size field supplies the ``decompressed_size`` pyarrow's
bundled lz4 codec requires.  Blob-level ``compression-codec`` values
``lz4`` and ``zstd`` are decoded the same way (zstd via the libzstd
bridge shared with the Avro codec layer).

FooterPayload JSON: ``{"blobs": [BlobMetadata...], "properties": {}}``
with each BlobMetadata carrying type / fields / snapshot-id /
sequence-number / offset / length / optional compression-codec /
properties.

The NDV statistic (icepack/stats.py) is serialized as a blob of type
``icepack-ndv-v1`` whose bytes are a small JSON document and whose
blob PROPERTIES carry ``ndv`` — the same property the standard
``apache-datasketches-theta-v1`` blobs advertise, so engines that read
NDV from blob metadata see the estimate, while engines that would
deserialize a theta sketch skip the unknown blob type cleanly (the
spec requires readers to ignore blob types they don't recognize).
Fabricating theta-sketch BYTES without the DataSketches library would
hand external engines a sketch that unions to garbage; a skippable
custom type is the honest encoding.
"""

from __future__ import annotations

import json
import struct

MAGIC = b"PFA1"

#: Flag (byte 0, bit 0): footer payload is LZ4-compressed.
_FLAG_FOOTER_COMPRESSED = 0x01

_LZ4_FRAME_MAGIC = 0x184D2204


def _lz4_content_size(frame: bytes) -> int:
    """Content size from an LZ4 frame header.  Puffin pins its lz4
    usage to frames WITH the content-size field (spec: "with content
    size present"), so its absence is a refusal, not a guess."""
    if len(frame) < 7 or struct.unpack("<I", frame[:4])[0] != _LZ4_FRAME_MAGIC:
        raise ValueError("not an LZ4 frame")
    flg = frame[4]
    if not flg & 0x08:  # content-size bit
        raise ValueError("LZ4 frame lacks content size (Puffin requires it)")
    return struct.unpack("<Q", frame[6:14])[0]


def _decompress(codec: str | None, data: bytes) -> bytes:
    if not codec:
        return data
    if codec == "lz4":
        import pyarrow as pa

        return pa.Codec("lz4").decompress(
            data, decompressed_size=_lz4_content_size(data), asbytes=True
        )
    if codec == "zstd":
        from .avroenc import _Zstd

        return _Zstd.decompress(data)
    raise ValueError(f"unsupported Puffin compression codec {codec!r}")


def write_puffin(blobs: list[dict], properties: dict | None = None) -> bytes:
    """Serialize blobs → Puffin bytes.  Each blob dict:
    ``{"type": str, "fields": [int], "snapshot-id": int,
    "sequence-number": int, "data": bytes, "properties": dict}``."""
    out = bytearray(MAGIC)
    metas = []
    for b in blobs:
        data = b["data"]
        metas.append(
            {
                "type": b["type"],
                "fields": list(b.get("fields", [])),
                "snapshot-id": int(b.get("snapshot-id", 0)),
                "sequence-number": int(b.get("sequence-number", 0)),
                "offset": len(out),
                "length": len(data),
                "properties": dict(b.get("properties", {})),
            }
        )
        out += data
    payload = json.dumps(
        {"blobs": metas, "properties": dict(properties or {})}
    ).encode("utf-8")
    out += MAGIC
    out += payload
    out += struct.pack("<i", len(payload))
    out += struct.pack("<i", 0)  # flags: uncompressed footer
    out += MAGIC
    return bytes(out)


def footer_size(puffin: bytes) -> int:
    """Total footer length in bytes (leading footer Magic through the
    trailing Magic) — what table metadata records as
    ``file-footer-size-in-bytes``."""
    (payload_len,) = struct.unpack("<i", puffin[-12:-8])
    return 4 + payload_len + 4 + 4 + 4


def read_puffin(puffin: bytes) -> tuple[list[dict], dict]:
    """Puffin bytes → (blobs-with-data, file properties); validates
    magics and rejects compressed footers."""
    if puffin[:4] != MAGIC or puffin[-4:] != MAGIC:
        raise ValueError("not a Puffin file (bad magic)")
    (flags,) = struct.unpack("<i", puffin[-8:-4])
    (payload_len,) = struct.unpack("<i", puffin[-12:-8])
    payload_start = len(puffin) - 12 - payload_len
    if puffin[payload_start - 4 : payload_start] != MAGIC:
        raise ValueError("corrupt Puffin footer (payload magic mismatch)")
    raw = puffin[payload_start : payload_start + payload_len]
    if flags & _FLAG_FOOTER_COMPRESSED:
        raw = _decompress("lz4", raw)
    doc = json.loads(raw)
    blobs = []
    for m in doc.get("blobs", []):
        b = dict(m)
        b["data"] = _decompress(
            m.get("compression-codec"),
            puffin[m["offset"] : m["offset"] + m["length"]],
        )
        blobs.append(b)
    return blobs, doc.get("properties", {})


def ndv_blob(
    column_field_id: int,
    snapshot_id: int,
    sequence_number: int,
    ndv: int,
    rows: int,
) -> dict:
    """The NDV statistic as a Puffin blob (custom skippable type; see
    module docstring for why not a fabricated theta sketch)."""
    return {
        "type": "icepack-ndv-v1",
        "fields": [column_field_id],
        "snapshot-id": snapshot_id,
        "sequence-number": sequence_number,
        "data": json.dumps({"ndv": ndv, "rows": rows}).encode("utf-8"),
        "properties": {"ndv": str(ndv)},
    }
