"""Spec-format Iceberg export: from-scratch Avro codec round-trips,
byte-level goldens, export → independent decode reread equality, and
the spec murmur3 bucket (docs/11-multi-engine-compatibility.md:31-42 —
the interop story assumes any Iceberg-speaking engine can read the
table)."""

import datetime as dt
import hashlib
import json
import os
import struct

import pytest
from pyspark.sql import functions as F, types as T

from icepack.avroenc import (
    _Reader,
    decode,
    encode,
    read_container,
    read_container_with_meta,
    write_container,
)
from icepack.iceberg_export import export_iceberg, read_exported_file_list
from icepack.murmur3 import bucket, iceberg_hash_bytes, murmur3_x86_32
from icepack.table import IceTable


# ------------------------------------------------------------- avro codec


def test_avro_primitive_roundtrip():
    cases = [
        ("null", None),
        ("boolean", True),
        ("boolean", False),
        ("int", 0),
        ("int", -1),
        ("int", 2147483647),
        ("long", -(2**62)),
        ("long", 2**62),
        ("float", 1.5),
        ("double", -2.25),
        ("bytes", b"\x00\x01\xff"),
        ("string", "ünïcode ❄"),
    ]
    for schema, v in cases:
        got = decode(_Reader(encode(v, schema)), schema)
        assert got == v, (schema, v, got)


def test_avro_zigzag_known_bytes():
    """Spec examples: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01."""
    for v, want in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                    (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")]:
        assert encode(v, "long") == want, v


def test_avro_complex_roundtrip():
    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {"name": "a", "type": ["null", "long"], "default": None},
            {"name": "b", "type": {"type": "array", "items": "string"}},
            {"name": "c", "type": {"type": "map", "values": "int"}},
            {
                "name": "d",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": "double"}],
                },
            },
            {"name": "e", "type": ["null", "inner"], "default": None},  # named reuse
        ],
    }
    rec = {
        "a": None,
        "b": ["p", "q"],
        "c": {"k1": 1, "k2": -2},
        "d": {"x": 3.5},
        "e": {"x": -1.0},
    }
    names = {}
    buf = encode(rec, schema, names)
    got = decode(_Reader(buf), schema, {})
    assert got == rec


def test_avro_container_roundtrip_and_golden():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    recs = [{"i": 1, "s": "a"}, {"i": -5, "s": "bb"}]
    sync = bytes(range(16))
    buf = write_container(schema, recs, sync)
    schema2, recs2 = read_container(buf)
    assert recs2 == recs
    assert schema2 == schema
    # deterministic bytes → stable digest (byte-level golden: any codec
    # change that alters the wire format must be a conscious decision)
    assert hashlib.sha256(buf).hexdigest() == (
        "0a04e6a8d554f504bc80ff6b69ba86f2214ebc7ef08acdece921e45a59420113"
    )


def test_avro_deflate_codec_roundtrip():
    """deflate (raw RFC-1951) is the spec's required compression codec:
    writes must round-trip through our own reader, shrink the payload,
    and reject unknown codecs."""
    import zlib

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "s", "type": "string"}],
    }
    recs = [{"s": "abcabcabc" * 50} for _ in range(200)]  # compressible
    sync = bytes(range(16))
    null_buf = write_container(schema, recs, sync)
    defl_buf = write_container(schema, recs, sync, codec="deflate")
    assert len(defl_buf) < len(null_buf) / 5
    _, got = read_container(defl_buf)
    assert got == recs
    # snappy (pyarrow codec + big-endian CRC32 trailer) and zstandard
    # (libzstd frame) round-trip and compress; "zstd" normalizes to
    # the spec's "zstandard" metadata spelling; unknown codecs refuse
    import pytest as _pytest

    for c in ("snappy", "zstandard", "zstd"):
        buf = write_container(schema, recs, sync, codec=c)
        assert len(buf) < len(null_buf) / 3
        got_schema, got_recs, got_meta = read_container_with_meta(buf)
        assert got_recs == recs
        assert got_meta["avro.codec"] in (b"snappy", b"zstandard")
    with _pytest.raises(ValueError):
        write_container(schema, recs, sync, codec="bzip2")


def test_avro_snappy_foreign_block_and_zstd_stream():
    """Codec interop beyond our own writer: a snappy block assembled
    independently (pyarrow compress + big-endian CRC32, as Java Avro
    writes it) decodes; a corrupted CRC refuses; and the zstd
    STREAMING decompressor (the path for foreign frames that omit the
    frame-header content size) reproduces the one-shot result."""
    import struct
    import zlib

    import pyarrow as pa

    from icepack.avroenc import _Zstd, _zigzag, encode

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "i", "type": "long"}],
    }
    recs = [{"i": i} for i in range(500)]
    sync = bytes(range(16))
    payload = bytearray()
    names: dict = {}
    for rec in recs:
        payload += encode(rec, schema, names)
    comp = pa.Codec("snappy").compress(bytes(payload), asbytes=True)
    block = comp + struct.pack(">I", zlib.crc32(bytes(payload)) & 0xFFFFFFFF)
    buf = bytearray(b"Obj\x01")
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"snappy",
    }
    buf += _zigzag(len(meta))
    for k, v in sorted(meta.items()):
        buf += _zigzag(len(k.encode())) + k.encode()
        buf += _zigzag(len(v)) + v
    buf += _zigzag(0) + sync
    buf += _zigzag(len(recs)) + _zigzag(len(block)) + bytes(block) + sync
    _, got = read_container(bytes(buf))
    assert [r["i"] for r in got] == list(range(500))

    # flip a CRC byte → loud refusal, not silent garbage
    bad = bytearray(buf)
    bad[-17] ^= 0xFF  # last CRC byte (block trailer sits before sync)
    with pytest.raises(ValueError, match="CRC"):
        read_container(bytes(bad))

    # streaming zstd decode matches one-shot on the same frame
    data = b"streaming zstd block " * 300
    frame = _Zstd.compress(data)
    assert _Zstd.decompress(frame) == data
    assert _Zstd._decompress_stream(frame) == data
    # a TRUNCATED frame errors loudly instead of returning partial
    # bytes (ADVICE r6: silent partials corrupt downstream Avro blocks)
    with pytest.raises(ValueError, match="truncated zstd"):
        _Zstd._decompress_stream(frame[: len(frame) // 2])


# ---------------------------------------------------------------- murmur3


def test_murmur3_spec_vectors():
    """Published hash vectors from the Iceberg spec (Appendix B)."""
    assert murmur3_x86_32(iceberg_hash_bytes(34)) == 2017239379  # int
    assert murmur3_x86_32(iceberg_hash_bytes(34), 0) == 2017239379  # long same
    assert murmur3_x86_32(b"iceberg") == 1210000089  # string
    assert murmur3_x86_32(iceberg_hash_bytes(dt.date(2017, 11, 16))) == -653330422
    assert (
        murmur3_x86_32(iceberg_hash_bytes(dt.datetime(2017, 11, 16, 22, 31, 8)))
        == -2047944441
    )
    assert murmur3_x86_32(bytes([0, 1, 2, 3])) == -188683207  # binary
    import decimal
    import uuid

    assert (
        murmur3_x86_32(
            iceberg_hash_bytes(uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7"))
        )
        == 1488055340
    )
    assert (
        murmur3_x86_32(iceberg_hash_bytes(decimal.Decimal("14.20"))) == -500754589
    )
    assert bucket(None, 16) is None


def test_timestamp_micros_exact_and_tz():
    """float total_seconds()*1e6 rounds micros off-by-one for ~1% of
    values; micros must come exactly from timedelta integer components,
    and tz-aware datetimes must convert to UTC (not drop the offset)."""
    from icepack.murmur3 import timestamp_micros

    v = dt.datetime(2005, 3, 28, 19, 42, 50, 536110)
    assert timestamp_micros(v) == 1112038970536110  # float path gave …109
    assert bucket(v, 16) == 1
    # same instant expressed at +02:00 must hash identically
    tz = dt.datetime(
        2005, 3, 28, 21, 42, 50, 536110,
        tzinfo=dt.timezone(dt.timedelta(hours=2)),
    )
    assert timestamp_micros(tz) == 1112038970536110
    assert bucket(tz, 16) == 1
    # pre-epoch value exercises negative days
    pre = dt.datetime(1969, 12, 31, 23, 59, 59, 999999)
    assert timestamp_micros(pre) == -1
    # sweep: exact integer identity for a spread of micros values
    for us in (1, 3, 7, 123457, 536110, 999999):
        for base in (0, 10**6, 86_400 * 10**6 * 365):
            w = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=base + us)
            assert timestamp_micros(w) == base + us


# ---------------------------------------------------------------- export


def _mk_table(spark, tmp_path, partition_by=None, name="exp_t"):
    loc = str(tmp_path / name)
    df = spark.createDataFrame(
        [
            (1, "alpha", dt.date(2024, 1, 10), 1.5),
            (2, "beta", dt.date(2024, 1, 20), 2.5),
            (3, "gamma", dt.date(2024, 2, 10), None),
            (4, None, dt.date(2024, 2, 20), 4.5),
        ],
        "id bigint, name string, d date, v double",
    )
    t = IceTable.create(spark, loc, df.schema, partition_by=partition_by)
    t.append(df)
    return t, df


def test_export_matches_live_files(spark, tmp_path):
    t, df = _mk_table(spark, tmp_path, partition_by=[("d", "month")])
    t.append(df.withColumn("id", F.col("id") + 10))
    mpath = export_iceberg(t)
    got = read_exported_file_list(mpath)
    want = sorted((f.path, f.record_count) for f in t.live_files())
    assert got == want
    assert sum(rc for _, rc in got) == t.toDF().count()


def test_export_metadata_shape_and_types(spark, tmp_path):
    t, _ = _mk_table(spark, tmp_path, partition_by=[("d", "day"), ("id", "mmh3bucket[8]")])
    mpath = export_iceberg(t)
    md = json.load(open(mpath))
    for k in (
        "format-version", "table-uuid", "location", "last-sequence-number",
        "last-column-id", "current-schema-id", "schemas", "partition-specs",
        "default-spec-id", "last-partition-id", "sort-orders",
        "current-snapshot-id", "snapshots", "refs",
    ):
        assert k in md, k
    assert md["format-version"] == 2
    sch = md["schemas"][0]
    assert sch["type"] == "struct"
    types = {f["name"]: f["type"] for f in sch["fields"]}
    assert types == {"id": "long", "name": "string", "d": "date", "v": "double"}
    ids = [f["id"] for f in sch["fields"]]
    assert len(set(ids)) == len(ids)
    # transforms: day 1:1; mmh3bucket exported as spec bucket
    spec = md["partition-specs"][0]
    tr = {f["name"]: f["transform"] for f in spec["fields"]}
    assert "day" in tr.values()
    assert "bucket[8]" in tr.values()
    # version-hint present (HadoopCatalog layout)
    assert open(os.path.join(os.path.dirname(mpath), "version-hint.text")).read() == "1"


def test_export_native_xxhash_bucket_becomes_void(spark, tmp_path):
    t, _ = _mk_table(spark, tmp_path, partition_by=[("id", "bucket[4]")])
    md = json.load(open(export_iceberg(t)))
    assert md["partition-specs"][0]["fields"][0]["transform"] == "void"


def test_export_partition_values_spec_numeric(spark, tmp_path):
    """Partition values in exported manifests use the spec's numeric
    encodings, reproducible by an external engine: month → months
    since 1970-01; mmh3bucket → the spec murmur3 bucket of the source
    value."""
    t, _ = _mk_table(spark, tmp_path, partition_by=[("d", "month"), ("id", "mmh3bucket[8]")])
    mpath = export_iceberg(t)
    md = json.load(open(mpath))
    snap = md["snapshots"][0]
    _, mlist = read_container(open(snap["manifest-list"], "rb").read())
    parts = []
    for m in mlist:
        _, entries = read_container(open(m["manifest_path"], "rb").read())
        parts += [e["data_file"]["partition"] for e in entries]
    months = {p["d_month"] for p in parts}
    assert months == {(2024 - 1970) * 12 + 0, (2024 - 1970) * 12 + 1}
    # every bucket value equals the spec bucket of SOME source id
    spec_buckets = {bucket(i, 8) for i in [1, 2, 3, 4]}
    assert {p["id_mmh3bucket"] for p in parts} <= spec_buckets


def test_export_bounds_single_value_serialization(spark, tmp_path):
    t, _ = _mk_table(spark, tmp_path)
    mpath = export_iceberg(t)
    md = json.load(open(mpath))
    _, mlist = read_container(open(md["snapshots"][0]["manifest-list"], "rb").read())
    _, entries = read_container(open(mlist[0]["manifest_path"], "rb").read())
    df_ids = {f["name"]: f["id"] for f in md["schemas"][0]["fields"]}
    # aggregate across files (parallel write → several files per append)
    id_lo, id_hi, d_lo, name_lo, nulls_total = [], [], [], [], {}
    for ent in entries:
        e = ent["data_file"]
        lowers = {kv["key"]: kv["value"] for kv in e["lower_bounds"]}
        uppers = {kv["key"]: kv["value"] for kv in e["upper_bounds"]}
        id_lo.append(struct.unpack("<q", lowers[df_ids["id"]])[0])
        id_hi.append(struct.unpack("<q", uppers[df_ids["id"]])[0])
        d_lo.append(struct.unpack("<i", lowers[df_ids["d"]])[0])
        if df_ids["name"] in lowers:
            name_lo.append(lowers[df_ids["name"]])
        for kv in e["null_value_counts"]:
            nulls_total[kv["key"]] = nulls_total.get(kv["key"], 0) + kv["value"]
    assert min(id_lo) == 1 and max(id_hi) == 4  # long little-endian
    assert min(d_lo) == (dt.date(2024, 1, 10) - dt.date(1970, 1, 1)).days
    assert min(name_lo) == b"alpha"  # utf-8 bytes
    assert nulls_total[df_ids["name"]] == 1
    assert nulls_total[df_ids["v"]] == 1


def test_export_history_time_travel(spark, tmp_path):
    t, df = _mk_table(spark, tmp_path)
    t.append(df.withColumn("id", F.col("id") + 10))
    t.append(df.withColumn("id", F.col("id") + 20))
    mpath = export_iceberg(t, history=True)
    md = json.load(open(mpath))
    assert len(md["snapshots"]) == 3
    snaps = sorted(t.meta.snapshots, key=lambda s: s.sequence_number)
    for s in snaps:
        got = read_exported_file_list(mpath, s.snapshot_id)
        want = sorted((f.path, f.record_count) for f in t.live_files(s))
        assert got == want, f"snapshot {s.snapshot_id} diverged"
    # parent links preserved within the exported set
    by_id = {s["snapshot-id"]: s for s in md["snapshots"]}
    assert by_id[snaps[1].snapshot_id]["parent-snapshot-id"] == snaps[0].snapshot_id


def test_exported_file_list_skips_delete_manifests(spark, tmp_path):
    """read_exported_file_list returns the DATA file list even when the
    export carries delete manifests (MOR export no longer refuses)."""
    from icepack.expr import col

    t, _ = _mk_table(spark, tmp_path)
    t.delete(col("id") == 2, mode="merge-on-read")
    mpath = export_iceberg(t)
    got = read_exported_file_list(mpath)
    assert got == sorted((f.path, f.record_count) for f in t.live_files())


def test_export_after_schema_evolution(spark, tmp_path):
    t, df = _mk_table(spark, tmp_path)
    t.add_column("extra", T.StringType())
    mpath = export_iceberg(t)
    md = json.load(open(mpath))
    cur = next(s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"])
    assert "extra" in {f["name"] for f in cur["fields"]}
    assert read_exported_file_list(mpath) == sorted(
        (f.path, f.record_count) for f in t.live_files()
    )


def test_export_identity_partition_of_dropped_column(spark, tmp_path):
    """Identity partitions whose source column was dropped (or whose
    type maps to string) export as stringified values instead of
    crashing the Avro encoder (r5 audit)."""
    loc = str(tmp_path / "dropcol_t")
    df = spark.createDataFrame(
        [(1, 7, "a"), (2, 8, "b")], "id bigint, bucketed bigint, s string"
    )
    t = IceTable.create(spark, loc, df.schema, partition_by=[("bucketed", "identity")])
    t.append(df)
    t.drop_column("bucketed")
    mpath = export_iceberg(t)
    got = read_exported_file_list(mpath)
    assert got == sorted((f.path, f.record_count) for f in t.live_files())


def test_avro_property_roundtrip_random():
    """Randomized schema-driven round-trip sweep over the codec: any
    value tree matching a generated schema must decode byte-exactly —
    the same method that found real range-merge bugs in r4 (AUDIT §14)
    applied to the new codec."""
    from hypothesis import given, settings, strategies as st

    prim = st.sampled_from(["boolean", "int", "long", "double", "string", "bytes"])

    def value_for(schema, draw_from):
        return draw_from(schema)

    @st.composite
    def schema_and_value(draw, depth=2):
        kind = draw(
            st.sampled_from(
                ["prim", "union", "array", "map", "record"] if depth > 0 else ["prim"]
            )
        )
        if kind == "prim":
            p = draw(prim)
            v = draw(
                {
                    "boolean": st.booleans(),
                    "int": st.integers(-(2**31), 2**31 - 1),
                    "long": st.integers(-(2**63), 2**63 - 1),
                    "double": st.floats(allow_nan=False, width=64),
                    "string": st.text(max_size=20),
                    "bytes": st.binary(max_size=20),
                }[p]
            )
            return p, v
        if kind == "union":
            # the Avro spec forbids unions as immediate union members
            p, v = draw(schema_and_value(depth=depth - 1))
            while isinstance(p, list):
                p, v = draw(schema_and_value(depth=depth - 1))
            if draw(st.booleans()):
                return ["null", p], None
            return ["null", p], v
        if kind == "array":
            p, proto = draw(schema_and_value(depth=depth - 1))
            n = draw(st.integers(0, 3))
            return {"type": "array", "items": p}, [proto] * n
        if kind == "map":
            p, proto = draw(schema_and_value(depth=depth - 1))
            keys = draw(st.lists(st.text(max_size=8), max_size=3, unique=True))
            return {"type": "map", "values": p}, {k: proto for k in keys}
        # record
        nf = draw(st.integers(1, 3))
        fields, rec = [], {}
        for i in range(nf):
            p, v = draw(schema_and_value(depth=depth - 1))
            fields.append({"name": f"f{i}", "type": p})
            rec[f"f{i}"] = v
        name = f"rec{draw(st.integers(0, 10**6))}"
        return {"type": "record", "name": name, "fields": fields}, rec

    @settings(max_examples=150, deadline=None)
    @given(schema_and_value())
    def run(sv):
        schema, value = sv
        wrapper = {
            "type": "record",
            "name": "top",
            "fields": [{"name": "v", "type": schema}],
        }
        buf = write_container(wrapper, [{"v": value}], bytes(16))
        schema2, recs = read_container(buf)
        assert schema2 == wrapper
        assert len(recs) == 1
        assert recs[0]["v"] == value

    run()


def test_export_after_partition_evolution_groups_by_spec(spark, tmp_path):
    """Partition evolution leaves old files on the old spec; a spec-
    correct export writes ONE MANIFEST PER SPEC per snapshot (a
    manifest's entries must share its declared partition schema), and
    the independent reread still matches live_files()."""
    loc = str(tmp_path / "pe_t")
    df = spark.createDataFrame(
        [(i, dt.date(2024, 1 + (i % 2), 5), float(i)) for i in range(8)],
        "id bigint, d date, v double",
    )
    t = IceTable.create(spark, loc, df.schema, partition_by=[("d", "month")])
    t.append(df)
    t.update_spec([("d", "day")])  # evolve; old files stay on month spec
    t.append(df.withColumn("id", F.col("id") + 100))
    mpath = export_iceberg(t)
    md = json.load(open(mpath))
    assert len(md["partition-specs"]) == 2
    _, mlist = read_container(open(md["snapshots"][0]["manifest-list"], "rb").read())
    spec_ids = sorted(m["partition_spec_id"] for m in mlist)
    assert spec_ids == [0, 1], "one manifest per partition spec"
    assert read_exported_file_list(mpath) == sorted(
        (f.path, f.record_count) for f in t.live_files()
    )


# ----------------------------------------------------------------- import


def test_read_iceberg_roundtrip_current_and_time_travel(spark, tmp_path):
    """export → read_iceberg round-trip: the spec-format metadata
    resolves to row-identical data at the current snapshot AND at each
    historical snapshot (docs/11: interop is bidirectional)."""
    from icepack.iceberg_import import read_iceberg

    t, df = _mk_table(spark, tmp_path, partition_by=[("d", "month")])
    t.append(df.withColumn("id", F.col("id") + 10))
    mpath = export_iceberg(t, history=True)
    base = os.path.dirname(mpath)

    def rows(x):
        return sorted(map(tuple, x.collect()))

    got = read_iceberg(spark, mpath)
    assert rows(got) == rows(t.toDF().select(*got.columns))
    # version-hint resolution from the directory
    assert rows(read_iceberg(spark, base)) == rows(got)
    # time travel through exported history
    for s in t.meta.snapshots:
        a = read_iceberg(spark, mpath, snapshot_id=s.snapshot_id)
        b = t.toDF(snapshot=s).select(*a.columns)
        assert rows(a) == rows(b), f"snapshot {s.snapshot_id} diverged"


def test_live_files_refuses_deletes_and_malformed_content_raises(spark, tmp_path):
    """iceberg_live_files (the bare file list) refuses snapshots with
    delete files; read_iceberg raises on malformed delete manifests
    whose entries carry no delete content code — never silent."""
    from icepack.iceberg_import import iceberg_live_files, read_iceberg

    t, _ = _mk_table(spark, tmp_path)
    mpath = export_iceberg(t)
    md = json.load(open(mpath))
    mlist_path = md["snapshots"][0]["manifest-list"]
    schema, recs = read_container(open(mlist_path, "rb").read())
    recs[0]["content"] = 1  # pretend it's a delete manifest
    open(mlist_path, "wb").write(write_container(schema, recs, bytes(16)))
    with pytest.raises(ValueError, match="resurrect"):
        iceberg_live_files(json.load(open(mpath)))
    with pytest.raises(ValueError, match="content"):
        read_iceberg(spark, mpath).collect()


def test_export_and_read_mor_deletes(spark, tmp_path):
    """Merge-on-read tables now EXPORT (content=1 delete manifests,
    spec field-ids, normalized+sorted position deletes) and read_iceberg
    APPLIES them with the spec sequence rules — row-identical to the
    native scan, including a row re-inserted after its equality delete
    (newer sequence must survive)."""
    from icepack.expr import col as icol
    from icepack.iceberg_import import read_iceberg

    loc = str(tmp_path / "mor exp")  # space: URI-encoding must not break masks
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(10)], "id bigint, name string, v double"
    )
    t = IceTable.create(
        spark, loc, df.schema, properties={"write.delete.mode": "merge-on-read"}
    )
    t.append(df)
    t.delete(icol("id") == 3)  # equality delete
    t.append(spark.createDataFrame([(3, "re", 99.0)], df.schema))  # re-insert
    t.set_properties(**{"write.delete.mor.strategy": "position"})
    t.delete(icol("id") == 7)  # position delete
    mpath = export_iceberg(t)
    got = read_iceberg(spark, mpath)
    want = t.toDF().select(*got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3, 4, 5, 6, 8, 9]
    assert [r.name for r in got.collect() if r.id == 3] == ["re"]
    # the rewritten position-delete parquet carries the spec field ids
    import pyarrow.parquet as pq

    md = json.load(open(mpath))
    _, mlist = read_container(open(md["snapshots"][0]["manifest-list"], "rb").read())
    del_manifests = [m for m in mlist if m["content"] == 1]
    assert del_manifests, "no delete manifest exported"
    _, entries = read_container(open(del_manifests[0]["manifest_path"], "rb").read())
    pos_files = [
        e["data_file"]["file_path"] for e in entries if e["data_file"]["content"] == 1
    ]
    assert pos_files
    sch = pq.read_schema(pos_files[0])
    assert sch.field("file_path").metadata[b"PARQUET:field_id"] == b"2147483546"
    assert sch.field("pos").metadata[b"PARQUET:field_id"] == b"2147483545"


def test_manifest_ocf_carries_spec_required_metadata(spark, tmp_path):
    """The Iceberg spec requires manifests to embed schema /
    partition-spec / format-version / content (and manifest lists
    snapshot-id / sequence-number / format-version) as Avro key-value
    metadata — Java readers hard-fail without them."""
    from icepack.avroenc import read_container_with_meta
    from icepack.expr import col as icol

    loc = str(tmp_path / "meta_t")
    df = spark.createDataFrame(
        [(i, f"n{i}", dt.date(2024, 1 + i % 2, 10)) for i in range(8)],
        "id bigint, name string, d date",
    )
    t = IceTable.create(
        spark,
        loc,
        df.schema,
        partition_by=[("d", "month")],
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(df)
    t.delete(icol("id") == 3)
    mpath = export_iceberg(t)
    md = json.load(open(mpath))
    _, mlist, lmeta = read_container_with_meta(
        open(md["snapshots"][-1]["manifest-list"], "rb").read()
    )
    assert lmeta["snapshot-id"].decode() == str(md["current-snapshot-id"])
    assert lmeta["format-version"] == b"2"
    assert "sequence-number" in lmeta and "parent-snapshot-id" in lmeta
    for m in mlist:
        _, _, mm = read_container_with_meta(open(m["manifest_path"], "rb").read())
        for k in ("schema", "schema-id", "partition-spec", "partition-spec-id",
                  "format-version", "content"):
            assert k in mm, f"manifest missing OCF metadata key {k}"
        assert mm["format-version"] == b"2"
        assert mm["content"] == (b"deletes" if m["content"] == 1 else b"data")
        assert json.loads(mm["schema"].decode())["type"] == "struct"
        spec_fields = json.loads(mm["partition-spec"].decode())
        assert int(mm["partition-spec-id"].decode()) == m["partition_spec_id"]
        if m["content"] == 1:
            # delete manifests export under an UNPARTITIONED spec: the
            # spec matches deletes to data files by partition, and an
            # all-null tuple under the table's partitioned spec would
            # only mask null-partition files in external engines
            assert spec_fields == []
        else:
            assert spec_fields and spec_fields[0]["transform"] == "month"
    # the synthetic unpartitioned spec is registered in metadata.json
    specs = {sp["spec-id"]: sp["fields"] for sp in md["partition-specs"]}
    del_mf = [m for m in mlist if m["content"] == 1]
    assert del_mf and specs[del_mf[0]["partition_spec_id"]] == []
    # and the exported tree still round-trips through read_iceberg
    from icepack.iceberg_import import read_iceberg

    got = read_iceberg(spark, mpath)
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 4, 5, 6, 7]


def test_read_iceberg_canonical_paths_uri_manifests(spark, tmp_path):
    """A foreign table whose manifests store URI-form paths
    (file:/…%20…) must read identically: both sides of the
    delete-mask join canonicalize through one function instead of
    enumerating expected spellings (which URI-form manifests defeated,
    silently dropping files)."""
    from urllib.parse import quote

    from icepack.avroenc import read_container_with_meta, write_container
    from icepack.expr import col as icol
    from icepack.iceberg_import import read_iceberg

    loc = str(tmp_path / "uri src")  # space: exercises percent-decoding
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(6)], "id bigint, name string"
    )
    t = IceTable.create(
        spark, loc, df.schema, properties={"write.delete.mode": "merge-on-read"}
    )
    t.append(df)
    t.delete(icol("id") == 2)
    mpath = export_iceberg(t)
    # rewrite every manifest's file_path entries to file:-URI spelling
    md = json.load(open(mpath))
    for snap in md["snapshots"]:
        _, mlist, _ = read_container_with_meta(open(snap["manifest-list"], "rb").read())
        for m in mlist:
            schema, entries, meta = read_container_with_meta(
                open(m["manifest_path"], "rb").read()
            )
            for e in entries:
                p = e["data_file"]["file_path"]
                if not p.startswith("file:"):
                    e["data_file"]["file_path"] = "file://" + quote(p)
            sync = b"\x00" * 16
            extra = {
                k: v for k, v in meta.items() if not k.startswith("avro.")
            }
            with open(m["manifest_path"], "wb") as fh:
                fh.write(write_container(schema, entries, sync, extra_meta=extra))
    got = read_iceberg(spark, mpath)
    assert sorted(r.id for r in got.collect()) == [0, 1, 3, 4, 5]


def test_import_iceberg_files_adopts_external_table(spark, tmp_path):
    """The docs/11 migration path: adopt a (spec-format) external
    table's live parquet into a fresh icepack table metadata-only;
    stats harvested, rows identical, pruning immediately live."""
    from icepack.expr import col as icol
    from icepack.iceberg_import import import_iceberg_files

    src, df = _mk_table(spark, tmp_path, name="ext_src")
    mpath = export_iceberg(src)
    dst = IceTable.create(spark, str(tmp_path / "adopted"), df.schema)
    import_iceberg_files(spark, dst, mpath)
    assert sorted(r.id for r in dst.toDF().collect()) == [1, 2, 3, 4]
    # adopted footer stats drive pruning
    hit, report = dst.plan_files(icol("id") == 1)
    assert report["files_scanned"] <= report["files_total"]
    assert sum(f.record_count for f in hit) < 4 or report["files_total"] == 1


def test_truncate_int_spec_semantics_and_export_pruning(spark, tmp_path):
    """Integral truncate[W] now follows the spec (v - v mod W, floor
    for negatives): native pruning works on the numeric domain, the
    transform exports 1:1 (not void), and read_iceberg prunes files
    from the EXPORTED metadata on a truncate(int) partition —
    VERDICT r5 item 7's done-bar."""
    from icepack import transforms as tr
    from icepack.expr import col as icol
    from icepack.iceberg_import import read_iceberg

    t = tr.parse("truncate[10]")
    assert t.apply(17, None, None) == 10
    assert t.apply(-1, None, None) == -10  # spec: floor, not toward zero
    assert t.apply("abcdefgh", None, None) == "abcdefgh"[:10]

    loc = str(tmp_path / "trunc_t")
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(-15, 35)], "id bigint, name string"
    )
    tbl = IceTable.create(
        spark, loc, df.schema, partition_by=[("id", "truncate[10]")]
    )
    tbl.append(df)
    # native pruning: only the [10,20) partition's file(s) scanned
    hit, report = tbl.plan_files(icol("id") == 12)
    assert report["files_scanned"] < report["files_total"]
    assert {f.partition["id_truncate"] for f in hit} == {10}
    # export: real spec transform with numeric values
    mpath = export_iceberg(tbl)
    md = json.load(open(mpath))
    spec0 = md["partition-specs"][0]["fields"][0]
    assert spec0["transform"] == "truncate[10]"
    _, mlist = read_container(open(md["snapshots"][-1]["manifest-list"], "rb").read())
    _, entries = read_container(open(mlist[0]["manifest_path"], "rb").read())
    vals = {e["data_file"]["partition"][spec0["name"]] for e in entries}
    assert vals <= {-20, -10, 0, 10, 20, 30}
    # spec-read pruning from the exported metadata
    all_rows = read_iceberg(spark, mpath)
    got = read_iceberg(spark, mpath, where=icol("id") == 12)
    assert [r.id for r in got.collect()] == [12]
    n_all, _ = _snapshot_file_count(mpath)
    pruned = _pruned_count(mpath, icol("id") == 12)
    assert pruned < n_all
    assert all_rows.count() == 50


def _snapshot_file_count(mpath):
    from icepack.iceberg_import import _snapshot_entries, load_iceberg_metadata

    md = load_iceberg_metadata(mpath)
    data, dels = _snapshot_entries(md)
    return len(data), len(dels)


def _pruned_count(mpath, where):
    from icepack.iceberg_import import (
        _prune_files,
        _snapshot_entries,
        load_iceberg_metadata,
    )

    md = load_iceberg_metadata(mpath)
    data, _ = _snapshot_entries(md)
    return len(_prune_files(md, data, where))


def test_import_adopts_mor_table(spark, tmp_path):
    """External MOR tables now ADOPT (not just read): sequence groups
    replay as native commits in spec visibility order, equality-delete
    parquet adopts in place, position-delete parquet rewrites to
    CANONICAL raw paths (no per-file driver collect of Spark URI
    spellings — the read join canonicalizes both sides under the
    read.canonicalize-delete-file-paths property).  The adopted table
    must be row-identical — including a row re-inserted AFTER its
    equality delete (sequence rules must survive the replay) — and
    further native DML must work on it."""
    from icepack.expr import col as icol
    from icepack.iceberg_import import import_iceberg_files

    loc = str(tmp_path / "mor src")  # space: spelling canonicalization
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(10)], "id bigint, name string, v double"
    )
    src = IceTable.create(
        spark, loc, df.schema, properties={"write.delete.mode": "merge-on-read"}
    )
    src.append(df)
    src.delete(icol("id") == 3)  # equality delete
    src.append(spark.createDataFrame([(3, "re", 99.0)], df.schema))  # re-insert
    src.set_properties(**{"write.delete.mor.strategy": "position"})
    src.delete(icol("id") == 7)  # position delete
    mpath = export_iceberg(src)

    dst = IceTable.create(spark, str(tmp_path / "adopted_mor"), df.schema)
    import_iceberg_files(spark, dst, mpath)
    assert dst.meta.properties.get("read.canonicalize-delete-file-paths") == "true"
    got = sorted(map(tuple, dst.toDF().select("id", "name", "v").collect()))
    want = sorted(map(tuple, src.toDF().select("id", "name", "v").collect()))
    assert got == want
    assert [r[1] for r in got if r[0] == 3] == ["re"]
    assert all(r[0] != 7 for r in got)
    # the adopted table is a first-class native table: DML on top works
    # (a NATIVE position delete now coexists with the adopted canonical
    # ones — the canonicalized join must serve both spellings)
    dst.set_properties(**{
        "write.delete.mode": "merge-on-read",
        "write.delete.mor.strategy": "position",
    })
    dst.delete(icol("id") == 0)
    assert sorted(r.id for r in dst.toDF().collect()) == [1, 2, 3, 4, 5, 6, 8, 9]
    # DuckDB render agrees on the mixed-spelling tree
    import duckdb

    from icepack.interop import duckdb_snapshot_sql

    con = duckdb.connect()
    ducks = sorted(r[0] for r in con.execute(
        "SELECT id FROM (" + duckdb_snapshot_sql(dst) + ")"
    ).fetchall())
    assert ducks == [1, 2, 3, 4, 5, 6, 8, 9]


def test_export_name_mapping_covers_renames(spark, tmp_path):
    """The exported schema.name-mapping.default lists every historical
    name per field id — external readers resolve pre-rename parquet
    columns to the current schema (our parquet carries no embedded
    field ids; name mapping is the spec's rule for that case)."""
    t, df = _mk_table(spark, tmp_path)
    t.rename_column("v", "score")
    md = json.load(open(export_iceberg(t)))
    nm = json.loads(md["properties"]["schema.name-mapping.default"])
    by_id = {e["field-id"]: e["names"] for e in nm}
    v_id = next(
        f["id"]
        for s in md["schemas"]
        for f in s["fields"]
        if f["name"] in ("v", "score")
    )
    assert by_id[v_id] == ["v", "score"]


def test_export_read_grid_roundtrip(spark, tmp_path):
    """Grid sweep: (partitioning × delete mode × schema evolution)
    combinations export to spec metadata and read back row-identical
    to the native scan — the export/import pair's correctness net."""
    from icepack.expr import col as icol
    from icepack.iceberg_import import read_iceberg

    def rows(x):
        return sorted(map(tuple, x.collect()))

    cases = [
        ("plain", None, None, False),
        ("monthpart", [("d", "month")], None, False),
        ("mmh3part", [("id", "mmh3bucket[4]")], None, False),
        ("cow", None, "copy-on-write", False),
        ("morpos", None, "merge-on-read-pos", False),
        ("evolved", None, "merge-on-read", True),
        ("widened", None, None, "widen"),
    ]
    for name, part, delete_mode, evolve in cases:
        loc = str(tmp_path / name)
        df = spark.createDataFrame(
            [(i, f"s{i}", dt.date(2024, 1 + (i % 3), 5), float(i) if i % 4 else None)
             for i in range(12)],
            "id bigint, s string, d date, v double",
        )
        props = {}
        if delete_mode and delete_mode.startswith("merge-on-read"):
            props["write.delete.mode"] = "merge-on-read"
            if delete_mode.endswith("pos"):
                props["write.delete.mor.strategy"] = "position"
        t = IceTable.create(
            spark, loc, df.schema, partition_by=part, properties=props or None
        )
        t.append(df)
        if delete_mode:
            t.delete(icol("id") % 3 == 0 if False else icol("id") == 6)
        if evolve == "widen":
            # int column widened to bigint AFTER the first append: pre-
            # and post-widening parquet carry different physical types
            # and must not share one scan group
            t2 = IceTable.create(
                spark, loc + "-w",
                spark.createDataFrame([(1, 1)], "id bigint, n int").schema,
            )
            t2.append(spark.createDataFrame([(1, 10), (2, 20)], "id bigint, n int"))
            t2.widen_column("n", T.LongType())
            t2.append(
                spark.createDataFrame(
                    [(3, 2**40)], "id bigint, n bigint"
                )
            )
            got2 = read_iceberg(spark, export_iceberg(t2))
            want2 = t2.toDF().select(*got2.columns)
            assert rows(got2) == rows(want2), "widened case diverged"
            continue
        if evolve:
            t.rename_column("v", "score")
            t.add_column("extra", T.StringType())
            t.append(
                spark.createDataFrame(
                    [(100, "new", dt.date(2024, 3, 1), 1.0, "x")],
                    "id bigint, s string, d date, score double, extra string",
                )
            )
        got = read_iceberg(spark, export_iceberg(t))
        want = t.toDF().select(*got.columns)
        assert rows(got) == rows(want), f"case {name} diverged"


def test_export_empty_table_and_read(spark, tmp_path):
    """A table with no snapshot exports valid metadata
    (current-snapshot-id -1) and reads back empty."""
    from icepack.iceberg_import import read_iceberg

    loc = str(tmp_path / "empty_t")
    t = IceTable.create(
        spark, loc, spark.createDataFrame([(1,)], "id bigint").schema
    )
    mpath = export_iceberg(t)
    md = json.load(open(mpath))
    assert md["current-snapshot-id"] == -1
    got = read_iceberg(spark, mpath)
    assert got.count() == 0 and got.columns == ["id"]


def test_export_sort_orders_and_string_summaries(spark, tmp_path):
    """Declared sort orders export as spec sort-orders JSON; snapshot
    summaries are stringified (spec: map<string,string>)."""
    t, df = _mk_table(spark, tmp_path)
    t.replace_sort_order("id DESC")
    t.append(df.withColumn("id", F.col("id") + 20))
    md = json.load(open(export_iceberg(t)))
    orders = {o["order-id"]: o for o in md["sort-orders"]}
    active = orders[md["default-sort-order-id"]]
    assert active["fields"] and active["fields"][0]["direction"] == "desc"
    assert active["fields"][0]["null-order"] in ("nulls-first", "nulls-last")
    for s in md["snapshots"]:
        assert all(isinstance(v, str) for v in s["summary"].values())


def test_avro_reader_foreign_container_shapes():
    """Foreign writers emit multi-block containers and may use the
    negative-count block form (count + byte size); the reader must
    handle both even though our writer emits a single plain block."""
    from icepack.avroenc import _encode_bytes, _encode_str, _zigzag, encode

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "i", "type": "long"}],
    }
    sync = bytes(range(16))
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": b"null",
    }
    buf = bytearray(b"Obj\x01")
    buf += _zigzag(len(meta))
    for k, v in sorted(meta.items()):
        buf += _encode_str(k) + _encode_bytes(v)
    buf += _zigzag(0)
    buf += sync
    # block 1: plain form, two records
    payload = encode({"i": 1}, schema) + encode({"i": 2}, schema)
    buf += _zigzag(2) + _zigzag(len(payload)) + payload + sync
    # block 2: one record
    payload2 = encode({"i": 3}, schema)
    buf += _zigzag(1) + _zigzag(len(payload2)) + payload2 + sync
    schema2, recs = read_container(bytes(buf))
    assert [r["i"] for r in recs] == [1, 2, 3]

    # array with negative block count (size-prefixed) inside a record
    arr_schema = {
        "type": "record",
        "name": "a",
        "fields": [{"name": "xs", "type": {"type": "array", "items": "long"}}],
    }
    from icepack.avroenc import _Reader, decode

    items = encode(7, "long") + encode(8, "long")
    body = _zigzag(-2) + _zigzag(len(items)) + items + _zigzag(0)
    got = decode(_Reader(body), arr_schema)
    assert got == {"xs": [7, 8]}

    # deflate-codec containers (foreign writers' default) decode —
    # raw RFC-1951 blocks, no zlib header
    import zlib

    comp = zlib.compressobj(wbits=-15)
    dpayload = comp.compress(payload) + comp.flush()
    dbuf = bytearray(b"Obj\x01")
    meta2 = dict(meta, **{"avro.codec": b"deflate"})
    dbuf += _zigzag(len(meta2))
    for k, v in sorted(meta2.items()):
        dbuf += _encode_str(k) + _encode_bytes(v)
    dbuf += _zigzag(0) + sync
    dbuf += _zigzag(2) + _zigzag(len(dpayload)) + dpayload + sync
    _, recs_d = read_container(bytes(dbuf))
    assert [r["i"] for r in recs_d] == [1, 2]

    # genuinely unsupported codec refuses loudly
    bad = bytearray(b"Obj\x01")
    meta3 = dict(meta, **{"avro.codec": b"bzip2"})
    bad += _zigzag(len(meta3))
    for k, v in sorted(meta3.items()):
        bad += _encode_str(k) + _encode_bytes(v)
    bad += _zigzag(0) + sync
    with pytest.raises(ValueError, match="codec"):
        read_container(bytes(bad))


def test_read_iceberg_where_prunes_files(spark, tmp_path):
    """read_iceberg(where=...) decodes the exported bounds and skips
    files that provably can't match — an external read prunes from the
    manifests like a native scan — while results stay exact."""
    from icepack.expr import col as icol
    from icepack.iceberg_import import (
        _prune_files,
        _snapshot_entries,
        load_iceberg_metadata,
        read_iceberg,
    )

    loc = str(tmp_path / "prune_t")
    df = spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(40)], "id bigint, s string, v double"
    )
    t = IceTable.create(spark, loc, df.schema)
    # three appends with disjoint id ranges → separable bounds
    for lo in (0, 100, 200):
        t.append(df.withColumn("id", F.col("id") + lo))
    mpath = export_iceberg(t)
    md = load_iceberg_metadata(mpath)
    data, _ = _snapshot_entries(md)
    pred = icol("id") >= 200
    kept = _prune_files(md, data, pred)
    assert 0 < len(kept) < len(data), "bounds pruning must drop files"
    got = read_iceberg(spark, mpath, where=pred)
    want = t.toDF(pred).select(*got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # string bounds decode and prune too — and the result stays exact
    pred_s = icol("s") == "s1"
    kept_s = _prune_files(md, data, pred_s)
    assert 0 < len(kept_s) < len(data)
    got_s = read_iceberg(spark, mpath, where=pred_s)
    want_s = t.toDF(pred_s).select(*got_s.columns)
    assert sorted(map(tuple, got_s.collect())) == sorted(map(tuple, want_s.collect()))


def test_read_iceberg_where_prunes_mmh3_buckets(spark, tmp_path):
    """Point lookups on an exported spec bucket[N] (= murmur3) prune to
    the matching bucket's files via the engine's own partition
    projection; results stay exact."""
    from icepack.expr import col as icol
    from icepack.iceberg_import import (
        _prune_files,
        _snapshot_entries,
        load_iceberg_metadata,
        read_iceberg,
    )

    loc = str(tmp_path / "bprune_t")
    df = spark.createDataFrame([(i, f"s{i}") for i in range(64)], "id bigint, s string")
    t = IceTable.create(
        spark, loc, df.schema, partition_by=[("id", "mmh3bucket[8]")]
    )
    t.append(df)
    mpath = export_iceberg(t)
    md = load_iceberg_metadata(mpath)
    data, _ = _snapshot_entries(md)
    pred = icol("id") == 7
    kept = _prune_files(md, data, pred)
    assert 0 < len(kept) < len(data), "bucket projection must prune"
    got = read_iceberg(spark, mpath, where=pred)
    assert [r.s for r in got.collect()] == ["s7"]


def test_export_versions_follow_commits(spark, tmp_path):
    """Re-exporting after new commits writes v2, v3... metadata with a
    metadata-log chain and atomically advances version-hint — an
    external engine following the hint tracks the table across
    exports; directory resolution always picks the newest."""
    from icepack.iceberg_import import read_iceberg

    t, df = _mk_table(spark, tmp_path)
    m1 = export_iceberg(t)
    assert m1.endswith("v1.metadata.json")
    t.append(df.withColumn("id", F.col("id") + 10))
    m2 = export_iceberg(t)
    assert m2.endswith("v2.metadata.json")
    base = os.path.dirname(m2)
    assert open(os.path.join(base, "version-hint.text")).read() == "2"
    md2 = json.load(open(m2))
    assert [e["metadata-file"] for e in md2["metadata-log"]] == [m1]
    # directory resolution follows the hint to v2 (8 rows, not 4)
    assert read_iceberg(spark, base).count() == 8
    # v1 still readable (immutable history)
    assert read_iceberg(spark, m1).count() == 4


def test_read_foreign_v1_style_metadata(spark, tmp_path):
    """A hand-built FOREIGN v1-style table — singular `schema` key,
    manifest entries without sequence/content fields (the v1 Avro
    shape) — must open and read: `.get` fallbacks everywhere, no
    assumption that our own exporter wrote the metadata."""
    from icepack.avroenc import write_container
    from icepack.iceberg_import import read_iceberg

    base = tmp_path / "foreign"
    base.mkdir()
    dpath = str(base / "part-0.parquet")
    spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(base / "data"))
    import glob as _g

    dpath = _g.glob(str(base / "data" / "*.parquet"))[0]

    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }
    mrec = {
        "status": 1,
        "snapshot_id": 7,
        "data_file": {
            "file_path": dpath,
            "file_format": "PARQUET",
            "record_count": 2,
            "file_size_in_bytes": os.path.getsize(dpath),
        },
    }
    mpath = str(base / "m0.avro")
    open(mpath, "wb").write(write_container(entry_schema, [mrec], bytes(16)))
    mlist_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "added_snapshot_id", "type": ["null", "long"], "default": None},
        ],
    }
    lpath = str(base / "snap-7.avro")
    open(lpath, "wb").write(
        write_container(
            mlist_schema,
            [
                {
                    "manifest_path": mpath,
                    "manifest_length": os.path.getsize(mpath),
                    "partition_spec_id": 0,
                    "added_snapshot_id": 7,
                }
            ],
            bytes(16),
        )
    )
    md = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000001",
        "location": str(base),
        "schema": {  # v1: SINGULAR key, no schema-id required
            "type": "struct",
            "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "s", "required": False, "type": "string"},
            ],
        },
        "partition-spec": [],
        "current-snapshot-id": 7,
        "snapshots": [
            {"snapshot-id": 7, "timestamp-ms": 1, "manifest-list": lpath}
        ],
    }
    mdpath = str(base / "v1.metadata.json")
    json.dump(md, open(mdpath, "w"))
    got = read_iceberg(spark, mdpath)
    assert sorted((r.id, r.s) for r in got.collect()) == [(1, "a"), (2, "b")]


def test_read_iceberg_where_prunes_time_transform_partitions(spark, tmp_path):
    """Time-transform partitions (spec-NUMERIC exported values) must
    prune without over-pruning: a month-partitioned table read with a
    range predicate keeps exactly the matching months' files and the
    rows equal an unpruned filter (ice48's bug class, pinned for
    month + hour)."""
    from icepack.expr import col as icol
    from icepack.iceberg_import import (
        _prune_files,
        _snapshot_entries,
        load_iceberg_metadata,
        read_iceberg,
    )

    loc = str(tmp_path / "tp_t")
    df = spark.createDataFrame(
        [(i, dt.date(2024, 1 + (i % 4), 5)) for i in range(40)], "id bigint, d date"
    )
    t = IceTable.create(spark, loc, df.schema, partition_by=[("d", "month")])
    t.append(df)
    mpath = export_iceberg(t)
    md = load_iceberg_metadata(mpath)
    data, _ = _snapshot_entries(md)
    pred = icol("d") >= "2024-03-01"
    kept = _prune_files(md, data, pred)
    assert 0 < len(kept) < len(data), f"kept {len(kept)} of {len(data)}"
    got = read_iceberg(spark, mpath, where=pred)
    want = t.toDF(pred).select(*got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_partition_value_encoding_roundtrip_property():
    """Property: for every time transform, the export's spec-numeric
    encoding followed by the import's lexical decoding is the identity
    on icepack's native partition values — the invariant whose
    violation was finding #11 (silent over-pruning)."""
    from hypothesis import given, settings, strategies as st

    from icepack.iceberg_export import _spec_partition_value
    from icepack.iceberg_import import _lexical_partition_tuple

    @settings(max_examples=300, deadline=None)
    @given(
        st.sampled_from(["year", "month", "day", "hour"]),
        st.datetimes(
            min_value=dt.datetime(1970, 1, 1), max_value=dt.datetime(2300, 1, 1)
        ),
    )
    def run(transform, ts):
        lex = {
            "year": ts.year,
            "month": ts.strftime("%Y-%m"),
            "day": ts.strftime("%Y-%m-%d"),
            "hour": ts.strftime("%Y-%m-%d-%H"),
        }[transform]
        numeric = _spec_partition_value(transform, "timestamp", lex)
        back = _lexical_partition_tuple(
            [{"name": "p", "transform": transform}], {"p": numeric}
        )["p"]
        assert back == lex, (transform, lex, numeric, back)

    run()


def test_export_on_commit_mirror_property(spark, tmp_path):
    """write.iceberg-export.enabled=true mirrors every MAIN commit as a
    new export version — appends, MOR deletes (delete manifests), and
    compaction all reflected; branch commits don't export."""
    from icepack.expr import col as icol
    from icepack.iceberg_import import read_iceberg
    from icepack.maintenance import compact

    loc = str(tmp_path / "mirror_t")
    df = spark.createDataFrame([(i, float(i)) for i in range(8)], "id bigint, v double")
    t = IceTable.create(
        spark, loc, df.schema,
        properties={
            "write.iceberg-export.enabled": "true",
            "write.delete.mode": "merge-on-read",
        },
    )
    mdir = os.path.join(loc, "iceberg-metadata")
    t.append(df)
    assert open(os.path.join(mdir, "version-hint.text")).read() == "1"
    assert read_iceberg(spark, mdir).count() == 8
    t.delete(icol("id") == 3)  # MOR: mirror must carry delete manifests
    assert open(os.path.join(mdir, "version-hint.text")).read() == "2"
    assert sorted(r.id for r in read_iceberg(spark, mdir).collect()) == [
        0, 1, 2, 4, 5, 6, 7,
    ]
    # branch commits leave the mirror untouched
    t.create_branch("wap")
    t.append(spark.createDataFrame([(100, 1.0)], df.schema), branch="wap")
    assert open(os.path.join(mdir, "version-hint.text")).read() == "2"
    compact(t)  # replace commit mirrors too
    assert open(os.path.join(mdir, "version-hint.text")).read() == "3"
    assert sorted(r.id for r in read_iceberg(spark, mdir).collect()) == [
        0, 1, 2, 4, 5, 6, 7,
    ]


def test_foreign_v3_deletion_vector_decode_and_adopt(spark, tmp_path):
    """Iceberg v3 DV entries in FOREIGN trees (content=1 pointing at a
    Puffin blob, not parquet): the import decodes the public blob
    framing instead of dying in pq.read_table with an opaque
    ArrowInvalid, and adoption registers the blob as a NATIVE DV entry
    (no rewrite) whose mask the read path applies."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from icepack import roaring as R
    from icepack.iceberg_import import (
        _adopt_dv,
        _is_dv_rec,
        _read_foreign_dv,
    )
    from icepack.iceberg_import import canonical_file_path
    from icepack.table import IceTable

    from .conftest import rows_sorted

    # a puffin-ish file: junk header, DV blob at a known offset
    puffin = str(tmp_path / "deletes.puffin")
    blob = R.dv_blob_bytes([1, 3, 5])
    with open(puffin, "wb") as fh:
        fh.write(b"PFA1junkjunk")
        off = fh.tell()
        fh.write(blob)
        fh.write(b"tail")

    def rec(**over):
        base = {
            "file_path": puffin,
            "file_format": "PUFFIN",
            "content": 1,
            "referenced_data_file": "file:///data/x.parquet",
            "content_offset": off,
            "content_size_in_bytes": len(blob),
            "file_size_in_bytes": os.path.getsize(puffin),
            "_seq": 2,
        }
        base.update(over)
        return base

    assert _is_dv_rec(rec())
    assert not _is_dv_rec({"file_path": "d.parquet", "content": 1})
    ref, positions = _read_foreign_dv(rec())
    assert positions == [1, 3, 5]
    assert ref == canonical_file_path("file:///data/x.parquet")
    # missing identity fields: a CLEAR refusal, not ArrowInvalid
    with pytest.raises(ValueError, match="deletion-vector"):
        _read_foreign_dv(rec(content_offset=None))

    # adoption: the blob becomes a native DV entry whose mask applies
    df = spark.range(0, 10).withColumn("v", F.col("id") * 2.0)
    t = IceTable.create(spark, str(tmp_path / "t"), df.schema)
    t.append(df.coalesce(1))
    data_file = t.live_files()[0]
    adopted_rec = rec(referenced_data_file=data_file.path)
    e = _adopt_dv(t, adopted_rec, {data_file.path})
    assert e.content == "deletion-vectors" and e.record_count == 3
    assert _adopt_dv(t, adopted_rec, {"/other.parquet"}) is None  # dangling
    t._commit_snapshot("delete", [e])
    assert rows_sorted(t.toDF()) == rows_sorted(df.filter("id not in (1,3,5)"))


def test_decimal_minimal_twos_complement_encoding():
    """ADVICE r10 (low): Iceberg Appendix D requires the MINIMAL
    two's-complement byte length for decimal values.  (bit_length+8)//8
    over-padded negative powers of two whose bit_length is a multiple
    of 8 (-128 → ff80 instead of 80) in exported partition values,
    stats bounds, and bucket-hash input bytes."""
    import decimal

    from icepack.iceberg_export import _bound_bytes, _min_signed_be
    from icepack.murmur3 import iceberg_hash_bytes

    cases = {
        0: "00", 1: "01", -1: "ff", 127: "7f", -127: "81",
        -128: "80", 128: "0080", -129: "ff7f",
        -256: "ff00", 32767: "7fff", -32768: "8000", -32769: "ff7fff",
    }
    for v, hexed in cases.items():
        got = _min_signed_be(v)
        assert got.hex() == hexed, (v, got.hex())
        assert int.from_bytes(got, "big", signed=True) == v
        if len(got) > 1:  # minimality: stripping a byte changes the value
            assert int.from_bytes(got[1:], "big", signed=True) != v
    # hash-input bytes take the same minimal form (JVM parity:
    # BigDecimal.unscaledValue().toByteArray() is minimal)
    assert iceberg_hash_bytes(decimal.Decimal("-1.28")).hex() == "80"
    assert iceberg_hash_bytes(decimal.Decimal("-327.68")).hex() == "8000"
    # stats bounds route through the same encoder
    assert _bound_bytes("decimal(9,2)", decimal.Decimal("-1.28")).hex() == "80"


def test_export_v3_deletion_vectors_triangle(spark, tmp_path):
    """VERDICT r10 item 3: a DV table exports as format-version 3 with
    Puffin ``deletion-vector-v1`` blob REFERENCES (native Puffin
    zero-copy; post-consolidation parquet tombstones merged into fresh
    blobs — v3 forbids position-delete files and allows at most one DV
    per data file), and the triangle holds: native scan ==
    read_iceberg over the export == DuckDB over the raw parquet."""
    import glob
    import json
    import os

    import duckdb

    from icepack import maintenance as M
    from icepack.expr import col
    from icepack.iceberg_export import export_iceberg
    from icepack.iceberg_import import read_iceberg
    from icepack.interop import duckdb_snapshot_sql
    from icepack.table import IceTable

    df = spark.range(400).selectExpr("id", "CAST(id % 9 AS DOUBLE) v")
    t = IceTable.create(
        spark, str(tmp_path / "dv v3"), df.schema,  # space: URI canon
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df)
    t.delete(col("v") == 4.0)
    assert M.write_deletion_vectors(t) is not None
    t.delete(col("id") < 7)  # overlaps files already carrying DVs
    native = sorted(tuple(r) for r in t.toDF().collect())

    mpath = export_iceberg(t, format_version=3)
    md = json.load(open(mpath))
    assert md["format-version"] == 3
    assert md["next-row-id"] == 400
    assert all("first-row-id" in s for s in md["snapshots"])
    dest = os.path.dirname(mpath)
    # no position-delete parquet; one consolidated puffin; the native
    # puffin is NOT copied (zero-copy reference)
    assert not glob.glob(os.path.join(dest, "delete-*.parquet"))
    assert glob.glob(os.path.join(dest, "dv-*.puffin"))

    ext = read_iceberg(spark, dest)
    got = sorted(tuple(r) for r in ext.select("id", "v").collect())
    assert got == native

    con = duckdb.connect()
    duck = sorted(
        tuple(r) for r in con.execute(duckdb_snapshot_sql(t)).fetchall()
    )
    assert duck == native

    # v2 export of the same table still decodes DVs to parquet and agrees
    dest2 = str(tmp_path / "v2meta")
    export_iceberg(t, dest=dest2, format_version=2)
    got2 = sorted(
        tuple(r) for r in read_iceberg(spark, dest2).select("id", "v").collect()
    )
    assert got2 == native
    assert glob.glob(os.path.join(dest2, "delete-*.parquet"))

    # bad version refuses
    import pytest

    with pytest.raises(ValueError, match="format-version"):
        export_iceberg(t, dest=str(tmp_path / "bad"), format_version=4)


def test_export_v3_row_lineage_stable_across_history(spark, tmp_path):
    """v3 row lineage: a history export assigns each data file ONE
    first_row_id, stable across the snapshots that re-list it, and
    next-row-id covers the total assigned span."""
    import json
    import os

    from icepack.avroenc import read_container_with_meta
    from icepack.iceberg_export import export_iceberg
    from icepack.table import IceTable

    df = spark.range(100).selectExpr("id")
    t = IceTable.create(spark, str(tmp_path / "t"), df.schema)
    t.append(df.filter("id < 60"))
    t.append(df.filter("id >= 60"))
    mpath = export_iceberg(
        t, dest=str(tmp_path / "meta"), history=True, format_version=3
    )
    md = json.load(open(mpath))
    assert md["next-row-id"] == 100
    first_ids: dict[str, set] = {}
    for s in md["snapshots"]:
        _sc, recs, _m = read_container_with_meta(
            open(s["manifest-list"], "rb").read()
        )
        for mrec in recs:
            _sc2, entries, _m2 = read_container_with_meta(
                open(mrec["manifest_path"], "rb").read()
            )
            for e in entries:
                dfile = e["data_file"]
                first_ids.setdefault(dfile["file_path"], set()).add(
                    dfile["first_row_id"]
                )
    assert first_ids and all(len(v) == 1 for v in first_ids.values())
    assert None not in {next(iter(v)) for v in first_ids.values()}


def test_export_v3_history_and_equality_mix(spark, tmp_path):
    """Hostile probes promoted to pins (r11): (a) a HISTORY v3 export
    of a DV table serves every snapshot — pre-consolidation parquet
    tombstones, the DV snapshot, and post-DV deletes — row-identical
    to native time travel; (b) equality deletes ride v3 unchanged
    (still legal) next to the DV blobs."""
    import os

    from icepack import maintenance as M
    from icepack.expr import col
    from icepack.iceberg_export import export_iceberg
    from icepack.iceberg_import import read_iceberg
    from icepack.table import IceTable

    df = spark.range(200).selectExpr("id", "CAST(id % 5 AS DOUBLE) v")
    t = IceTable.create(
        spark, str(tmp_path / "h"), df.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df)
    t.delete(col("v") == 1.0)
    assert M.write_deletion_vectors(t) is not None
    t.delete(col("id") >= 190)
    mpath = export_iceberg(
        t, dest=str(tmp_path / "hmeta"), history=True, format_version=3
    )
    import json

    md = json.load(open(mpath))
    assert len(md["snapshots"]) == 4
    for s in md["snapshots"]:
        ext = read_iceberg(
            spark, os.path.dirname(mpath), snapshot_id=s["snapshot-id"]
        )
        nat = t.toDF(
            snapshot=next(
                x for x in t.meta.snapshots if x.snapshot_id == s["snapshot-id"]
            )
        )
        assert sorted(map(tuple, ext.select("id", "v").collect())) == sorted(
            map(tuple, nat.collect())
        )

    df2 = spark.range(100).selectExpr("id", "CAST(id % 10 AS INT) k")
    t2 = IceTable.create(
        spark, str(tmp_path / "eq"), df2.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "equality",
            "write.delete.equality-columns": "k",
        },
    )
    t2.append(df2)
    t2.delete(col("k") == 3)
    t2.set_properties(**{"write.delete.mor.strategy": "position"})
    t2.delete(col("id") < 5)
    assert M.write_deletion_vectors(t2) is not None
    m2 = export_iceberg(t2, dest=str(tmp_path / "eqmeta"), format_version=3)
    got = sorted(
        map(tuple, read_iceberg(spark, os.path.dirname(m2)).select("id", "k").collect())
    )
    assert got == sorted(map(tuple, t2.toDF().collect())) and len(got) == 86


def test_export_distributed_lane_matches_driver(spark, tmp_path):
    """VERDICT r11 task 1: past the entry threshold the export encodes
    data manifests in EXECUTORS (one task per source manifest, same
    avroenc bytes machinery) and prefills the delete-rewrite cache
    distributedly; the driver assembles only manifest lists + metadata.
    Pin: a history export with MOR position deletes re-reads IDENTICAL
    rows through the independent spec reader on BOTH lanes, and the
    per-snapshot manifest-list row totals agree."""
    import glob as g
    import os

    from icepack.avroenc import read_container_with_meta
    from icepack.dml import delete, update
    from icepack.expr import col
    from icepack.iceberg_export import export_iceberg
    from icepack.iceberg_import import read_iceberg
    from icepack.table import IceTable
    from pyspark.sql import functions as F

    df = spark.range(0, 3000).selectExpr("id", "cast(id % 7 as string) k")
    t = IceTable.create(
        spark, str(tmp_path / "t"), df.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df)
    t.append(spark.range(3000, 4000).selectExpr("id", "cast(id % 7 as string) k"))
    delete(t, col("id") < 50)
    update(t, col("id") >= 3900, {"k": F.lit("u")})

    m_drv = export_iceberg(t, dest=str(tmp_path / "drv"), history=True)
    t.set_properties(**{"export.auto.entry-threshold": "1"})
    m_dst = export_iceberg(t, dest=str(tmp_path / "dst"), history=True)

    native = sorted(tuple(r) for r in t.toDF().collect())
    for mp in (m_drv, m_dst):
        got = sorted(
            tuple(r) for r in read_iceberg(spark, os.path.dirname(mp)).collect()
        )
        assert got == native

    def _list_totals(dest):
        out = {}
        for p in g.glob(os.path.join(dest, "snap-*.avro")):
            _s, recs, meta = read_container_with_meta(open(p, "rb").read())
            sid = int(meta[b"snapshot-id"].decode()) if b"snapshot-id" in meta else int(
                meta["snapshot-id"].decode()
                if isinstance(meta.get("snapshot-id"), bytes)
                else meta.get("snapshot-id")
            )
            out[sid] = (
                sum(r["added_rows_count"] for r in recs if r["content"] == 0),
                sum(r["existing_rows_count"] for r in recs if r["content"] == 0),
                sum(r["added_rows_count"] for r in recs if r["content"] == 1),
            )
        return out

    assert _list_totals(str(tmp_path / "drv")) == _list_totals(str(tmp_path / "dst"))
    # the distributed layout really is per-source-manifest
    dist_names = g.glob(os.path.join(str(tmp_path / "dst"), "manifest-*-spec*-manifest-*.avro"))
    assert dist_names


def test_export_distributed_delete_prefill_names_match_driver(spark, tmp_path, monkeypatch):
    """The distributed delete-rewrite prefill preassigns names in
    first-encounter order, so the exported tree's delete file layout is
    identical to the driver loop's."""
    import glob as g
    import os

    import icepack.iceberg_export as ie
    from icepack.dml import delete
    from icepack.expr import col
    from icepack.iceberg_import import read_iceberg
    from icepack.table import IceTable

    df = spark.range(0, 500).selectExpr("id")
    t = IceTable.create(
        spark, str(tmp_path / "t"), df.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df)
    for lo in range(0, 30, 10):  # several distinct delete files
        delete(t, (col("id") >= lo) & (col("id") < lo + 5))

    m_drv = ie.export_iceberg(t, dest=str(tmp_path / "drv"))
    monkeypatch.setattr(ie, "EXPORT_DELETE_FILE_THRESHOLD", 1)
    t.set_properties(**{"export.auto.entry-threshold": "1"})
    m_dst = ie.export_iceberg(t, dest=str(tmp_path / "dst"))

    drv = sorted(os.path.basename(p) for p in g.glob(str(tmp_path / "drv" / "delete-*")))
    dst = sorted(os.path.basename(p) for p in g.glob(str(tmp_path / "dst" / "delete-*")))
    assert drv and drv == dst
    native = sorted(tuple(r) for r in t.toDF().collect())
    for mp in (m_drv, m_dst):
        got = sorted(
            tuple(r) for r in read_iceberg(spark, os.path.dirname(mp)).collect()
        )
        assert got == native


def test_export_distributed_v3_spec_primary_ids(spark, tmp_path):
    """fv3 distributed eligibility: spec-primary tables with full
    manifest-list row-id assignments export distributedly with the
    TABLE'S ids (entries explicit, never renumbered); a NATIVE table's
    fv3 export falls back to the sequential driver assignment."""
    import glob as g
    import os

    import icepack.iceberg_export as ie
    from icepack.dml import delete
    from icepack.expr import col
    from icepack.avroenc import read_container_with_meta
    from icepack.iceberg_import import read_iceberg
    from icepack.table import IceTable

    df = spark.range(0, 800).selectExpr("id")
    t = IceTable.create(
        spark, str(tmp_path / "sp"), df.schema,
        properties={"format.spec-primary": "true", "format.spec-version": "3"},
    )
    t.append(df)
    delete(t, col("id") < 100)  # COW rewrite: mixed explicit ids
    native_ids = {f.path: f.first_row_id for f in t.live_files()}

    t.set_properties(**{"export.auto.entry-threshold": "1"})
    mp = ie.export_iceberg(t, dest=str(tmp_path / "dst"), format_version=3)
    got = {}
    for p in g.glob(str(tmp_path / "dst" / "manifest-*.avro")):
        _s, recs, meta = read_container_with_meta(open(p, "rb").read())
        if meta.get("content", b"data").decode() != "data":
            continue
        for r in recs:
            got[r["data_file"]["file_path"]] = r["data_file"]["first_row_id"]
    for path, frid in native_ids.items():
        assert got.get(path) == frid, (path, got.get(path), frid)
    ext = sorted(r.id for r in read_iceberg(spark, os.path.dirname(mp)).collect())
    assert ext == list(range(100, 800))

    # native fv3, SINGLE snapshot (r13): the lane pre-assigns
    # per-manifest bases distributed (row-count pre-pass + driver
    # prefix sum) — the exported ids are IDENTICAL to the sequential
    # driver assignment, and the external lineage read serves them
    tn = IceTable.create(spark, str(tmp_path / "nat"), df.schema)
    tn.append(df.filter("id < 400"))
    tn.append(df.filter("id >= 400"))
    mp_drv = ie.export_iceberg(tn, dest=str(tmp_path / "nd"), format_version=3)
    tn.set_properties(**{"export.auto.entry-threshold": "1"})
    mp_dist = ie.export_iceberg(tn, dest=str(tmp_path / "nx"), format_version=3)

    def _ids(dstdir):
        out = {}
        for p in g.glob(os.path.join(dstdir, "manifest-*.avro")):
            _s, recs, meta = read_container_with_meta(open(p, "rb").read())
            if meta.get("content", b"data").decode() != "data":
                continue
            for r in recs:
                out[r["data_file"]["file_path"]] = r["data_file"]["first_row_id"]
        return out

    drv_ids, dist_ids = _ids(str(tmp_path / "nd")), _ids(str(tmp_path / "nx"))
    assert drv_ids and drv_ids == dist_ids
    lin_drv = {
        r.id: r._row_id
        for r in read_iceberg(
            spark, os.path.dirname(mp_drv), row_lineage=True
        ).collect()
    }
    lin_dist = {
        r.id: r._row_id
        for r in read_iceberg(
            spark, os.path.dirname(mp_dist), row_lineage=True
        ).collect()
    }
    assert lin_drv == lin_dist and len(set(lin_dist.values())) == 800

    # HISTORY export without commit-time assignments still declines
    # (per-path id stability across snapshots needs the driver memo)
    snaps = sorted(tn.meta.snapshots, key=lambda x: x.sequence_number)
    assert len(snaps) > 1
    assert ie._export_data_manifests_distributed(
        tn, snaps, str(tmp_path / "x"), 3, "null", [], []
    ) is None
