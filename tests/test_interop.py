"""Multi-engine compatibility (docs/11-multi-engine-compatibility.md):
the table's data is plain immutable parquet tracked by metadata, so any
engine that can read parquet + the file list sees the same rows Spark
does — consistency across engines is checked with set-equality queries
(docs/11:22-25)."""

import duckdb
from pyspark.sql import functions as F

from icepack.catalog import Catalog
from icepack.expr import col
from icepack.io import load

from tests.conftest import SF_DIR


def _duck_rows(paths, order_cols):
    con = duckdb.connect()
    quoted = ",".join(f"'{p}'" for p in paths)
    q = f"SELECT * FROM read_parquet([{quoted}]) ORDER BY {order_cols}"
    try:
        return con.sql(q).fetchall()
    finally:
        con.close()


def _spark_rows(df, order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols.split(", ")).collect()]


def test_duckdb_reads_current_snapshot(spark, warehouse):
    """An external engine pointed at live_files() sees exactly the
    table — including after a COW delete rewrote files."""
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o", orders.schema)
    t.append(orders.repartition(3))
    t.delete(col("o_orderstatus") == "F")  # COW rewrite
    paths = [f.path for f in t.live_files()]
    assert _duck_rows(paths, "o_orderkey") == _spark_rows(t.toDF(), "o_orderkey")


def test_duckdb_reads_time_travel_snapshot(spark, warehouse):
    """File lists of HISTORICAL snapshots are equally consumable —
    time travel is an external-engine capability, not a Spark one."""
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o2", orders.schema)
    s1 = t.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    old = t.as_of(snapshot_id=s1.snapshot_id)
    paths = [f.path for f in t.live_files(old)]
    assert _duck_rows(paths, "o_orderkey") == _spark_rows(
        t.toDF(snapshot=old), "o_orderkey"
    )


def test_add_files_adopts_duckdb_parquet(spark, warehouse, tmp_path):
    """docs/11 migration path: parquet written by ANOTHER ENGINE
    (DuckDB COPY TO) is adopted via add_files as a metadata-only
    commit — rows readable, footer stats prune, time travel sees the
    adoption as a normal snapshot, and native appends coexist."""
    import os

    import duckdb
    from pyspark.sql import functions as F

    from icepack.expr import col
    from icepack.table import IceTable

    from tests.conftest import SF_DIR

    ext = str(tmp_path / "ext")
    os.makedirs(ext)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT o_orderkey, o_totalprice FROM '{SF_DIR}/orders.parquet'
              WHERE o_orderkey <= 500 ORDER BY o_orderkey)
        TO '{ext}/low.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT o_orderkey, o_totalprice FROM '{SF_DIR}/orders.parquet'
              WHERE o_orderkey > 500 ORDER BY o_orderkey)
        TO '{ext}/high.parquet' (FORMAT PARQUET)
        """
    )
    base = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    t = IceTable.create(spark, warehouse, base.schema)
    s1 = t.add_files([f"{ext}/low.parquet", f"{ext}/high.parquet"])
    got = t.toDF()
    assert got.count() == base.count()
    import pytest as _pt

    assert got.agg(F.sum("o_totalprice")).collect()[0][0] == _pt.approx(
        base.agg(F.sum("o_totalprice")).collect()[0][0], rel=1e-12
    )
    # footer stats from the foreign files drive min/max pruning
    files, report = t.plan_files(col("o_orderkey") <= 100)
    assert len(files) == 1 and files[0].path.endswith("low.parquet")
    assert report["files_total"] == 2
    # native append coexists; time travel isolates the adoption
    t.append(base.withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000))
    assert t.toDF().count() == 2 * base.count()
    assert t.toDF(snapshot=t.as_of(snapshot_id=s1.snapshot_id)).count() == base.count()
    # partitioned adoption refuses when no directory key derives the
    # tuple (flat layout, bucket[4] field): loud, not unprunable
    t2 = IceTable.create(
        spark,
        str(tmp_path / "wh2"),
        base.schema,
        partition_by=[("o_orderkey", "bucket[4]")],
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t2.add_files([f"{ext}/low.parquet"])

def test_add_files_rejects_dup_and_incompatible(spark, warehouse, tmp_path):
    """Adoption guards: the input list is deduplicated (one commit, no
    double count), a path already live in the table is rejected (a
    second metadata-only adoption would double-count rows), and a file
    whose same-named column carries an incompatible type is rejected at
    adoption time instead of failing or coercing at read time.  Widening
    (file INT -> table BIGINT) stays allowed."""
    import os

    import duckdb
    import pytest

    from icepack.table import IceTable

    from tests.conftest import SF_DIR

    ext = str(tmp_path / "ext")
    os.makedirs(ext)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT o_orderkey, o_totalprice FROM '{SF_DIR}/orders.parquet'
              WHERE o_orderkey <= 500)
        TO '{ext}/a.parquet' (FORMAT PARQUET)
        """
    )
    base = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM '{ext}/a.parquet'"
    ).fetchone()[0]
    t = IceTable.create(spark, warehouse, base.schema)
    # same path twice in ONE call: deduplicated, counted once
    t.add_files([f"{ext}/a.parquet", f"{ext}/a.parquet"])
    assert t.toDF().count() == n
    # re-adopting a live path: refused
    with pytest.raises(ValueError, match="already live"):
        t.add_files([f"{ext}/a.parquet"])
    assert t.toDF().count() == n
    # same column name, incompatible type (VARCHAR vs DOUBLE): refused
    con.execute(
        f"""
        COPY (SELECT o_orderkey, CAST(o_totalprice AS VARCHAR) AS o_totalprice
              FROM '{SF_DIR}/orders.parquet' WHERE o_orderkey > 500)
        TO '{ext}/bad.parquet' (FORMAT PARQUET)
        """
    )
    with pytest.raises(ValueError, match="incompatible"):
        t.add_files([f"{ext}/bad.parquet"])
    # widening file INT -> table BIGINT is a permitted promotion
    con.execute(
        f"""
        COPY (SELECT CAST(o_orderkey AS INTEGER) AS o_orderkey, o_totalprice
              FROM '{SF_DIR}/orders.parquet' WHERE o_orderkey > 500)
        TO '{ext}/narrow.parquet' (FORMAT PARQUET)
        """
    )
    t.add_files([f"{ext}/narrow.parquet"])
    assert t.toDF().count() == base.count()


def test_duckdb_snapshot_export_mor_and_evolution(spark, warehouse, tmp_path):
    """Outbound interop (docs/11:16-42): duckdb_snapshot_sql renders a
    snapshot as one self-contained DuckDB query.  Exercises the full
    gauntlet in one table history: equality MOR delete (applies only to
    earlier-sequence files), a post-delete append (must NOT be
    deleted), a column rename (ID-based mapping per schema version),
    and a post-rename append — DuckDB must return row-for-row what
    Spark's scan returns, at head AND at a time-travel snapshot."""
    import duckdb

    from icepack.expr import col
    from icepack.interop import duckdb_snapshot_sql
    from icepack.table import IceTable

    df = spark.range(0, 1000).selectExpr("id", "CAST(id % 7 AS DOUBLE) AS grp")
    t = IceTable.create(
        spark,
        warehouse,
        df.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "identifier-field-names": "id",
        },
    )
    t.append(df)
    s1 = t.delete(col("grp") == 3.0)  # equality-delete file, no rewrite
    # re-insert some ids whose grp was deleted: HIGHER sequence than the
    # delete -> must survive in every engine
    t.append(spark.range(0, 10).selectExpr("id + 2000 AS id", "CAST(3 AS DOUBLE) AS grp"))
    t.rename_column("grp", "bucket")  # metadata-only evolution
    t.append(spark.range(0, 5).selectExpr("id + 5000 AS id", "CAST(9 AS DOUBLE) AS bucket"))

    def rows(x):
        return sorted((r[0], r[1]) for r in x)

    con = duckdb.connect()
    got_head = con.execute(duckdb_snapshot_sql(t)).fetchall()
    want_head = [(r.id, r.bucket) for r in t.toDF().collect()]
    assert rows(got_head) == rows(want_head)
    assert any(b == 3.0 for _, b in got_head)  # re-inserts survived
    assert not any(b == 3.0 and i < 1000 for i, b in got_head)  # originals gone
    # time travel: export the post-delete snapshot (pre-rename column set
    # reconciles to the CURRENT schema names, same as Spark's scan)
    snap = t.as_of(snapshot_id=s1.snapshot_id)
    got_tt = con.execute(duckdb_snapshot_sql(t, snap)).fetchall()
    want_tt = [(r.id, r.bucket) for r in t.toDF(snapshot=snap).collect()]
    assert rows(got_tt) == rows(want_tt) and len(got_tt) > 0


def test_duckdb_snapshot_export_position_deletes(spark, warehouse):
    """Position-delete form: (file_path, row ordinal) anti-join must
    reproduce Spark's result through DuckDB's filename/file_row_number
    — the trickiest identity to keep engine-portable."""
    import duckdb

    from icepack.expr import col
    from icepack.interop import duckdb_snapshot_sql
    from icepack.table import IceTable

    df = spark.range(0, 500).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    t = IceTable.create(
        spark,
        warehouse,
        df.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df)
    t.delete(col("v") >= 400.0)
    con = duckdb.connect()
    got = con.execute(duckdb_snapshot_sql(t)).fetchall()
    want = [(r.id, r.v) for r in t.toDF().collect()]
    assert sorted(got) == sorted(want)
    assert len(got) == 400


def test_duckdb_snapshot_export_added_column_and_partitioned(spark, warehouse):
    """Export must NULL-pad files written before an ADD COLUMN (ID-based
    evolution) and read hidden-partitioned tables (partition values are
    directory keys; source columns stay in the files)."""
    import duckdb

    from icepack.interop import duckdb_snapshot_sql
    from icepack.table import IceTable

    df = spark.range(0, 300).selectExpr(
        "id", "CAST(id % 10 AS DOUBLE) AS v"
    )
    t = IceTable.create(
        spark, warehouse, df.schema, partition_by=[("id", "bucket[4]")]
    )
    t.append(df)
    t.add_column("tag", "string")
    t.append(
        spark.range(0, 10).selectExpr(
            "id + 1000 AS id", "CAST(0 AS DOUBLE) AS v", "'new' AS tag"
        )
    )
    con = duckdb.connect()
    got = con.execute(duckdb_snapshot_sql(t)).fetchall()
    want = [(r.id, r.v, r.tag) for r in t.toDF().collect()]
    assert sorted(got, key=str) == sorted(want, key=str)
    assert sum(1 for *_, tag in got if tag is None) == 300
    assert sum(1 for *_, tag in got if tag == "new") == 10


def test_three_reader_triangle_mor_evolution(spark, tmp_path):
    """TRIANGLE consistency: the native Spark scan, the DuckDB
    snapshot render (interop.py), and the spec-format Iceberg read
    (export → read_iceberg) must return IDENTICAL rows for a table
    that exercises the hard paths together — MOR equality + position
    deletes, a post-delete re-insert, rename + widen + add-column
    schema evolution — at the current snapshot AND a historical one.
    Three independent read implementations agreeing is the strongest
    cross-check the offline environment allows."""
    import duckdb as _dd

    from pyspark.sql import types as T

    from icepack.iceberg_export import export_iceberg
    from icepack.iceberg_import import read_iceberg
    from icepack.interop import duckdb_snapshot_sql
    from icepack.table import IceTable

    loc = str(tmp_path / "tri")
    df = spark.createDataFrame(
        [(i, f"n{i}", i * 1.5) for i in range(20)], "id bigint, name string, v double"
    )
    t = IceTable.create(
        spark, loc, df.schema, properties={"write.delete.mode": "merge-on-read"}
    )
    t.append(df)
    t.delete(col("id") == 3)  # equality delete
    t.append(spark.createDataFrame([(3, "re", 0.0)], df.schema))  # re-insert
    mid = t.meta.current_snapshot  # historical checkpoint
    t.rename_column("v", "score")
    t.widen_column("id", T.LongType())  # no-op widen keeps the path hot
    t.add_column("extra", T.StringType())
    t.set_properties(**{"write.delete.mor.strategy": "position"})
    t.delete(col("id") == 7)  # position delete over evolved schema
    t.append(
        spark.createDataFrame(
            [(100, "new", 9.9, "x")], "id bigint, name string, score double, extra string"
        )
    )

    mpath = export_iceberg(t, history=True)
    con = _dd.connect()

    def tri(snapshot, sid):
        native = t.toDF(snapshot=snapshot)
        cols = native.columns
        a = sorted(map(tuple, native.collect()))
        b = sorted(
            tuple(r) for r in con.execute(duckdb_snapshot_sql(t, snapshot)).fetchall()
        )
        c = sorted(
            map(tuple, read_iceberg(spark, mpath, snapshot_id=sid).select(*cols).collect())
        )
        assert a == b, "DuckDB render diverged from native scan"
        assert a == c, "spec-format read diverged from native scan"

    tri(None, None)  # current
    tri(mid, mid.snapshot_id)  # historical (pre-evolution, MOR + re-insert)


def test_duckdb_render_position_deletes_spaced_location(spark, tmp_path):
    """Native position tombstones at a SPACED location are
    percent-encoded Spark URIs; the DuckDB render's match must decode
    them — a plain 'file:' || filename concat never matches and the
    render resurrects deleted rows."""
    import duckdb

    from icepack.expr import col
    from icepack.interop import duckdb_snapshot_sql
    from icepack.table import IceTable

    loc = str(tmp_path / "duck sp ace")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id bigint, v double"
    )
    t = IceTable.create(
        spark,
        loc,
        df.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df)
    t.delete(col("id") == 4)
    want = sorted(r.id for r in t.toDF().collect())
    assert want == [0, 1, 2, 3, 5, 6, 7, 8, 9]
    con = duckdb.connect()
    got = sorted(
        r[0]
        for r in con.execute(
            "SELECT id FROM (" + duckdb_snapshot_sql(t) + ")"
        ).fetchall()
    )
    assert got == want


def test_add_files_partitioned_hive_tree(spark, tmp_path):
    """Metadata-only migration of a partitioned foreign tree
    (docs/11:174-183): a day=-keyed hive layout adopts into a
    day(ts)-partitioned table with REAL tuples — pruning effective
    immediately, rows identical to DuckDB reading the raw tree, and a
    mislabeled directory refused via the footer-stats cross-check."""
    import datetime as dt
    import glob as g

    import duckdb
    import pytest as _pytest
    from pyspark.sql import functions as F

    from icepack.expr import col
    from icepack.table import IceTable

    from .conftest import rows_sorted

    df = (
        spark.range(0, 120)
        .select(
            F.col("id"),
            F.to_timestamp(
                F.concat(
                    F.lit("2024-03-0"),
                    (F.col("id") % 4 + 1).cast("string"),
                    F.lit(" 08:30:00"),
                )
            ).alias("ts"),
            (F.col("id") % 5).cast("double").alias("v"),
        )
    )
    tree = str(tmp_path / "tree")
    for d in range(1, 5):
        day = f"2024-03-0{d}"
        # foreign writer keeps ALL columns in the files (Iceberg-style
        # layout); the directory carries the transformed value
        df.filter(F.to_date("ts") == day).coalesce(1).write.parquet(
            f"{tree}/ts_day={day}"
        )
    paths = sorted(g.glob(f"{tree}/**/*.parquet", recursive=True))
    assert len(paths) == 4
    t = IceTable.create(
        spark, str(tmp_path / "t"), df.schema, partition_by=[("ts", "day")]
    )
    t.add_files(paths)
    assert rows_sorted(t.toDF()) == rows_sorted(df)
    # DuckDB leg on the raw tree agrees
    want = duckdb.sql(
        f"SELECT COUNT(*), SUM(id) FROM read_parquet('{tree}/*/*.parquet')"
    ).fetchone()
    got = t.toDF().agg(F.count("*"), F.sum("id")).first()
    assert (got[0], got[1]) == want
    # pruning is effective on adopted tuples
    files, rep = t.plan_files(col("ts") == dt.datetime(2024, 3, 2, 8, 30))
    assert [f.partition["ts_day"] for f in files] == ["2024-03-02"]
    assert rep["files_scanned"] == 1 and rep["files_total"] == 4
    # a mislabeled directory contradicts footer stats -> refused
    # (written with pyarrow: spark 4.1 omits parquet stats for
    # timestamp columns entirely, so the cross-check has nothing to
    # read on spark-written files — foreign writers do emit them)
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as _pq

    bad = str(tmp_path / "bad" / "ts_day=2024-03-03")
    _os.makedirs(bad)
    _pq.write_table(
        pa.table(
            {
                "id": [1, 2],
                "ts": [dt.datetime(2024, 3, 1, 8, 30)] * 2,
                "v": [1.0, 2.0],
            }
        ),
        f"{bad}/f.parquet",
    )
    t2 = IceTable.create(
        spark, str(tmp_path / "t2"), df.schema, partition_by=[("ts", "day")]
    )
    with _pytest.raises(ValueError, match="contradicts"):
        t2.add_files([f"{bad}/f.parquet"])
    # bare transform-kind key (day=...) also derives when unambiguous
    tree2 = str(tmp_path / "tree2")
    df.filter(F.to_date("ts") == "2024-03-01").coalesce(1).write.parquet(
        f"{tree2}/day=2024-03-01"
    )
    t3 = IceTable.create(
        spark, str(tmp_path / "t3"), df.schema, partition_by=[("ts", "day")]
    )
    t3.add_files(sorted(g.glob(f"{tree2}/**/*.parquet", recursive=True)))
    assert {f.partition["ts_day"] for f in t3.live_files()} == {"2024-03-01"}


def test_is_dv_rec_v2_file_scoped_pos_delete_not_dv():
    """Iceberg v2 file-scoped position-delete PARQUET entries legally
    (and in newer writers, commonly) populate referenced_data_file as a
    pruning hint while content_offset/content_size stay null.  Those
    must route to the parquet position-delete path — only PUFFIN format
    or a located blob (content_offset) marks a v3 deletion vector."""
    from icepack.iceberg_import import _is_dv_rec

    v2_file_scoped = {
        "file_path": "/w/d/pd-0.parquet",
        "file_format": "PARQUET",
        "content": 1,
        "referenced_data_file": "/w/d/data-0.parquet",
        "content_offset": None,
        "content_size_in_bytes": None,
    }
    assert not _is_dv_rec(v2_file_scoped)
    v3_dv = dict(v2_file_scoped, file_format="PUFFIN",
                 content_offset=4, content_size_in_bytes=33)
    assert _is_dv_rec(v3_dv)
    # puffin spelling alone is decisive too (offset fields may arrive
    # via a reader that nulls absent optionals)
    assert _is_dv_rec(dict(v2_file_scoped, file_format="puffin"))
    # located blob without the format spelling: still a DV
    assert _is_dv_rec(dict(v2_file_scoped, content_offset=0,
                           content_size_in_bytes=10))


def test_duckdb_render_dv_past_cap_refuses_loudly(spark, warehouse, monkeypatch):
    """VERDICT r11 task 8: the DV-inlining SQL render is capped — PAST
    the cap it must REFUSE with a ValueError naming the remedy, never
    silently truncate the mask (a truncated VALUES list would
    resurrect deleted rows in the external engine).  Below the cap the
    render stays exact against the native scan."""
    import os

    import duckdb
    import pytest
    from pyspark.sql import types as T

    import icepack.interop as interop
    from icepack.expr import col
    from icepack.maintenance import write_deletion_vectors
    from icepack.table import IceTable

    schema = T.StructType([T.StructField("id", T.LongType())])
    t = IceTable.create(
        spark,
        os.path.join(warehouse, "dv_cap"),
        schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(spark.range(0, 100).selectExpr("id"))
    t.delete(col("id") < 30)
    assert write_deletion_vectors(t) is not None

    # below the cap: exact
    con = duckdb.connect()
    got = sorted(
        r[0] for r in con.execute(interop.duckdb_snapshot_sql(t)).fetchall()
    )
    assert got == list(range(30, 100))

    # past the cap: loud refusal, remedy named, no SQL returned
    monkeypatch.setattr(interop, "DV_RENDER_MAX_POSITIONS", 10)
    with pytest.raises(ValueError, match="rewrite_position_deletes"):
        interop.duckdb_snapshot_sql(t)


def test_foreign_v3_tree_delta_magic_dv_adoption(spark, tmp_path):
    """VERDICT r11 task 6: a FOREIGN Iceberg v3 tree — Avro manifests
    carrying deletion-vector entries whose Puffin blobs use the DELTA
    byte-order magic spelling (1681511377 LE), which our writer never
    emits but roaring.py documents as accepted — must adopt through
    BOTH read paths with row parity: IceTable.load (native scan over
    the foreign tree) and read_iceberg (independent spec reader)."""
    import os
    import struct
    import zlib

    from icepack import roaring as R
    from icepack.dml import delete
    from icepack.expr import col
    from icepack.iceberg_export import export_iceberg
    from icepack.iceberg_import import read_iceberg
    from icepack.maintenance import write_deletion_vectors
    from icepack.puffin import read_puffin
    from icepack.table import IceTable

    df = spark.range(0, 200).selectExpr("id", "cast(id % 5 as string) k")
    src = IceTable.create(
        spark, str(tmp_path / "src"), df.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    src.append(df)
    delete(src, col("id") < 40)
    assert write_deletion_vectors(src) is not None
    expected = sorted(tuple(r) for r in src.toDF().collect())

    floc = str(tmp_path / "foreign")
    os.makedirs(os.path.join(floc, "metadata"))
    export_iceberg(src, dest=os.path.join(floc, "metadata"), format_version=3)

    # re-spell every DV blob's magic the way Delta Lake writes the
    # shared format: D1 33 39 64 instead of the spec's D1 D3 39 64 —
    # body changes, so the trailing CRC-32 is recomputed in place
    # the export references the table's own Puffin ZERO-COPY (v3 spec
    # blobs are already spec bytes), so the blob to re-spell lives in
    # the SOURCE metadata dir; a merge-producing export would write it
    # under dest — patch wherever it is
    import glob as _glob

    puffins = _glob.glob(
        os.path.join(floc, "metadata", "*.puffin")
    ) + _glob.glob(os.path.join(src.location, "**", "*.puffin"), recursive=True)
    patched = 0
    for p in puffins:
        buf = bytearray(open(p, "rb").read())
        blobs, _props = read_puffin(bytes(buf))
        # offsets from the footer: each blob's data is the framed
        # (len | magic+vec | crc) deletion-vector-v1 payload
        import json as _json

        (payload_len,) = struct.unpack("<i", bytes(buf[-12:-8]))
        doc = _json.loads(bytes(buf[len(buf) - 12 - payload_len : len(buf) - 12]))
        for m in doc["blobs"]:
            off, ln = m["offset"], m["length"]
            (body_len,) = struct.unpack_from(">I", buf, off)
            body = bytes(buf[off + 4 : off + 4 + body_len])
            assert body[:4] == R.DV_MAGIC
            new_body = R._DV_MAGIC_ALT + body[4:]
            buf[off + 4 : off + 4 + body_len] = new_body
            struct.pack_into(">I", buf, off + 4 + body_len, zlib.crc32(new_body))
            patched += 1
        open(p, "wb").write(bytes(buf))
    assert patched >= 1

    # native adoption of the foreign tree
    t = IceTable.load(spark, floc)
    got_native = sorted(tuple(r) for r in t.toDF().collect())
    assert got_native == expected
    # independent spec reader
    got_ext = sorted(
        tuple(r)
        for r in read_iceberg(spark, os.path.join(floc, "metadata")).collect()
    )
    assert got_ext == expected
