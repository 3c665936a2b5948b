"""Iceberg v3 row lineage (public spec "Row Lineage"; VERDICT r11 task
5 + ADVICE medium): manifest-list field-520 assignment at commit,
reader-side inheritance, `toDF(row_lineage=True)` metadata columns,
and id stability across every rewrite class — metadata-only
(rewrite_manifests), copy-on-write DML, and data-file compaction
(which MATERIALIZES the ids as physical parquet columns)."""

import os

import pytest
from pyspark.sql import functions as F

from icepack.dml import delete, merge, update
from icepack.expr import col
from icepack.maintenance import compact, rewrite_manifests
from icepack.table import IceTable


V3 = {"format.spec-primary": "true", "format.spec-version": "3"}


def _mk(spark, warehouse, name, n=200, props=None):
    df = spark.range(0, n).selectExpr("id", "cast(id % 7 as string) k")
    t = IceTable.create(
        spark, os.path.join(warehouse, name), df.schema, properties=props or V3
    )
    t.append(df)
    return t


def _lineage(t):
    return {
        r.id: (r._row_id, r._last_updated_sequence_number)
        for r in t.toDF(row_lineage=True).collect()
    }


def test_manifest_list_assignment_and_snapshot_summary(spark, warehouse):
    """Every data manifest record carries a non-null field-520
    first_row_id; carried-forward manifests KEEP their assignment;
    the snapshot summary records the exact (first-row-id,
    assigned-rows) pair dump_spec_metadata serializes."""
    from icepack.avroenc import read_container_with_meta
    from icepack.specio import spec_next_row_id

    t = _mk(spark, warehouse, "rl_assign", n=100)
    t.append(spark.range(100, 150).selectExpr("id", "cast(id % 7 as string) k"))
    snap = t.meta.current_snapshot
    assert snap.summary["first-row-id"] == "100"
    assert snap.summary["assigned-rows"] == "50"
    buf = t.store.read_bytes(t.store.join(t._mdir, snap.manifest_list))
    _s, recs, _m = read_container_with_meta(buf)
    frids = sorted(r["first_row_id"] for r in recs if r["content"] == 0)
    assert frids == [0, 100]
    assert spec_next_row_id(t.meta) == 150

    # delete manifests encode null
    t.set_properties(**{"write.delete.mode": "merge-on-read"})
    delete(t, col("id") < 5)
    snap = t.meta.current_snapshot
    buf = t.store.read_bytes(t.store.join(t._mdir, snap.manifest_list))
    _s, recs, _m = read_container_with_meta(buf)
    dels = [r for r in recs if r["content"] == 1]
    assert dels and all(r["first_row_id"] is None for r in dels)
    datas = [r for r in recs if r["content"] == 0]
    assert sorted(r["first_row_id"] for r in datas) == [0, 100]  # carried


def test_lineage_scan_unique_and_positional(spark, warehouse):
    """_row_id = manifest assignment + row position: a single ordered
    file yields exactly rank-1 ids; all ids unique across appends."""
    df = spark.range(0, 50).selectExpr("id")
    t = IceTable.create(
        spark, os.path.join(warehouse, "rl_pos"), df.schema, properties=dict(V3)
    )
    t.append(df.orderBy("id").coalesce(1))
    got = {
        r.id: r._row_id for r in t.toDF(row_lineage=True).collect()
    }
    assert got == {i: i for i in range(50)}
    t.append(spark.range(50, 80).selectExpr("id").orderBy("id").coalesce(1))
    got = {r.id: r._row_id for r in t.toDF(row_lineage=True).collect()}
    assert got == {i: i for i in range(80)}
    # _last_updated_sequence_number = the file's data sequence number
    lu = {
        r.id: r._last_updated_sequence_number
        for r in t.toDF(row_lineage=True).collect()
    }
    assert all(v == (1 if i < 50 else 2) for i, v in lu.items())


def test_lineage_requires_v3_spec_primary(spark, warehouse):
    t = _mk(spark, warehouse, "rl_guard", n=10, props={"format.spec-primary": "true"})
    with pytest.raises(ValueError, match="spec-version=3"):
        t.toDF(row_lineage=True)


def test_ids_stable_across_every_rewrite_class(spark, warehouse):
    """The full survival matrix: MOR delete, COW delete, COW update
    (updated rows bump last-updated to the new commit seq), MERGE
    (existing kept, inserts fresh), compaction (materializes), manifest
    rewrite — no step may renumber a surviving row."""
    t = _mk(spark, warehouse, "rl_stable", n=200)
    r0 = _lineage(t)
    assert len({v[0] for v in r0.values()}) == 200

    delete(t, col("id") < 20)  # COW
    r1 = _lineage(t)
    assert len(r1) == 180 and all(r0[i][0] == r1[i][0] for i in r1)

    seq_before = t.meta.last_sequence_number
    update(t, col("id") < 30, {"k": F.lit("upd")})
    r2 = _lineage(t)
    assert all(r1[i][0] == r2[i][0] for i in r2)
    assert all(r2[i][1] == seq_before + 1 for i in r2 if 20 <= i < 30)

    src = spark.range(25, 35).selectExpr("id", "'m' k").unionByName(
        spark.range(500, 505).selectExpr("id", "'n' k")
    )
    merge(t, src, on=["id"], when_matched_update={"k": F.lit("m")})
    r3 = _lineage(t)
    assert len(r3) == 185
    assert all(r2[i][0] == r3[i][0] for i in r3 if i < 500)
    fresh = {r3[i][0] for i in r3 if i >= 500}
    assert None not in fresh and fresh.isdisjoint({v[0] for v in r2.values()})

    compact(t, target_file_size=1 << 20)
    r4 = _lineage(t)
    assert r4 == r3  # ids AND last-updated survive the data rewrite

    rewrite_manifests(t)
    assert _lineage(t) == r4

    # compacted files physically materialize the lineage columns
    import pyarrow.parquet as pq

    data_files = t.live_files()
    cols = set(pq.read_schema(data_files[0].path).names)
    assert {"_row_id", "_last_updated_sequence_number"} <= cols


def test_mor_delete_and_distributed_lane_agree(spark, warehouse):
    """MOR deletes never rewrite data (ids trivially stable), and the
    distributed planner resolves the IDENTICAL lineage the driver walk
    does (inheritance runs inside the executor-side manifest decode)."""
    t = _mk(spark, warehouse, "rl_lanes", n=150)
    t.set_properties(**{"write.delete.mode": "merge-on-read"})
    before = _lineage(t)
    delete(t, col("id") < 15)
    after = _lineage(t)
    assert len(after) == 135
    assert all(before[i] == after[i] for i in after)

    t.set_properties(**{"read.plan-mode": "distributed"})
    dist = _lineage(t)
    assert dist == after
    t.set_properties(**{"read.plan-mode": "auto"})


def test_rows_needing_ids_budget_is_exact(spark, warehouse):
    """A rewrite whose entries carry EXPLICIT ids consumes no fresh
    id space (summary rows-needing-ids = 0) — next-row-id does not
    inflate by table size on every metadata rewrite."""
    from icepack.specio import spec_next_row_id

    t = _mk(spark, warehouse, "rl_budget", n=100)
    nxt = spec_next_row_id(t.meta)
    assert nxt == 100
    rewrite_manifests(t)
    assert spec_next_row_id(t.meta) == nxt  # all entries explicit
    # and a second lineage read still serves the same ids
    assert {r.id: r._row_id for r in t.toDF(row_lineage=True).collect()} == {
        i: i for i in range(0)
    } or len(_lineage(t)) == 100


def test_export_uses_table_assignments(spark, warehouse):
    """export_iceberg(format_version=3) on a spec-primary v3 table
    must export the TABLE'S row ids, not renumber from zero in
    iteration order — external readers and native lineage scans have
    to agree."""
    from icepack.avroenc import read_container_with_meta
    from icepack.iceberg_export import export_iceberg

    t = _mk(spark, warehouse, "rl_export", n=60)
    delete(t, col("id") < 10)  # forces a rewrite: mixed explicit ids
    native = _lineage(t)
    dest = os.path.dirname(export_iceberg(t, format_version=3))
    # read back every exported manifest's data entries
    got = {}
    import glob as g
    import json

    mfs = [p for p in g.glob(os.path.join(dest, "manifest-*.avro"))]
    for p in mfs:
        _s, recs, meta = read_container_with_meta(open(p, "rb").read())
        if meta.get("content", b"data").decode() != "data":
            continue
        for r in recs:
            df_ = r["data_file"]
            got[df_["file_path"]] = df_["first_row_id"]
    by_file = {}
    for f in t.live_files():
        by_file[f.path] = f.first_row_id
    for path, frid in by_file.items():
        assert got.get(path) == frid, (path, got.get(path), frid)


def test_files_metadata_table_carries_first_row_id(spark, warehouse):
    """$FILES exposes each live file's resolved first_row_id on v3
    tables (null on native tables that assign no ids)."""
    t = _mk(spark, warehouse, "rl_files", n=50)
    rows = {r.file_path: r.first_row_id for r in t.files().collect()}
    assert rows and None not in rows.values()
    assert sum(r.record_count for r in t.files().collect()) == 50

    dfn = spark.range(0, 10).selectExpr("id", "cast(id % 7 as string) k")
    tn = IceTable.create(spark, os.path.join(warehouse, "rl_files_nat"), dfn.schema)
    tn.append(dfn)
    assert all(r.first_row_id is None for r in tn.files().collect())


def test_scoped_compact_preserves_ids(spark, warehouse):
    """compact(where=...) rewrites only the hit partition's files —
    those rows must keep their ids through the materialized-column
    carry, and the untouched rest is trivially stable."""
    from icepack.expr import col as C

    df = spark.range(0, 120).selectExpr("id", "cast(id % 3 as string) k")
    t = IceTable.create(
        spark,
        os.path.join(warehouse, "rl_scoped"),
        df.schema,
        partition_by=[("k", "identity")],
        properties=dict(V3),
    )
    t.append(df)
    before = _lineage(t)
    compact(t, target_file_size=1 << 20, where=C("k") == "1")
    after = _lineage(t)
    assert after == before


def test_read_iceberg_row_lineage_matches_native(spark, tmp_path):
    """The exported v3 tree serves the SAME row ids the source table
    does: read_iceberg(row_lineage=True) == toDF(row_lineage=True)
    after a COW update + compaction (so BOTH resolution paths are
    exercised — materialized columns on rewritten files, manifest
    inheritance on fresh appends)."""
    import os as _os

    from icepack.iceberg_export import export_iceberg
    from icepack.iceberg_import import read_iceberg

    df = spark.range(0, 300).selectExpr("id", "cast(id % 9 as string) k")
    t = IceTable.create(
        spark, str(tmp_path / "t"), df.schema, properties=dict(V3)
    )
    t.append(df)
    update(t, col("id") < 40, {"k": F.lit("u")})
    compact(t, target_file_size=1 << 20)
    t.append(spark.range(300, 350).selectExpr("id", "cast(id % 9 as string) k"))

    native = {
        r.id: (r._row_id, r._last_updated_sequence_number)
        for r in t.toDF(row_lineage=True).collect()
    }
    mp = export_iceberg(t, format_version=3)
    ext = {
        r.id: (r._row_id, r._last_updated_sequence_number)
        for r in read_iceberg(
            spark, _os.path.dirname(mp), row_lineage=True
        ).collect()
    }
    assert ext == native
    assert len({v[0] for v in ext.values()}) == len(ext)  # unique ids


def test_lineage_refuses_shadowed_reserved_names(spark, warehouse):
    """A user column literally named _row_id would be silently misread
    as the metadata column — the scan must refuse loudly instead."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("_row_id", T.LongType())]
    )
    t = IceTable.create(
        spark, os.path.join(warehouse, "rl_shadow"), schema, properties=dict(V3)
    )
    t.append(spark.range(5).selectExpr("id", "id as _row_id"))
    with pytest.raises(ValueError, match="reserved"):
        t.toDF(row_lineage=True)


def test_time_travel_lineage_consistent(spark, warehouse):
    """Lineage is a property of the ROW, not the snapshot: scanning an
    older snapshot with row_lineage=True serves the same _row_id for
    every row that survives into the present."""
    t = _mk(spark, warehouse, "rl_tt", n=80)
    first = t.meta.current_snapshot
    delete(t, col("id") < 10)
    update(t, col("id") >= 70, {"k": F.lit("u")})
    now = _lineage(t)
    old = {
        r.id: r._row_id
        for r in t.toDF(snapshot=first, row_lineage=True).collect()
    }
    assert len(old) == 80
    assert all(old[i] == now[i][0] for i in now)  # survivors keep ids


def test_merge_without_update_clause_keeps_last_updated(spark, warehouse):
    """MERGE with matched-passthrough (no update clause, no delete):
    matched rows are rewritten value-identical — that is NOT an
    update, so _last_updated_sequence_number must not bump."""
    t = _mk(spark, warehouse, "rl_merge_noop", n=60)
    before = _lineage(t)
    src = spark.range(10, 20).selectExpr("id", "'ignored' k")
    merge(t, src, on=["id"], when_not_matched_insert=False)
    after = _lineage(t)
    assert after == before  # ids AND last-updated unchanged


def test_dv_delete_preserves_lineage(spark, warehouse):
    """VERDICT r12 task 4: on a v3 lineage table a MOR position DELETE
    commits a DELETION VECTOR (v3 forbids position-delete parquet) —
    DVs mask rows without rewriting data, so every survivor keeps BOTH
    its _row_id and its _last_updated_sequence_number; the masked ids
    simply vanish from the scan.  A later UPDATE's DV round (MOR
    update = DV + re-insert) assigns FRESH ids to the re-inserted rows
    only."""
    t = _mk(
        spark,
        warehouse,
        "rl_dv",
        n=120,
        props={
            **V3,
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    before = _lineage(t)
    delete(t, col("id") < 30)
    live = [f for f in t.live_files(content="all") if f.content != "data"]
    assert live and all(f.content == "deletion-vectors" for f in live)
    after = _lineage(t)
    assert set(after) == {i for i in before if i >= 30}
    assert all(after[i] == before[i] for i in after)  # ids AND last-upd


def test_dv_consolidation_preserves_lineage(spark, warehouse):
    """write_deletion_vectors (multi-puffin consolidation) is
    metadata+bitmap work only — survivors' resolved lineage columns are
    bit-identical before and after."""
    from icepack.maintenance import write_deletion_vectors

    t = _mk(
        spark,
        warehouse,
        "rl_dvc",
        n=100,
        props={
            **V3,
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(
        spark.range(100, 200).selectExpr("id", "cast(id % 7 as string) k")
    )
    # two deletes on DISJOINT appends -> two puffins -> consolidation
    delete(t, col("id") < 10)
    delete(t, col("id") >= 190)
    before = _lineage(t)
    assert write_deletion_vectors(t) is not None
    assert _lineage(t) == before


def test_dml_dv_merges_upgraded_position_deletes(spark, warehouse):
    """v2->v3 upgrade path (public v3 spec): a tree may CARRY v2-era
    position-delete parquet, but a NEW DV for a data file must include
    every previously-deleted position of that file — external v3
    readers may ignore position deletes once a DV exists.  Pin: delete
    under v2 (parquet tombstones), upgrade, delete again under v3 →
    the new DV's cardinality covers both rounds and the scan masks the
    union."""
    df = spark.range(0, 100).selectExpr("id", "cast(id % 7 as string) k")
    t = IceTable.create(
        spark,
        os.path.join(warehouse, "rl_upg"),
        df.schema,
        properties={
            "format.spec-primary": "true",
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df.coalesce(1))  # ONE data file: both deletes touch it
    delete(t, col("id") < 10)  # v2: position-delete parquet
    assert [
        f for f in t.live_files(content="all") if f.content == "position-deletes"
    ]
    t.set_properties(**{"format.spec-version": "3"})
    delete(t, (col("id") >= 10) & (col("id") < 20))  # v3: DV, folds prior
    dvs = [
        f for f in t.live_files(content="all") if f.content == "deletion-vectors"
    ]
    assert dvs
    # every touched file's DV holds BOTH rounds' positions
    assert sum(f.record_count for f in dvs) == 20
    got = sorted(r.id for r in t.toDF().collect())
    assert got == list(range(20, 100))


def test_read_iceberg_row_lineage_guards(spark, warehouse):
    """ADVICE r12: read_iceberg(row_lineage=True) mirrors the native
    toDF guards — a v2 tree raises (instead of silently serving
    all-NULL lineage) and a schema shadowing the reserved names raises
    (instead of duplicating the column)."""
    import os

    from icepack.iceberg_import import read_iceberg

    t2 = _mk(
        spark, warehouse, "rl_g2", n=20, props={"format.spec-primary": "true"}
    )
    with pytest.raises(ValueError, match="format-version 3"):
        read_iceberg(
            spark, os.path.join(warehouse, "rl_g2", "metadata"), row_lineage=True
        )

    df = spark.range(5).selectExpr("id", "cast(id as long) _row_id")
    t3 = IceTable.create(
        spark, os.path.join(warehouse, "rl_g3"), df.schema, properties=dict(V3)
    )
    t3.append(df)
    with pytest.raises(ValueError, match="shadow"):
        read_iceberg(
            spark, os.path.join(warehouse, "rl_g3", "metadata"), row_lineage=True
        )


def test_sql_row_lineage_surface(spark, warehouse):
    """VERDICT r12 task 3: IceSQL serves the reserved lineage columns
    on qualifying tables — and a SHADOWING table keeps serving its own
    data column (no lineage hijack)."""
    import os

    from icepack.sql import IceSQL

    isql = IceSQL(spark, os.path.join(warehouse, "sqlwh"))
    isql.sql(
        "CREATE ICEBERG TABLE db.ev (id BIGINT NOT NULL, k VARCHAR(8)) "
        "TBLPROPERTIES ('format.spec-primary'='true', "
        "'format.spec-version'='3')"
    )
    spark.range(40).selectExpr("id", "cast(id % 3 as string) k").repartition(
        1
    ).sortWithinPartitions("id").createOrReplaceTempView("ev_src")
    isql.sql("INSERT INTO db.ev SELECT * FROM ev_src")
    isql.sql("UPDATE db.ev SET k = 'u' WHERE id < 5")
    rows = isql.sql(
        "SELECT id, _row_id AS rid, _last_updated_sequence_number AS lu "
        "FROM ev ORDER BY id"
    ).collect()
    assert [r.rid for r in rows] == list(range(40))
    assert all((r.lu == 2) == (r.id < 5) for r in rows)
    # CDC watermark form straight from the docs' incremental pattern
    upd = isql.sql(
        "SELECT id FROM ev WHERE _last_updated_sequence_number > 1"
    ).collect()
    assert sorted(r.id for r in upd) == list(range(5))
    # a shadowing table serves ITS OWN column, never the metadata one
    isql.sql("CREATE ICEBERG TABLE db.sh (id BIGINT NOT NULL, _row_id BIGINT)")
    isql.sql("INSERT INTO db.sh VALUES (1, 777)")
    got = isql.sql("SELECT id, _row_id FROM sh").collect()
    assert [(r.id, r._row_id) for r in got] == [(1, 777)]
