"""format.spec-primary=true: the table's ONLY metadata tree is Apache
Iceberg v2 spec files (docs/11-multi-engine-compatibility.md:112-120 —
one tree both engines commit to; no mirror, no drift).

The invariants pinned here:
- every lifecycle operation (append, COW/MOR DML, compaction, expire,
  schema/partition evolution, branches/WAP, rewrite_manifests) commits
  spec files ONLY, and after each step the native scan and the
  independent spec reader (``read_iceberg`` over the same tree) agree
  row-for-row — plus the DuckDB render as the third leg;
- reload from disk round-trips the full native model (schemas,
  specs, snapshots, refs, stats-driven pruning);
- non-spec-expressible transforms refuse at CREATE / update_spec, and
  the property cannot be enabled on a non-empty table;
- crash-consistency and distributed planning hold under the format.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from icepack.expr import col
from icepack.iceberg_import import read_iceberg
from icepack.table import IceTable

from tests.conftest import rows_sorted

PROPS = {"format.spec-primary": "true"}


def _df(spark, n=20, off=0):
    return spark.createDataFrame(
        [(i + off, f"n{i + off}", float(i + off), i % 4) for i in range(n)],
        "id bigint, name string, v double, k int",
    )


def _assert_tree_is_spec_only(loc):
    names = os.listdir(os.path.join(loc, "metadata"))
    bad = [
        n
        for n in names
        if not (
            n.startswith("v") and n.endswith(".metadata.json")
        )
        and not n.endswith(".avro")
        and n not in ("version-hint.json", "version-hint.text")
    ]
    assert not bad, f"non-spec metadata files: {bad}"
    # and the CURRENT metadata.json is spec-shaped
    hint = json.load(open(os.path.join(loc, "metadata", "version-hint.json")))
    md = json.load(
        open(os.path.join(loc, "metadata", f"v{hint['version']}.metadata.json"))
    )
    assert md["format-version"] == 2
    assert md["schemas"][0]["type"] == "struct"
    assert int(open(os.path.join(loc, "metadata", "version-hint.text")).read()) == hint[
        "version"
    ]
    # metadata-log chains every previous version, oldest first (external
    # engines walk it for metadata history)
    mlog = md.get("metadata-log") or []
    assert [os.path.basename(e["metadata-file"]) for e in mlog] == [
        f"v{i}.metadata.json" for i in range(1, hint["version"])
    ]


def _triangle(spark, t, loc):
    """native scan == independent spec read == DuckDB render."""
    native = rows_sorted(t.toDF())
    ext = read_iceberg(spark, os.path.join(loc, "metadata"))
    assert rows_sorted(ext.select(*t.toDF().columns)) == native
    import duckdb

    from icepack.interop import duckdb_snapshot_sql

    con = duckdb.connect()
    got = sorted(
        [tuple(r) for r in con.execute(duckdb_snapshot_sql(t)).fetchall()],
        key=lambda x: tuple(map(repr, x)),
    )
    assert got == native
    return native


def test_lifecycle_triangle(spark, tmp_path):
    loc = str(tmp_path / "sp tbl")  # space: URI canonicalization
    df = _df(spark)
    t = IceTable.create(
        spark, loc, df.schema, partition_by=[("k", "identity")], properties=PROPS
    )
    t.append(df)
    _triangle(spark, t, loc)
    t.append(_df(spark, 10, off=100))
    _triangle(spark, t, loc)
    t.delete(col("id") == 5)  # COW delete
    _triangle(spark, t, loc)
    t.update(col("id") == 7, {"name": F.lit("upd")})
    native = _triangle(spark, t, loc)
    assert any(r[1] == "upd" for r in native)
    # schema evolution: rename + add column
    t.rename_column("v", "score")
    t.add_column("extra", "string")
    t.append(
        spark.createDataFrame(
            [(500, "x", 1.0, 1, "e")],
            "id bigint, name string, score double, k int, extra string",
        )
    )
    _triangle(spark, t, loc)
    # partition evolution
    t.update_spec([("id", "truncate[100]")])
    t.append(
        spark.createDataFrame(
            [(600, "y", 2.0, 2, "f")],
            "id bigint, name string, score double, k int, extra string",
        )
    )
    _triangle(spark, t, loc)
    # maintenance: compact + rewrite manifests + expire
    from icepack import maintenance

    maintenance.compact(t)
    _triangle(spark, t, loc)
    maintenance.rewrite_manifests(t)
    _triangle(spark, t, loc)
    maintenance.expire_snapshots(t, older_than_ms=2**62, retain_last=1)
    t.refresh()
    native = _triangle(spark, t, loc)
    _assert_tree_is_spec_only(loc)
    # reload from COLD and verify pruning works off decoded spec stats
    t2 = IceTable.load(spark, loc)
    assert rows_sorted(t2.toDF()) == native
    assert t2.verify() == []  # fsck: stored spec summaries match recompute
    hit, report = t2.plan_files(col("id") == 600)
    assert report["files_scanned"] < report["files_total"]


def test_mor_lifecycle_and_wap(spark, tmp_path):
    loc = str(tmp_path / "sp_mor")
    df = _df(spark, 12)
    t = IceTable.create(
        spark,
        loc,
        df.schema,
        properties={**PROPS, "write.delete.mode": "merge-on-read"},
    )
    t.append(df)
    t.delete(col("id") == 3)  # equality delete
    t.append(spark.createDataFrame([(3, "re", 9.0, 0)], df.schema))
    t.set_properties(**{"write.delete.mor.strategy": "position"})
    t.delete(col("id") == 7)  # position delete
    native = _triangle(spark, t, loc)
    assert [r[1] for r in native if r[0] == 3] == ["re"]
    assert all(r[0] != 7 for r in native)
    # WAP: stage on a branch, audit, cherry-pick onto main
    t.create_branch("audit")
    b1 = t.append(spark.createDataFrame([(50, "b", 1.0, 1)], df.schema), branch="audit")
    assert all(r[0] != 50 for r in rows_sorted(t.toDF()))  # main unchanged
    t.cherry_pick(b1.snapshot_id)
    native = _triangle(spark, t, loc)
    assert any(r[0] == 50 for r in native)
    _assert_tree_is_spec_only(loc)
    # MOR reload: masks survive a cold load and further DML
    t2 = IceTable.load(spark, loc)
    assert rows_sorted(t2.toDF()) == native
    assert t2.verify() == []
    t2.delete(col("id") == 0)
    assert all(r[0] != 0 for r in rows_sorted(t2.toDF()))


def test_partitioned_mor_deletes_use_unpartitioned_spec(spark, tmp_path):
    """On a PARTITIONED spec-primary table, delete manifests must sit
    under an unpartitioned spec: spec engines match delete files to
    data files by partition, and dml's empty tuple under the
    partitioned spec would read as all-null — rows would resurrect in
    external reads (the r5-ADVICE export bug, pinned closed for the
    primary tree)."""
    from icepack.avroenc import read_container_with_meta

    loc = str(tmp_path / "sp_pmor")
    df = _df(spark, 16)
    t = IceTable.create(
        spark,
        loc,
        df.schema,
        partition_by=[("k", "identity")],
        properties={**PROPS, "write.delete.mode": "merge-on-read"},
    )
    t.append(df)
    t.delete(col("id") == 6)  # equality delete on a partitioned table
    native = _triangle(spark, t, loc)
    assert all(r[0] != 6 for r in native)
    # the delete manifest's OCF metadata declares an UNPARTITIONED spec
    mdirp = os.path.join(loc, "metadata")
    hint = json.load(open(os.path.join(mdirp, "version-hint.json")))
    md = json.load(open(os.path.join(mdirp, f"v{hint['version']}.metadata.json")))
    snap = next(
        s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"]
    )
    _, mlist, _ = read_container_with_meta(open(snap["manifest-list"], "rb").read())
    del_mans = [m for m in mlist if m["content"] == 1]
    assert del_mans, "no delete manifest written"
    for m in del_mans:
        _, _, ocf = read_container_with_meta(open(m["manifest_path"], "rb").read())
        assert json.loads(ocf["partition-spec"].decode()) == []
    # the unpartitioned spec is registered and collision-free with
    # later partition evolution
    specs = {sp["spec-id"]: sp["fields"] for sp in md["partition-specs"]}
    assert [] in specs.values()
    t.update_spec([("id", "truncate[100]")])
    assert t.meta.spec.fields  # new spec got a fresh id, still partitioned
    t.append(_df(spark, 4, off=200))
    _triangle(spark, t, loc)
    t2 = IceTable.load(spark, loc)
    assert t2.verify() == []


def test_distributed_planning_over_spec_manifests(spark, tmp_path):
    loc = str(tmp_path / "sp_dist")
    df = _df(spark, 40)
    t = IceTable.create(
        spark, loc, df.schema, properties={**PROPS, "read.plan-mode": "distributed"}
    )
    t.append(df.repartition(4))
    got = rows_sorted(t.toDF(col("id") >= 20))
    want = rows_sorted(df.filter(F.col("id") >= 20))
    assert got == want


def test_refuses_non_spec_transforms_and_midlife_enable(spark, tmp_path):
    df = _df(spark, 4)
    with pytest.raises(ValueError, match="spec-expressible"):
        IceTable.create(
            spark,
            str(tmp_path / "bad1"),
            df.schema,
            partition_by=[("id", "bucket[8]")],  # native xxhash64: void
            properties=PROPS,
        )
    t = IceTable.create(spark, str(tmp_path / "ok1"), df.schema, properties=PROPS)
    with pytest.raises(ValueError, match="spec-expressible"):
        t.update_spec([("id", "bucket[8]")])
    # mmh3bucket IS allowed (spec murmur3 bucket)
    t.update_spec([("id", "mmh3bucket[8]")])
    t.append(df)
    _triangle(spark, t, str(tmp_path / "ok1"))
    # enabling on a non-empty native table refuses
    n = IceTable.create(spark, str(tmp_path / "nat"), df.schema)
    n.append(df)
    with pytest.raises(ValueError, match="empty"):
        n.set_properties(**PROPS)
    # enabling on an EMPTY table works
    e = IceTable.create(spark, str(tmp_path / "empty"), df.schema)
    e.set_properties(**PROPS)
    e.append(df)
    _triangle(spark, e, str(tmp_path / "empty"))


def test_streaming_ingest_into_spec_primary(spark, tmp_path):
    """The bronze streaming sink commits through the same snapshot
    path, so a spec-primary table ingests a stream and every commit is
    spec files (docs/12 bronze pattern x docs/11 shared tables)."""
    from icepack.streaming import write_stream_to_table

    src = str(tmp_path / "src")
    df = _df(spark, 24)
    df.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    loc = str(tmp_path / "sp_stream")
    t = IceTable.create(spark, loc, schema, properties=PROPS)
    q = write_stream_to_table(stream, t, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    t.refresh()
    assert t.toDF().count() == 24
    assert len(t.meta.snapshots) >= 2  # one commit per micro-batch
    _triangle(spark, t, loc)
    _assert_tree_is_spec_only(loc)


def test_concurrent_appends_converge(spark, tmp_path):
    """Two handles to the same spec-primary table racing appends: the
    CAS (O_EXCL on v{N}.metadata.json) serializes them and the retry
    merges — both commits land, no rows lost."""
    loc = str(tmp_path / "sp_race")
    df = _df(spark, 8)
    a = IceTable.create(spark, loc, df.schema, properties=PROPS)
    a.append(df)
    b = IceTable.load(spark, loc)
    a.append(_df(spark, 4, off=100))   # advances to v3
    b.append(_df(spark, 4, off=200))   # stale handle: conflict -> retry
    a.refresh()
    assert a.toDF().count() == 16
    _triangle(spark, a, loc)


@pytest.mark.parametrize("codec", ["deflate", "snappy", "zstandard"])
def test_compressed_codec_manifests(spark, tmp_path, codec):
    """write.avro.codec={deflate,snappy,zstandard}: spec-primary
    manifests compress with the requested codec and the whole triangle
    still reads them (our reader + the DuckDB render both consume the
    compressed tree)."""
    loc = str(tmp_path / f"sp_{codec}")
    df = _df(spark, 30)
    t = IceTable.create(
        spark,
        loc,
        df.schema,
        properties={**PROPS, "write.avro.codec": codec},
    )
    t.append(df)
    t.delete(col("id") == 2)
    _triangle(spark, t, loc)
    # manifests really carry the codec marker
    from icepack.avroenc import read_container_with_meta

    mdirp = os.path.join(loc, "metadata")
    avros = [n for n in os.listdir(mdirp) if n.endswith(".avro")]
    assert avros
    for n in avros:
        _, _, meta = read_container_with_meta(open(os.path.join(mdirp, n), "rb").read())
        assert meta["avro.codec"] == codec.encode()
    t2 = IceTable.load(spark, loc)
    assert t2.verify() == []


def test_rewrite_manifests_preserves_delete_files(spark, tmp_path):
    """rewrite_manifests on a spec-primary MOR table must NOT re-shape
    (or worse, delete) already-spec-shaped delete files: detection is
    content-based (reserved field ids), and originals referenced by
    historical snapshots always survive."""
    from icepack import maintenance

    loc = str(tmp_path / "sp_rwm")
    df = _df(spark, 10)
    t = IceTable.create(
        spark, loc, df.schema, properties={**PROPS, "write.delete.mode": "merge-on-read"}
    )
    t.append(df)
    pre = t.meta.current_snapshot
    t.delete(col("id") == 4)
    dels_before = sorted(
        f.path for f in t.live_files(content="deletes")
    )
    maintenance.rewrite_manifests(t)
    dels_after = sorted(f.path for f in t.live_files(content="deletes"))
    # the SAME spec-shaped delete files are referenced — no re-copy
    assert dels_after == dels_before
    for p in dels_before:
        assert os.path.exists(p)
    native = _triangle(spark, t, loc)
    assert all(r[0] != 4 for r in native)
    # historical snapshot still reads (no file was removed)
    assert t.toDF(snapshot=pre).count() == 10
    assert IceTable.load(spark, loc).verify() == []


def test_convert_native_table_to_spec_primary(spark, tmp_path):
    """Metadata-only migration: a non-empty NATIVE table (partitioned,
    merge-on-read, post-rename) converts to spec-primary in one
    replace commit — no data copied, sequence numbers preserved (MOR
    masks unchanged), pre-conversion snapshots still natively
    time-travelable, external readers agree from the conversion
    snapshot forward, and further DML writes spec files."""
    from icepack import maintenance

    loc = str(tmp_path / "conv tbl")
    df = _df(spark, 14)
    t = IceTable.create(
        spark,
        loc,
        df.schema,
        partition_by=[("k", "identity")],
        properties={"write.delete.mode": "merge-on-read"},
    )
    s1 = t.append(df)
    t.delete(col("id") == 3)  # native MOR equality delete
    t.rename_column("v", "score")
    before = rows_sorted(t.toDF())
    n_versions = t._version

    snap = maintenance.convert_to_spec_primary(t)
    assert snap.summary["converted-to"] == "spec-primary"
    assert t.spec_primary
    # no data copied: live data files identical
    assert rows_sorted(t.toDF()) == before
    # the current snapshot's manifests are ALL spec avro
    for m in t._read_mlist(t.meta.current_snapshot.manifest_list):
        assert m["manifest-path"].endswith(".avro")
    # triangle from the conversion snapshot forward
    _triangle(spark, t, loc)
    # pre-conversion snapshot still reads natively (old manifests kept)
    assert t.toDF(snapshot=t.meta.snapshot_by_id(s1.snapshot_id)).count() == 14
    # MOR sequence semantics survived: re-insert id=3 and delete again
    t.append(spark.createDataFrame([(3, "re", 1.0, 0)], "id bigint, name string, score double, k int"))
    native = _triangle(spark, t, loc)
    assert [r[1] for r in native if r[0] == 3] == ["re"]
    # cold reload + fsck + idempotent convert
    t2 = IceTable.load(spark, loc)
    assert t2.verify() == []
    assert maintenance.convert_to_spec_primary(t2).snapshot_id == t2.meta.current_snapshot_id
    assert t2._version >= n_versions + 1


def test_foreign_spec_tree_native_adoption(spark, tmp_path):
    """A spec tree written WITHOUT icepack stashes (standing in for an
    external engine's table: export_iceberg output, which carries no
    per-file schema ids) loads as a first-class native table: reads
    resolve pre-rename files through the name mapping, MOR masks
    apply, pruning works off decoded bounds, DML commits on top, fsck
    is clean, and read_iceberg still agrees after our commits."""
    from icepack.iceberg_export import export_iceberg

    src_loc = str(tmp_path / "fsrc")
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(10)],
        "id bigint, name string, v double",
    )
    src = IceTable.create(
        spark, src_loc, df.schema, properties={"write.delete.mode": "merge-on-read"}
    )
    src.append(df)
    src.rename_column("v", "score")  # pre-rename files store "v"
    src.append(
        spark.createDataFrame([(100, "x", 50.0)], "id bigint, name string, score double")
    )
    src.delete(col("id") == 3)  # equality delete
    want = rows_sorted(src.toDF())

    floc = str(tmp_path / "foreign tbl")  # space: canonicalization
    os.makedirs(os.path.join(floc, "metadata"))
    export_iceberg(src, dest=os.path.join(floc, "metadata"))

    t = IceTable.load(spark, floc)
    assert t.spec_primary  # spec-shaped trees stay spec on commit
    assert rows_sorted(t.toDF().select("id", "name", "score")) == want
    assert t.verify() == []
    hit, rep = t.plan_files(col("id") == 100)
    assert rep["files_scanned"] < rep["files_total"]
    # native DML on the adopted tree
    t.delete(col("id") == 5)
    t.append(
        spark.createDataFrame([(200, "y", 9.0)], "id bigint, name string, score double")
    )
    got = sorted(r.id for r in t.toDF().collect())
    assert got == [0, 1, 2, 4, 6, 7, 8, 9, 100, 200]
    # the mixed tree (foreign manifests + our commits) still reads
    # identically through the independent spec reader AND cold reload
    ext = read_iceberg(spark, os.path.join(floc, "metadata"))
    assert sorted(r.id for r in ext.collect()) == got
    t2 = IceTable.load(spark, floc)
    assert sorted(r.id for r in t2.toDF().collect()) == got
    assert t2.verify() == []
    # compaction rewrites foreign files into native ones; answers hold
    from icepack import maintenance

    maintenance.compact(t2)
    assert sorted(r.id for r in t2.toDF().collect()) == got


@pytest.mark.parametrize(
    "name,part,mode,evolve",
    [
        ("plain", None, "cow", False),
        ("kpart", [("k", "identity")], "cow", False),
        ("mmh3", [("id", "mmh3bucket[4]")], "morpos", False),
        ("trunc", [("id", "truncate[8]")], "mor", False),
        ("evolved", None, "mor", True),
        ("partevo", [("k", "identity")], "morpos", "spec"),
    ],
)
def test_grid_triangle(spark, tmp_path, name, part, mode, evolve):
    """Grid sweep (partitioning x delete mode x evolution) under
    spec-primary: after EVERY mutation the three readers agree — the
    same net the export/import pair has, applied to the primary tree."""
    loc = str(tmp_path / name)
    df = _df(spark, 12)
    props = dict(PROPS)
    if mode in ("mor", "morpos"):
        props["write.delete.mode"] = "merge-on-read"
    if mode == "morpos":
        props["write.delete.mor.strategy"] = "position"
    t = IceTable.create(spark, loc, df.schema, partition_by=part, properties=props)
    t.append(df)
    _triangle(spark, t, loc)
    t.delete(col("id") == 6)
    _triangle(spark, t, loc)
    t.append(_df(spark, 3, off=100))
    _triangle(spark, t, loc)
    if evolve is True:
        t.rename_column("name", "title")
        t.add_column("extra", "double")
        t.append(
            spark.createDataFrame(
                [(500, "z", 5.0, 1, 9.9)],
                "id bigint, title string, v double, k int, extra double",
            )
        )
        _triangle(spark, t, loc)
    elif evolve == "spec":
        t.update_spec([("id", "truncate[100]")])
        t.append(_df(spark, 3, off=300))
        _triangle(spark, t, loc)
    # cold reload always equals and fscks clean
    t2 = IceTable.load(spark, loc)
    assert rows_sorted(t2.toDF()) == rows_sorted(t.toDF())
    assert t2.verify() == []
    _assert_tree_is_spec_only(loc)


@pytest.mark.parametrize("op", ["append", "mor_delete", "compact"])
def test_crash_consistency_spec_ops(spark, tmp_path, op):
    """Die at every metadata mutation of a spec-primary append / MOR
    delete / compaction: the reopened table equals pre- or post-state,
    never partial."""
    from icepack.storage import LocalStore
    from tests.faultstore import CrashingStore, SimulatedCrash

    df = _df(spark, 6)
    props = (
        {**PROPS, "write.delete.mode": "merge-on-read"}
        if op == "mor_delete"
        else PROPS
    )

    def mutate(handle):
        if op == "append":
            handle.append(_df(spark, 3, off=100))
        elif op == "mor_delete":
            handle.delete(col("id") == 2)
        else:
            from icepack import maintenance

            maintenance.compact(handle)

    def rows_after(tbl):
        return rows_sorted(tbl.toDF())

    k = 0
    while True:
        loc = str(tmp_path / f"cr-{op}-{k}")
        base = LocalStore()
        t = IceTable.create(spark, loc, df.schema, properties=props, store=base)
        t.append(df)
        if op == "compact":
            t.append(_df(spark, 2, off=50))  # something to compact
        before = rows_after(t)
        crasher = CrashingStore(base, k)
        tc = IceTable.load(spark, loc, store=crasher)
        try:
            mutate(tc)
            # no crash at this k: the sweep is complete
            t2 = IceTable.load(spark, loc, store=base)
            after = rows_after(t2)
            assert after != before or op == "compact"
            break
        except SimulatedCrash:
            t2 = IceTable.load(spark, loc, store=base)
            got = rows_after(t2)
            if op == "append":
                ok = got == before or len(got) == len(before) + 3
            elif op == "mor_delete":
                ok = got == before or all(r[0] != 2 for r in got)
            else:
                ok = got == before  # compact never changes rows
            assert ok, f"partial state at k={k} for {op}"
        k += 1
        assert k < 60, "sweep did not terminate"


def _rewrite_parquet_file_paths_to_uri(path):
    """In-place rewrite of a position-delete parquet: file_path values
    become percent-encoded file:// URIs, schema (incl. the reserved
    field ids) preserved — stands in for a foreign engine that spells
    delete targets as URIs (ADVICE r6 high)."""
    from urllib.parse import quote

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    idx = tbl.schema.get_field_index("file_path")
    vals = [
        v if v is None or v.startswith("file:") else "file://" + quote(v)
        for v in tbl.column(idx).to_pylist()
    ]
    tbl = tbl.set_column(idx, tbl.schema.field(idx), pa.array(vals, pa.string()))
    pq.write_table(tbl, path)


def test_foreign_uri_position_delete_paths_apply(spark, tmp_path):
    """ADVICE r6 (high): a spec-shaped position-delete file whose
    file_path values are spelled as ``file:`` URIs (the common foreign
    spelling; reserved field ids present, so no rewrite happens) must
    still mask rows on the NATIVE read — both sides of the anti-join
    canonicalize, otherwise deleted rows silently resurrect."""
    loc = str(tmp_path / "sp uri del")  # space: canonicalization
    df = _df(spark, 12)
    t = IceTable.create(
        spark,
        loc,
        df.schema,
        properties={
            **PROPS,
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df)
    t.delete(col("id") == 7)  # position delete, spec-shaped on disk
    dels = [d for d in t.live_files(content="deletes")]
    assert dels and all(d.content == "position-deletes" for d in dels)
    for d in dels:
        _rewrite_parquet_file_paths_to_uri(d.path)
    t2 = IceTable.load(spark, loc)
    got = sorted(r.id for r in t2.toDF().collect())
    assert got == [i for i in range(12) if i != 7]
    # the independent spec reader agrees on the same tree
    ext = read_iceberg(spark, os.path.join(loc, "metadata"))
    assert sorted(r.id for r in ext.collect()) == got


def test_foreign_uri_manifest_data_paths_native_read(spark, tmp_path):
    """A spec manifest whose data_file.file_path entries are ``file:``
    URIs (foreign spelling) must load natively: read_spec_manifest
    decodes to openable paths (mirroring _snapshot_entries) and the
    delete mask still applies."""
    from urllib.parse import quote

    from icepack.avroenc import read_container_with_meta, write_container

    loc = str(tmp_path / "sp uri man")
    df = _df(spark, 10)
    t = IceTable.create(
        spark,
        loc,
        df.schema,
        properties={
            **PROPS,
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df)
    t.delete(col("id") == 4)
    # rewrite every spec manifest's file_path entries to file:-URIs
    mdirp = os.path.join(loc, "metadata")
    hint = json.load(open(os.path.join(mdirp, "version-hint.json")))
    md = json.load(open(os.path.join(mdirp, f"v{hint['version']}.metadata.json")))
    snap = next(
        s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"]
    )
    _, mlist, _ = read_container_with_meta(open(snap["manifest-list"], "rb").read())
    for m in mlist:
        schema, entries, meta = read_container_with_meta(
            open(m["manifest_path"], "rb").read()
        )
        for e in entries:
            p = e["data_file"]["file_path"]
            if not p.startswith("file:"):
                e["data_file"]["file_path"] = "file://" + quote(p)
        extra = {k: v for k, v in meta.items() if not k.startswith("avro.")}
        with open(m["manifest_path"], "wb") as fh:
            fh.write(write_container(schema, entries, b"\x00" * 16, extra_meta=extra))
    t2 = IceTable.load(spark, loc)
    got = sorted(r.id for r in t2.toDF().collect())
    assert got == [i for i in range(10) if i != 4]
    hit, report = t2.plan_files(col("id") == 0)
    assert report["files_scanned"] <= report["files_total"]


def test_native_bucket_table_migrates_to_spec_primary(spark, tmp_path):
    """VERDICT r6 item 4: a table partitioned by the NATIVE xxhash64
    bucket[N] (not spec-expressible) migrates via
    maintenance.migrate_bucket_transform — partition evolution to
    mmh3bucket[N] + clustering rewrite — then converts to spec-primary;
    DML on the converted table triangle-checks across all three
    readers."""
    from icepack import maintenance

    loc = str(tmp_path / "native bucket")
    df = _df(spark, 30)
    t = IceTable.create(
        spark, loc, df.schema, partition_by=[("id", "bucket[4]")]
    )
    t.append(df)
    t.delete(col("id") == 9)
    before = rows_sorted(t.toDF())
    # direct conversion refuses with migration advice
    with pytest.raises(ValueError, match="migrate_bucket_transform"):
        maintenance.convert_to_spec_primary(t)
    snap = maintenance.migrate_bucket_transform(t)
    assert snap is not None and snap.operation == "replace"
    assert rows_sorted(t.toDF()) == before
    assert t.meta.spec.fields[0].transform == "mmh3bucket[4]"
    # second run is a no-op (already migrated)
    assert maintenance.migrate_bucket_transform(t) is None
    maintenance.convert_to_spec_primary(t)
    assert t.spec_primary
    _triangle(spark, t, loc)
    # spec-primary DML on the migrated table
    t.delete(col("id") == 4)
    t.append(_df(spark, 3, off=100))
    native = _triangle(spark, t, loc)
    ids = sorted(r[0] for r in native)
    assert 4 not in ids and 9 not in ids and 102 in ids
    # mmh3 bucket pruning is live on the migrated spec
    hit, report = t.plan_files(col("id") == 7)
    assert report["files_scanned"] <= report["files_total"]
    # cold reload + fsck
    t2 = IceTable.load(spark, loc)
    assert t2.verify() == []
    assert rows_sorted(t2.toDF()) == native


def test_migrated_table_can_still_evolve_partitioning(spark, tmp_path):
    """Post-migration partition evolution must not be blocked by the
    RETIRED native-bucket spec still sitting in the metadata (the
    update_spec check considers live-referenced specs + the new one,
    like the conversion check)."""
    from icepack import maintenance

    loc = str(tmp_path / "evolve after")
    df = _df(spark, 16)
    t = IceTable.create(spark, loc, df.schema, partition_by=[("id", "bucket[4]")])
    t.append(df)
    maintenance.migrate_bucket_transform(t)
    maintenance.convert_to_spec_primary(t)
    # evolution on the converted table: would raise before the fix
    t.update_spec([("k", "identity")])
    t.append(_df(spark, 4, off=100))
    _triangle(spark, t, loc)


def test_migrate_covers_live_files_under_retired_bucket_spec(spark, tmp_path):
    """A table whose DEFAULT spec already evolved past bucket[N] but
    whose LIVE files still sit under the retired bucket spec must not
    get circular advice: migrate_bucket_transform detects the live
    references and compacts (re-homing every row), after which
    conversion succeeds."""
    from icepack import maintenance

    loc = str(tmp_path / "retired bucket")
    df = _df(spark, 12)
    t = IceTable.create(spark, loc, df.schema, partition_by=[("id", "bucket[4]")])
    t.append(df)  # live files under the bucket spec
    t.update_spec([("k", "identity")])  # default spec no longer bucket
    t.append(_df(spark, 4, off=50))
    with pytest.raises(ValueError, match="migrate_bucket_transform"):
        maintenance.convert_to_spec_primary(t)
    snap = maintenance.migrate_bucket_transform(t)
    assert snap is not None  # compaction ran (not a None no-op)
    maintenance.convert_to_spec_primary(t)
    assert t.spec_primary
    native = _triangle(spark, t, loc)
    assert len(native) == 16


def test_spec_primary_v3_deletion_vector_lifecycle(spark, tmp_path):
    """VERDICT r10 item 3 (+ r12 item 1): format.spec-version=3 lets a
    spec-primary tree carry deletion vectors NATIVELY — and as of r13
    MOR DML COMMITS them directly (Iceberg v3 forbids adding
    position-delete files), so a v3 DELETE needs no consolidation
    step: DV entries are content=1 Puffin blob references in spec v3
    manifests, the metadata.json is format-version 3 with next-row-id,
    and the triangle (native == read_iceberg == DuckDB) holds through
    delete → delete → consolidate."""
    from icepack import maintenance as M

    loc = str(tmp_path / "sp3")
    df = _df(spark, 200)
    t = IceTable.create(
        spark, loc, df.schema,
        properties={
            **PROPS,
            "format.spec-version": "3",
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df)
    t.delete(col("k") == 2)
    # the DML itself wrote the DVs: nothing left to consolidate, and no
    # position-delete parquet ever touched the tree
    assert M.write_deletion_vectors(t) is None
    assert not [
        f for f in t.live_files(content="all") if f.content == "position-deletes"
    ]
    dvs = [f for f in t.live_files(content="all") if f.content == "deletion-vectors"]
    assert dvs and all(
        f.content_offset is not None and f.referenced_data_file for f in dvs
    )
    _triangle(spark, t, loc)
    # metadata.json is v3
    hint = json.load(open(os.path.join(loc, "metadata", "version-hint.json")))
    md = json.load(
        open(os.path.join(loc, "metadata", f"v{hint['version']}.metadata.json"))
    )
    assert md["format-version"] == 3 and "next-row-id" in md
    # further MOR deletes + re-consolidation keep the triangle
    t.delete(col("id") < 3)
    _triangle(spark, t, loc)
    M.write_deletion_vectors(t)
    _triangle(spark, t, loc)
    # reload from disk round-trips the DV entries
    t2 = IceTable.load(spark, loc)
    assert rows_sorted(t2.toDF()) == rows_sorted(t.toDF())
    dvs2 = [
        f for f in t2.live_files(content="all") if f.content == "deletion-vectors"
    ]
    assert dvs2 and all(f.content_offset is not None for f in dvs2)


def test_spec_primary_v2_still_refuses_dvs(spark, tmp_path):
    """Without format.spec-version=3 the v2 refusal (and its guidance)
    stands — v2 has no DV entry shape."""
    from icepack import maintenance as M

    df = _df(spark, 50)
    t = IceTable.create(
        spark, str(tmp_path / "sp2"), df.schema,
        properties={
            **PROPS,
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df)
    t.delete(col("k") == 1)
    with pytest.raises(ValueError, match="spec-version=3"):
        M.write_deletion_vectors(t)


def test_convert_to_spec_primary_v3_keeps_dvs(spark, tmp_path):
    """A NATIVE table holding live deletion vectors converts to
    spec-primary when targeting v3 (the v2 conversion refuses with
    migration advice, unchanged) — and the converted tree serves the
    same rows to the independent spec reader."""
    from icepack import maintenance as M

    df = _df(spark, 120)

    def build(loc):
        t = IceTable.create(
            spark, loc, df.schema,
            properties={
                "write.delete.mode": "merge-on-read",
                "write.delete.mor.strategy": "position",
            },
        )
        t.append(df)
        t.delete(col("k") == 3)
        assert M.write_deletion_vectors(t) is not None
        return t

    t = build(str(tmp_path / "n2"))
    with pytest.raises(ValueError, match="spec-version=3"):
        M.convert_to_spec_primary(t)

    t3 = build(str(tmp_path / "n3"))
    t3.set_properties(**{"format.spec-version": "3"})
    before = rows_sorted(t3.toDF())
    M.convert_to_spec_primary(t3)
    assert t3.spec_primary
    assert rows_sorted(t3.toDF()) == before
    _triangle(spark, t3, str(tmp_path / "n3"))


def test_spec_primary_v3_dv_full_maintenance_lifecycle(spark, tmp_path):
    """Hostile probe promoted to a pin (r11): a spec-primary v3 tree
    carrying DVs survives the FULL maintenance battery —
    rewrite_manifests re-encodes the DV entries through the v3 Avro
    shape, fsck (check_data) decodes the blobs clean, compact retires
    them, expire drops history — with the native scan AND the
    independent spec reader serving identical rows throughout."""
    from icepack import maintenance as M
    from icepack.iceberg_import import read_iceberg
    from icepack.maintenance import verify_table

    loc = str(tmp_path / "sp3m")
    df = spark.range(300).selectExpr("id", "CAST(id % 6 AS DOUBLE) v")
    t = IceTable.create(
        spark, loc, df.schema,
        properties={
            **PROPS,
            "format.spec-version": "3",
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df.filter("id < 150"))
    t.append(df.filter("id >= 150"))
    # r13: two v3 MOR deletes on DISJOINT file sets write one DV puffin
    # each; the consolidation then folds them into ONE puffin (r12-era
    # flow wrote position parquet first — v3 DML now commits DVs
    # directly, merging per touched file)
    t.delete(col("id") < 10)
    t.delete(col("id") >= 290)
    assert M.write_deletion_vectors(t) is not None
    want = rows_sorted(t.toDF())

    M.rewrite_manifests(t)
    assert rows_sorted(t.toDF()) == want
    dvs = [f for f in t.live_files(content="all") if f.content == "deletion-vectors"]
    assert dvs and all(f.content_offset is not None for f in dvs)
    assert verify_table(t, check_data=True) == []
    M.compact(t)
    assert rows_sorted(t.toDF()) == want
    rep = M.expire_snapshots(t, older_than_ms=2**62, retain_last=1)
    assert rep["expired"] >= 1
    assert rows_sorted(t.toDF()) == want
    ext = read_iceberg(spark, os.path.join(loc, "metadata"))
    assert rows_sorted(ext.select(*t.toDF().columns)) == want


# -- r13 (VERDICT r12 task 8): hypothesis fuzz of the v3 lifecycle ----------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _fuzz_step_pool():
    """Op vocabulary for the v3 lifecycle fuzz: (name, needs_rows)."""
    return [
        "append",
        "cow_delete",
        "dv_delete",
        "eq_delete",
        "cow_update",
        "mor_update",
        "compact",
        "consolidate_dvs",
        "rewrite_manifests",
    ]


@settings(max_examples=20, deadline=None, derandomize=True)
@given(st.data())
def test_v3_lifecycle_triangle_fuzz(spark, data):
    """VERDICT r12 task 8: ≥20 random v3 lifecycles — every committed
    step re-checks the TRIANGLE (native scan == independent spec
    ``read_iceberg`` == DuckDB render), a driver-side row MODEL (exact
    expected contents), and the lineage invariants (_row_id unique;
    rows untouched by the step keep their ids).  One randomly chosen
    DML step runs under faultstore crash injection at a random commit
    mutation: after the simulated process death the reopened table must
    equal the pre- or post-state, never a partial, and the lifecycle
    continues from whichever state survived."""
    import tempfile

    from icepack import maintenance as M
    from icepack.storage import LocalStore
    from tests.faultstore import CrashingStore, SimulatedCrash

    loc = tempfile.mkdtemp(prefix="icepack-fuzz-")
    base = LocalStore()
    df0 = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(40)], "id bigint, v double"
    )
    t = IceTable.create(
        spark, loc, df0.schema,
        properties={
            "format.spec-primary": "true",
            "format.spec-version": "3",
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
        store=base,
    )
    t.append(df0.coalesce(1).sortWithinPartitions("id"))
    model = {i: float(i % 7) for i in range(40)}
    next_id = 40

    def check(tbl):
        native = _triangle(spark, tbl, loc)  # all three readers agree
        assert sorted(native) == sorted(model.items())  # exact expected rows
        lin = {
            r.id: r._row_id for r in tbl.toDF(row_lineage=True).collect()
        }
        assert len(set(lin.values())) == len(lin)  # ids unique
        return lin

    lin_prev = check(t)

    n_steps = data.draw(st.integers(min_value=3, max_value=5), label="n_steps")
    crash_step = data.draw(
        st.integers(min_value=0, max_value=n_steps - 1), label="crash_step"
    )
    for step in range(n_steps):
        op = data.draw(st.sampled_from(_fuzz_step_pool()), label=f"op{step}")
        lo = data.draw(
            st.integers(min_value=0, max_value=max(next_id - 1, 1)),
            label=f"lo{step}",
        )
        width = data.draw(st.integers(min_value=1, max_value=15), label=f"w{step}")
        hi = lo + width
        touched: set[int] = set()
        post = dict(model)

        def do(handle):
            nonlocal next_id
            if op == "append":
                rows = [(next_id + j, float(j)) for j in range(width)]
                handle.append(
                    spark.createDataFrame(rows, "id bigint, v double")
                    .coalesce(1)
                    .sortWithinPartitions("id")
                )
                for i, v in rows:
                    post[i] = v
                next_id += width
            elif op in ("cow_delete", "dv_delete", "eq_delete"):
                handle.set_properties(
                    **{
                        "write.delete.mode": (
                            "copy-on-write" if op == "cow_delete" else "merge-on-read"
                        ),
                        "write.delete.mor.strategy": (
                            "equality" if op == "eq_delete" else "position"
                        ),
                    }
                )
                handle.delete((col("id") >= lo) & (col("id") < hi))
                for i in range(lo, hi):
                    if post.pop(i, None) is not None:
                        touched.add(i)
            elif op in ("cow_update", "mor_update"):
                handle.set_properties(
                    **{
                        "write.update.mode": (
                            "merge-on-read" if op == "mor_update" else "copy-on-write"
                        )
                    }
                )
                handle.update(
                    (col("id") >= lo) & (col("id") < hi),
                    {"v": F.col("v") + F.lit(100.0)},
                )
                for i in range(lo, hi):
                    if i in post:
                        post[i] += 100.0
                        touched.add(i)
            elif op == "compact":
                M.compact(handle, target_file_size=1 << 26)
            elif op == "consolidate_dvs":
                M.write_deletion_vectors(handle)
            else:
                M.rewrite_manifests(handle)

        if step == crash_step and op not in (
            "compact", "consolidate_dvs", "rewrite_manifests",
        ):
            budget = data.draw(
                st.integers(min_value=0, max_value=4), label=f"budget{step}"
            )
            crasher = CrashingStore(base, budget)
            tc = IceTable.load(spark, loc, store=crasher)
            saved_next = next_id
            try:
                do(tc)
                t = IceTable.load(spark, loc, store=base)
                model = post
            except SimulatedCrash:
                t = IceTable.load(spark, loc, store=base)
                got = sorted(tuple(r) for r in rows_sorted(t.toDF()))
                if got == sorted(post.items()):
                    model = post  # crash after the final CAS: op landed
                else:
                    assert got == sorted(model.items())  # clean pre-state
                    next_id = saved_next
                    touched = set()
        else:
            do(t)
            model = post

        lin_now = check(t)
        if op != "mor_update":
            stable = set(lin_now) & set(lin_prev) - touched
        else:
            stable = set(lin_now) - touched  # re-inserts take fresh ids
        assert all(lin_now[i] == lin_prev[i] for i in stable if i in lin_prev)
        lin_prev = lin_now
