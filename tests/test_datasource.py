"""icepack Python Data Source (icepack/datasource.py): the table layer
as a first-class Spark streaming source.

Pins: initial catch-up, checkpointed incremental restarts (only the
rows appended between runs are delivered), refusal of non-append
commits mid-range, the skip-overwrite-snapshots escape hatch, schema
reconciliation across renames, and the batch reader's per-partition
merge-on-read delete application.
"""

import os

import pytest
from pyspark.sql import Row

from icepack.datasource import register
from icepack.expr import col
from icepack.maintenance import compact
from icepack.table import IceTable

from tests.conftest import rows_sorted


@pytest.fixture()
def ds(spark):
    register(spark)
    return spark


def _mk(spark, base):
    loc = str(base / "t")
    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(6)])
    t = IceTable.create(spark, loc, df.schema)
    t.append(df.filter("id < 3"))
    t.append(df.filter("id >= 3"))
    return t, loc


def _run(spark, loc, out, ck, skip=False):
    r = spark.readStream.format("icepack").option("location", loc)
    if skip:
        r = r.option("skip-overwrite-snapshots", "true")
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _ids(spark, out):
    return sorted(r.id for r in spark.read.parquet(out).collect())


def test_stream_catchup_and_incremental_restart(ds, tmp_path):
    spark = ds
    t, loc = _mk(spark, tmp_path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run(spark, loc, out, ck)
    assert _ids(spark, out) == [0, 1, 2, 3, 4, 5]
    # restart from the checkpoint: ONLY the new append is delivered
    t.append(spark.createDataFrame([Row(id=100, v=1.0), Row(id=101, v=2.0)]))
    _run(spark, loc, out, ck)
    assert _ids(spark, out) == [0, 1, 2, 3, 4, 5, 100, 101]
    # idle restart delivers nothing twice (exactly-once on offsets)
    _run(spark, loc, out, ck)
    assert _ids(spark, out) == [0, 1, 2, 3, 4, 5, 100, 101]


def test_stream_refuses_nonappend_then_skip_option(ds, tmp_path):
    spark = ds
    t, loc = _mk(spark, tmp_path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run(spark, loc, out, ck)
    compact(t)  # replace commit in the next range
    t.append(spark.createDataFrame([Row(id=200, v=9.0)]))
    with pytest.raises(Exception, match="non-append|STREAM_FAILED"):
        _run(spark, loc, out, ck)
    # the escape hatch reads past the rewrite, emitting appends only
    _run(spark, loc, out, ck, skip=True)
    assert _ids(spark, out) == [0, 1, 2, 3, 4, 5, 200]


def test_stream_survives_column_rename(ds, tmp_path):
    spark = ds
    t, loc = _mk(spark, tmp_path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    t.rename_column("v", "score")
    _run(spark, loc, out, ck)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"id", "score"}
    assert sorted(r.score for r in got.collect()) == [float(i) for i in range(6)]


def test_batch_reader_applies_mor_deletes(ds, tmp_path):
    """The batch reader applies merge-on-read delete files per
    partition (r5; previously it refused MOR tables): equality AND
    position deletes, sequence-scoped so rows re-inserted AFTER a
    delete survive — row-identical to toDF()."""
    spark = ds
    t, loc = _mk(spark, tmp_path)
    got = spark.read.format("icepack").option("location", loc).load()
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3, 4, 5]
    # equality delete
    t.set_properties(**{"write.delete.mode": "merge-on-read"})
    t.delete(col("id") == 2)
    got = spark.read.format("icepack").option("location", loc).load()
    assert sorted(r.id for r in got.collect()) == [0, 1, 3, 4, 5]
    # re-insert AFTER the delete: newer sequence → must survive
    t.append(spark.createDataFrame([Row(id=2, v=99.0)]))
    got = spark.read.format("icepack").option("location", loc).load()
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3, 4, 5]
    assert [r.v for r in got.collect() if r.id == 2] == [99.0]
    # position delete on top
    t.set_properties(**{"write.delete.mor.strategy": "position"})
    t.delete(col("id") == 4)
    got = spark.read.format("icepack").option("location", loc).load()
    assert rows_sorted(got) == rows_sorted(t.toDF())
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3, 5]
    # pushdown composes with MOR masks
    got = (
        spark.read.format("icepack").option("location", loc).load()
        .filter("id >= 2")
    )
    assert sorted(r.id for r in got.collect()) == [2, 3, 5]


def test_native_sink_table_to_table_stream(ds, tmp_path):
    """writeStream.format('icepack'): executors write task parquet,
    the driver commits ONE atomic append snapshot per micro-batch with
    a batch-id marker; a checkpointed restart appends only the new
    rows and a re-delivered batch id is dropped, not re-committed."""
    spark = ds
    t, loc = _mk(spark, tmp_path)
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck2")
    d = IceTable.create(spark, dst, t.toDF().schema)

    def pipe():
        q = (
            spark.readStream.format("icepack")
            .option("location", loc)
            .load()
            .writeStream.format("icepack")
            .option("location", dst)
            .option("sink-id", "s1")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    pipe()
    d.refresh()
    assert sorted(r.id for r in d.toDF().collect()) == [0, 1, 2, 3, 4, 5]
    assert [s.operation for s in d.meta.snapshots] == ["append"]
    assert d.meta.snapshots[-1].summary["streaming-batch-id"] == "s1#0"

    t.append(spark.createDataFrame([Row(id=50, v=5.0)]))
    pipe()
    d.refresh()
    assert sorted(r.id for r in d.toDF().collect()) == [0, 1, 2, 3, 4, 5, 50]
    # stats harvested at commit: min/max pruning works on the sink table
    from icepack.expr import col as ecol

    files, _ = d.plan_files(ecol("id") >= 50)
    assert 0 < len(files) < len(d.live_files())


def test_native_sink_redelivery_is_dropped(ds, tmp_path):
    """Direct redelivery probe: committing the same batch id twice must
    leave exactly one snapshot and no orphan files."""
    import glob

    from icepack.datasource import _StreamWriter

    spark = ds
    t, loc = _mk(spark, tmp_path)
    dst = str(tmp_path / "dst")
    d = IceTable.create(spark, dst, t.toDF().schema)
    w = _StreamWriter(dst, "sinkA")

    def deliver():
        import pyarrow as pa

        batch = pa.RecordBatch.from_pydict({"id": [1, 2], "v": [1.0, 2.0]})
        return [w.write(iter([batch]))]

    w.commit(deliver(), 7)
    w.commit(deliver(), 7)  # crash-between-commit-and-checkpoint replay
    d.refresh()
    assert d.toDF().count() == 2
    assert len(d.meta.snapshots) == 1
    live = {f.path for f in d.live_files()}
    on_disk = set(glob.glob(f"{dst}/data/**/*.parquet", recursive=True))
    assert on_disk == live  # the replayed task file was removed


def test_native_sink_partitioned_table(ds, tmp_path):
    """writeStream.format('icepack') onto a partitioned table: tasks
    materialize the hidden partition tuple per row, the per-batch
    commit records real tuples, and pruning works on the sink table."""
    spark = ds
    t, loc = _mk(spark, tmp_path)
    dst = str(tmp_path / "pdst")
    ck = str(tmp_path / "pck")
    d = IceTable.create(
        spark, dst, t.toDF().schema, partition_by=[("id", "bucket[2]")]
    )
    q = (
        spark.readStream.format("icepack")
        .option("location", loc)
        .load()
        .writeStream.format("icepack")
        .option("location", dst)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    d.refresh()
    assert sorted(r.id for r in d.toDF().collect()) == [0, 1, 2, 3, 4, 5]
    tups = {f.partition.get("id_bucket") for f in d.live_files()}
    assert tups and tups <= {0, 1} and None not in tups
    from icepack.expr import col as ecol

    files, _ = d.plan_files(ecol("id") == 3)
    assert 0 < len(files) < len(d.live_files())


def test_native_sink_refuses_spec_added_after_stream_start(ds, tmp_path):
    from icepack.datasource import _StreamWriter

    spark = ds
    df = spark.createDataFrame([Row(id=1, cat="a")])
    dst = str(tmp_path / "pdst2")
    t = IceTable.create(spark, dst, df.schema)
    w = _StreamWriter(dst, "s")  # planned against the unpartitioned spec
    t.update_spec([("cat", "identity")])
    with pytest.raises(ValueError, match="partitioned after"):
        w.commit([], 0)


# -- replay determinism: a batch is a pure function of its offsets --------


def test_replay_after_compaction_delivers_same_batch(ds, tmp_path):
    """Micro-batch replay from the checkpoint must redeliver the ORIGINAL
    files even after a compaction past the range rewrote the live set —
    resolving against "currently live" files silently loses the batch
    (found by the round-4 streaming×maintenance product audit)."""
    from icepack.datasource import _StreamReader

    t, loc = _mk(ds, tmp_path)
    r = _StreamReader(None, loc, {})
    hi = t.meta.current_snapshot.sequence_number
    before = sorted(p.path for p in r.partitions({"seq": 0}, {"seq": hi}))
    assert before
    compact(t)  # replace commit lands AFTER the batch range
    t.refresh()
    after = sorted(p.path for p in r.partitions({"seq": 0}, {"seq": hi}))
    assert after == before


def test_replay_past_expired_history_fails_loudly(ds, tmp_path):
    """If retention expired the end-offset snapshot, a replay must raise
    — an empty batch here is silent data loss, not an empty table."""
    import time

    from icepack.datasource import _StreamReader
    from icepack.maintenance import expire_snapshots

    t, loc = _mk(ds, tmp_path)
    hi = t.meta.current_snapshot.sequence_number
    compact(t)
    expire_snapshots(
        t, older_than_ms=int(time.time() * 1000) + 10**9, retain_last=1
    )
    t.refresh()
    r = _StreamReader(None, loc, {})
    with pytest.raises(ValueError, match="no retained snapshot"):
        r.partitions({"seq": 0}, {"seq": hi})


def test_open_txn_staging_is_invisible_until_published(ds, tmp_path):
    """Branch commits (here: an open multi-statement transaction's
    staged append) bump the GLOBAL sequence counter but must not move
    the stream's offset or leak rows; after COMMIT fast-forwards main,
    the staged rows arrive as a normal incremental batch."""
    from icepack.datasource import _StreamReader
    from icepack.txn import TxnTable

    spark = ds
    loc = str(tmp_path / "txn_t")
    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(3)])
    t = IceTable.create(spark, loc, df.schema)
    t.append(df)
    tx = TxnTable.from_table(t, "__txn_stream_probe")
    tx.append(spark.createDataFrame([Row(id=10, v=10.0)]))

    r = _StreamReader(None, loc, {})
    off = r.latestOffset()
    assert off["seq"] == 1  # main head, not the global counter (2)
    parts = r.partitions({"seq": 0}, off)
    assert parts  # main's rows flow while the txn is open

    tx.txn_apply()  # COMMIT: fast-forward main to the staged head
    off2 = r.latestOffset()
    assert off2["seq"] > off["seq"]
    new = r.partitions(off, off2)
    assert len(new) == 1  # exactly the staged append, as one batch


def test_native_sink_stamps_the_schema_version_it_wrote(ds, tmp_path):
    """A long-lived stream keeps its start-time shape while the table
    evolves underneath.  The sink must stamp files with the schema
    version MATCHING the written columns — stamping "current" made a
    post-rename batch's values read back as NULL (silent data loss,
    round-4 audit)."""
    import pyarrow as pa

    from icepack.datasource import _StreamWriter

    spark = ds
    loc = str(tmp_path / "evo")
    df = spark.createDataFrame([Row(id=1, v=1.0)])
    t = IceTable.create(spark, loc, df.schema)
    w = _StreamWriter(loc, "s")

    def b(rows):
        yield pa.RecordBatch.from_pylist(rows)

    w.commit([w.write(b([{"id": 1, "v": 1.0}]))], 0)
    t.refresh()
    t.rename_column("v", "w")  # evolve mid-stream
    w.commit([w.write(b([{"id": 2, "v": 2.0}]))], 1)  # old shape
    t.refresh()
    rows = {r.id: r.w for r in t.toDF().collect()}
    assert rows == {1: 1.0, 2: 2.0}  # pre-fix: {1: 1.0, 2: None}
    assert sorted(f.schema_id for f in t.live_files()) == [0, 0]

    t.add_column("note", "string")
    w.commit([w.write(b([{"id": 3, "v": 3.0}]))], 2)  # still old shape
    t.refresh()
    assert {r.id: (r.w, r.note) for r in t.toDF().collect()} == {
        1: (1.0, None),
        2: (2.0, None),
        3: (3.0, None),
    }

    # a shape NO schema version ever had must refuse, not mislabel
    with pytest.raises(ValueError, match="no schema version"):
        w.commit([w.write(b([{"id": 4, "bogus": 1.0}]))], 3)


def test_stream_keeps_its_declared_shape_across_inflight_evolution(ds, tmp_path):
    """A RUNNING stream fixed its schema at start; when the table is
    renamed and appended to mid-flight, subsequent batches must still
    arrive in the DECLARED shape (Spark binds rows against it) — the
    new-name column flows into the old name by field id.  A restart
    re-derives the new schema (pinned implicitly by the catchup test)."""
    import pyarrow as pa

    from icepack.datasource import _FilePart, _StreamReader, _read_file

    spark = ds
    loc = str(tmp_path / "inflight")
    df = spark.createDataFrame([Row(id=1, v=1.0)])
    t = IceTable.create(spark, loc, df.schema)
    t.append(df)

    declared = t.meta.schema.to_struct()  # what Spark fixes at start
    r = _StreamReader(declared, loc, {})
    off1 = r.latestOffset()

    t.rename_column("v", "w")  # table evolves under the running stream
    t.append(spark.createDataFrame([Row(id=2, w=2.0)]))
    off2 = r.latestOffset()
    parts = r.partitions(off1, off2)
    assert len(parts) == 1
    batches = list(_read_file(parts[0]))
    names = batches[0].schema.names
    assert names == ["id", "v"]  # declared shape, not current (id, w)
    got = {c: batches[0].column(i).to_pylist() for i, c in enumerate(names)}
    assert got == {"id": [2], "v": [2.0]}  # value flows by field id


def test_randomized_offset_interleavings_deliver_exactly_once(ds, tmp_path):
    """Random interleavings of appends, txn staging/publish and
    manifest rewrites, consumed in random-sized offset steps with
    skip-overwrite-snapshots on: every PUBLISHED appended row arrives
    exactly once, staged rows never leak, and replaying any consumed
    range redelivers the identical file set."""
    import random

    from icepack.datasource import _StreamReader
    from icepack.maintenance import rewrite_manifests
    from icepack.txn import TxnTable

    rnd = random.Random(7)
    spark = ds
    loc = str(tmp_path / "ri")
    schema = spark.createDataFrame([Row(id=1, v=1.0)]).schema
    t = IceTable.create(spark, loc, schema)
    r = _StreamReader(None, loc, {"skip-overwrite-snapshots": "true"})

    published: set[int] = set()
    staged: list[tuple[TxnTable, list[int]]] = []
    delivered: list[str] = []  # file paths consumed
    consumed_ranges: list[tuple[dict, dict, list[str]]] = []
    off = r.initialOffset()
    next_id = 0

    def consume():
        nonlocal off
        new = r.latestOffset()
        parts = r.partitions(off, new)
        paths = sorted(p.path for p in parts)
        consumed_ranges.append((off, new, paths))
        delivered.extend(paths)
        off = new

    for step in range(14):
        op = rnd.choice(["append", "stage", "publish", "rewrite", "consume"])
        if op == "append":
            ids = [next_id + i for i in range(2)]
            next_id += 2
            t.append(spark.createDataFrame([Row(id=i, v=float(i)) for i in ids], schema))
            published.update(ids)
        elif op == "stage":
            tx = TxnTable.from_table(t.refresh(), f"__txn_{step}")
            ids = [next_id + i for i in range(2)]
            next_id += 2
            tx.append(spark.createDataFrame([Row(id=i, v=float(i)) for i in ids], schema))
            staged.append((tx, ids))
        elif op == "publish" and staged:
            tx, ids = staged.pop()
            try:
                tx.txn_apply()
                published.update(ids)
            except ValueError:
                pass  # main advanced under the txn: serialization abort
                # (none-or-all — the staged rows must NEVER be delivered)
            t.refresh()
        elif op == "rewrite" and t.refresh().meta.current_snapshot:
            rewrite_manifests(t)
        elif op == "consume":
            t.refresh()
            consume()
    consume()  # drain

    # exactly-once: the delivered files' rows == the published ids
    import pyarrow.parquet as pq

    got = sorted(
        i for p in delivered for i in pq.read_table(p, columns=["id"])["id"].to_pylist()
    )
    assert got == sorted(published), "delivered rows != published rows"
    assert len(delivered) == len(set(delivered)), "a file was delivered twice"

    # replay determinism: every consumed range redelivers byte-identically
    for lo, hi, paths in consumed_ranges:
        again = sorted(p.path for p in r.partitions(lo, hi))
        assert again == paths, f"replay of ({lo},{hi}] diverged"


def test_schema_resolution_tolerates_arrow_type_spelling_drift(spark, tmp_path):
    """Executors report str(arrow type) of written batches; across
    pyarrow/Spark versions the SPELLING can drift (tz annotation,
    large_string) while names/shape are identical.  Name-exact matches
    must resolve to a schema id instead of permanently failing a
    healthy stream's commits (ADVICE r5 #4)."""
    from types import SimpleNamespace

    from pyspark.sql import types as T

    from icepack.datasource import _StreamWriter

    loc = str(tmp_path / "drift_t")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("s", T.StringType()),
        ]
    )
    t = IceTable.create(spark, loc, schema)
    w = _StreamWriter(loc, "sink-x")

    # exact spellings resolve (baseline)
    from pyspark.sql.pandas.types import to_arrow_type

    exact = [(f.name, str(to_arrow_type(f.dataType))) for f in schema.fields]
    msg = SimpleNamespace(paths=[], columns=exact)
    assert w._resolve_schema_id(t, [msg]) == t.meta.schema.schema_id

    # drifted spellings with identical names also resolve
    drifted = [
        ("id", "int64"),
        ("ts", "timestamp[us, tz=Etc/UTC]"),  # tz spelling drift
        ("s", "large_string"),  # string representation drift
    ]
    msg = SimpleNamespace(paths=[], columns=drifted)
    assert w._resolve_schema_id(t, [msg]) == t.meta.schema.schema_id

    # a genuinely different column SET still refuses loudly
    bad = [("id", "int64"), ("other", "int64"), ("s", "string")]
    msg = SimpleNamespace(paths=[], columns=bad)
    with pytest.raises(ValueError, match="no schema"):
        w._resolve_schema_id(t, [msg])


def test_batch_reader_filter_pushdown_prunes_partitions(ds, tmp_path):
    spark = ds
    """spark.read.format('icepack') prunes like toDF(): pushed filters
    reach plan_files, so a partition-aligned predicate lists fewer
    file partitions (VERDICT r4 next-round #5); every filter is also
    returned to Spark for row-level re-application, so results stay
    exact even where stats can't discriminate."""
    import datetime as dt

    from pyspark.sql import datasource as dsf

    from icepack.datasource import _BatchReader

    loc = str(tmp_path / "pd_t")
    df = spark.createDataFrame(
        [(i, dt.date(2024, 1 + (i % 3), 5), float(i)) for i in range(30)],
        "id bigint, d date, v double",
    )
    t = IceTable.create(spark, loc, df.schema, partition_by=[("d", "month")])
    t.append(df)
    total = len(t.live_files())
    assert total >= 3  # one file set per month partition

    # unit level: pushFilters → partitions() lists a strict subset
    r = _BatchReader(loc)
    still_needed = r.pushFilters([dsf.EqualTo(("d",), dt.date(2024, 2, 5))])
    assert len(list(still_needed)) == 1  # everything re-applied by Spark
    pruned = r.partitions()
    assert 0 < len(pruned) < total

    # scanned < total, QUERY_HISTORY-style
    unfiltered = _BatchReader(loc)
    assert len(unfiltered.partitions()) == total

    # end to end: result equality against toDF under the same predicate
    got = (
        spark.read.format("icepack")
        .load(loc)
        .filter("d = DATE'2024-02-05'")
        .select("id", "v")
    )
    want = t.toDF().filter("d = DATE'2024-02-05'").select("id", "v")
    assert rows_sorted(got) == rows_sorted(want)

    # range + IN + null-ops translate too (superset always returned)
    r2 = _BatchReader(loc)
    r2.pushFilters(
        [
            dsf.GreaterThanOrEqual(("id",), 10),
            dsf.In(("id",), (11, 12)),
            dsf.IsNotNull(("v",)),
        ]
    )
    assert len(r2.partitions()) <= total
    got2 = (
        spark.read.format("icepack").load(loc)
        .filter("id >= 10 and id in (11, 12) and v is not null")
        .select("id")
    )
    assert sorted(x.id for x in got2.collect()) == [11, 12]


def test_batch_reader_lazy_mor_past_delete_cap(ds, tmp_path):
    """Past the driver-side delete-row cap the batch reader must NOT
    error (VERDICT r6 item 3): it ships delete-file references and the
    workers resolve them locally — row-identical to toDF(), including
    sequence scoping, a renamed equality-key column, and pushdown.
    The cap is dropped via the read.mor-delete-row-cap table property
    so the test exercises the lazy path with small fixtures."""
    spark = ds
    loc = str(tmp_path / "lazy t")  # space: path canonicalization
    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(40)])
    t = IceTable.create(
        spark,
        loc,
        df.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "read.mor-delete-row-cap": "3",
        },
    )
    t.append(df.filter("id < 20"))
    t.append(df.filter("id >= 20"))
    t.delete(col("id").isin(2, 5, 7, 21))  # equality deletes (4 rows > cap)
    t.set_properties(**{"write.delete.mor.strategy": "position"})
    t.delete(col("id").isin(10, 30, 31))  # position deletes
    # re-insert after the deletes: newer sequence -> must survive
    t.append(spark.createDataFrame([Row(id=5, v=99.0)]))
    # rename the equality key column: field-id resolution must hold
    t.rename_column("id", "ident")
    want = rows_sorted(t.toDF())
    got = spark.read.format("icepack").option("location", loc).load()
    assert rows_sorted(got) == want
    ids = sorted(r.ident for r in got.collect())
    assert ids == sorted(i for i in range(40) if i not in (2, 7, 10, 21, 30, 31))
    assert [r.v for r in got.collect() if r.ident == 5] == [99.0]
    # pushdown composes with the lazy masks
    got2 = (
        spark.read.format("icepack").option("location", loc).load()
        .filter("ident >= 29")
    )
    assert sorted(r.ident for r in got2.collect()) == [29, 32, 33, 34, 35, 36, 37, 38, 39]
    # and the eager path still serves an under-cap table identically
    t.set_properties(**{"read.mor-delete-row-cap": str(10**6)})
    got3 = spark.read.format("icepack").option("location", loc).load()
    assert rows_sorted(got3) == want


def test_batch_writer_lifecycle(spark, tmp_path):
    # df.write.format("icepack"): create-on-first-write, append,
    # overwrite, atomic abort semantics via the CAS commit
    from icepack.datasource import register
    from icepack.expr import col
    from icepack.table import IceTable
    from pyspark.sql import functions as F

    register(spark)
    loc = str(tmp_path / "bw")
    df = spark.range(0, 300).withColumn("v", F.col("id") % 9)
    df.write.format("icepack").option("location", loc).mode("append").save()
    t = IceTable.load(spark, loc)
    assert t.toDF().count() == 300
    df.filter("id < 50").write.format("icepack").option(
        "location", loc
    ).mode("append").save()
    assert spark.read.format("icepack").load(loc).count() == 350
    # overwrite replaces EVERYTHING in one snapshot
    df.filter("id >= 250").write.format("icepack").option(
        "location", loc
    ).mode("overwrite").save()
    t.refresh()
    assert sorted(r["id"] for r in t.toDF().collect()) == list(range(250, 300))
    # MOR delete masks survive later writer appends (sequence scoping)
    t.set_properties(
        **{
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        }
    )
    t.delete(col("id") == 260)
    df.filter("id < 5").write.format("icepack").option(
        "location", loc
    ).mode("append").save()
    t.refresh()
    got = sorted(r["id"] for r in t.toDF().collect())
    assert got == list(range(5)) + [i for i in range(250, 300) if i != 260]


def test_batch_writer_refusals(spark, tmp_path):
    from icepack.datasource import register
    from icepack.table import IceTable
    from pyspark.sql import functions as F

    register(spark)
    df = spark.range(0, 30).withColumn("v", F.col("id") % 3)
    loc = str(tmp_path / "flat")
    df.write.format("icepack").option("location", loc).mode("append").save()
    with pytest.raises(Exception, match="schema|match"):
        spark.range(3).select(F.col("id").alias("zz")).write.format(
            "icepack"
        ).option("location", loc).mode("append").save()


def test_batch_writer_partitioned_parity_with_append(spark, tmp_path):
    """df.write.format('icepack') onto a partitioned table must be
    manifest-indistinguishable from IceTable.append of the same rows:
    identical partition tuples (including bucket(N) — the Python
    XXH64 vs Spark's JVM hash) with identical per-tuple row counts,
    identical scan results, and working pruning.  Nulls land in the
    same tuples on both paths (identity null → NULL partition, bucket
    null → seed % N)."""
    import datetime as dt

    from icepack.datasource import register
    from icepack.expr import col as ecol
    from icepack.table import IceTable
    from pyspark.sql import functions as F

    register(spark)
    df = (
        spark.range(0, 400)
        .select(
            F.col("id"),
            F.to_timestamp(
                F.concat(
                    F.lit("2024-03-0"),
                    (F.col("id") % 5 + 1).cast("string"),
                    F.lit(" 10:00:00"),
                )
            ).alias("ts"),
            F.when(F.col("id") % 13 == 0, None)
            .otherwise(F.col("id") % 7)
            .alias("v"),
            F.when(F.col("id") % 11 == 0, None)
            .otherwise(F.concat(F.lit("c"), (F.col("id") % 3).cast("string")))
            .alias("cat"),
        )
    )
    spec = [("ts", "day"), ("v", "bucket[4]"), ("cat", "identity")]
    la, lb = str(tmp_path / "a"), str(tmp_path / "b")
    ta = IceTable.create(spark, la, df.schema, partition_by=spec)
    ta.append(df)
    IceTable.create(spark, lb, df.schema, partition_by=spec)
    df.write.format("icepack").option("location", lb).mode("append").save()
    tb = IceTable.load(spark, lb)

    def tuple_rows(t):
        agg = {}
        for f in t.live_files():
            k = tuple(sorted(f.partition.items()))
            agg[k] = agg.get(k, 0) + f.record_count
        return agg

    assert tuple_rows(tb) == tuple_rows(ta)
    assert rows_sorted(tb.toDF()) == rows_sorted(df)
    # pruning on the writer-written table: identity, day, and bucket
    # (plan_files returns a superset; null-partition files are kept
    # conservatively on BOTH paths — assert non-null hits are exact)
    files, rep = tb.plan_files(ecol("cat") == "c1")
    assert files and {f.partition["cat"] for f in files} <= {"c1", None}
    assert rep["files_scanned"] < rep["files_total"]
    files, _ = tb.plan_files(ecol("ts") == dt.datetime(2024, 3, 2, 10))
    assert files and all(f.partition["ts_day"] == "2024-03-02" for f in files)
    files, _ = tb.plan_files(ecol("v") == 3)
    assert files and len({f.partition["v_bucket"] for f in files} - {None}) == 1
    # a second append then overwrite keep tuples consistent
    df.filter("id < 40").write.format("icepack").option("location", lb).mode(
        "append"
    ).save()
    tb.refresh()
    assert tb.toDF().count() == 440
    df.filter("id >= 300").write.format("icepack").option(
        "location", lb
    ).mode("overwrite").save()
    tb.refresh()
    assert rows_sorted(tb.toDF()) == rows_sorted(df.filter("id >= 300"))
    assert all(f.partition for f in tb.live_files())


def test_batch_writer_onto_spec_primary(spark, tmp_path):
    # the writer's commit flows through the same _commit_snapshot as
    # every write, so a spec-primary table gets spec Avro manifests
    # for writer appends too — triangle-checked via read_iceberg
    from icepack.datasource import register
    from icepack.iceberg_import import read_iceberg
    from icepack.maintenance import convert_to_spec_primary
    from icepack.table import IceTable
    from pyspark.sql import functions as F

    register(spark)
    df = spark.range(0, 120).withColumn("v", F.col("id") % 5)
    loc = str(tmp_path / "spw")
    df.write.format("icepack").option("location", loc).mode("append").save()
    t = IceTable.load(spark, loc)
    convert_to_spec_primary(t)
    df.filter("id < 10").write.format("icepack").option(
        "location", loc
    ).mode("append").save()
    t.refresh()
    assert t.toDF().count() == 130
    assert read_iceberg(spark, loc).count() == 130


def test_batch_writer_branch_option_wap(spark, tmp_path):
    """Write-audit-publish through the idiomatic writer:
    .option('branch', 'audit') lands the append on that ref only (main
    unchanged until fast_forward); the branch is created on first
    write; overwrite refuses the branch option."""
    from icepack.datasource import register
    from icepack.table import IceTable
    from pyspark.sql import functions as F

    register(spark)
    loc = str(tmp_path / "wap")
    df = spark.range(0, 100).withColumn("v", F.col("id") % 5)
    df.write.format("icepack").option("location", loc).mode("append").save()
    df.filter("id < 10").write.format("icepack").option("location", loc).option(
        "branch", "audit"
    ).mode("append").save()
    t = IceTable.load(spark, loc)
    assert t.toDF().count() == 100  # main untouched
    assert t.toDF(snapshot=t.as_of(ref="audit")).count() == 110
    # audited: publish
    t.fast_forward("audit")
    assert t.toDF().count() == 110
    with pytest.raises(Exception, match="branch"):
        df.write.format("icepack").option("location", loc).option(
            "branch", "audit"
        ).mode("overwrite").save()


def test_batch_writer_partition_by_option_creates_partitioned(spark, tmp_path):
    """.option('partition-by', 'day(ts), bucket(4, v)') on a
    create-on-first-write: the table is CREATED partitioned and the
    very first write's tasks materialize real tuples (spec id 0 —
    manifests indistinguishable from a pre-created table's); a
    mismatched option against an existing table refuses; unparseable
    terms refuse."""
    from icepack.datasource import register
    from icepack.expr import col as ecol
    from icepack.table import IceTable
    from pyspark.sql import functions as F

    register(spark)
    df = spark.range(0, 120).select(
        F.col("id"),
        F.to_timestamp(
            F.concat(
                F.lit("2024-03-0"),
                (F.col("id") % 3 + 1).cast("string"),
                F.lit(" 09:00:00"),
            )
        ).alias("ts"),
        (F.col("id") % 7).alias("v"),
    )
    loc = str(tmp_path / "pw")
    df.write.format("icepack").option("location", loc).option(
        "partition-by", "day(ts), bucket(4, v)"
    ).mode("append").save()
    t = IceTable.load(spark, loc)
    assert [(f.name, f.transform) for f in t.meta.spec.fields] == [
        ("ts_day", "day"), ("v_bucket", "bucket[4]"),
    ]
    assert all(
        set(f.partition) == {"ts_day", "v_bucket"} for f in t.live_files()
    )
    files, rep = t.plan_files(ecol("ts") == __import__("datetime").datetime(2024, 3, 2, 9))
    assert files and all(f.partition["ts_day"] == "2024-03-02" for f in files)
    assert rep["files_scanned"] < rep["files_total"]
    assert rows_sorted(
        spark.read.format("icepack").load(loc)
    ) == rows_sorted(df)
    # second write: option matching the live spec is accepted
    df.write.format("icepack").option("location", loc).option(
        "partition-by", "day(ts), bucket(4, v)"
    ).mode("append").save()
    t.refresh()
    assert t.toDF().count() == 240
    # mismatched option refuses
    with pytest.raises(Exception, match="does not match"):
        df.write.format("icepack").option("location", loc).option(
            "partition-by", "v"
        ).mode("append").save()
    # unparseable term refuses
    with pytest.raises(Exception, match="cannot parse"):
        df.write.format("icepack").option(
            "location", str(tmp_path / "bad")
        ).option("partition-by", "floor(ts)").mode("append").save()


def test_native_sink_create_on_first_batch_partitioned(ds, tmp_path):
    """writeStream.format('icepack') onto a MISSING table with
    .option('partition-by', ...): the sink creates the table at the
    first micro-batch commit with the requested spec and real tuples."""
    spark = ds
    t, loc = _mk(spark, tmp_path)
    dst = str(tmp_path / "newdst")
    ck = str(tmp_path / "ck3")
    q = (
        spark.readStream.format("icepack")
        .option("location", loc)
        .load()
        .writeStream.format("icepack")
        .option("location", dst)
        .option("partition-by", "bucket(2, id)")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    d = IceTable.load(spark, dst)
    assert [(f.name, f.transform) for f in d.meta.spec.fields] == [
        ("id_bucket", "bucket[2]")
    ]
    assert sorted(r.id for r in d.toDF().collect()) == [0, 1, 2, 3, 4, 5]
    assert {f.partition.get("id_bucket") for f in d.live_files()} <= {0, 1}


def test_partitioned_task_writer_refuses_missing_source_column(tmp_path):
    """pa.Schema.get_field_index spells missing as -1 and column(-1)
    silently returns the LAST column — a renamed partition source must
    refuse loudly, not hash the wrong column into the tuple."""
    import pyarrow as pa

    from icepack.datasource import _write_task_files

    batch = pa.RecordBatch.from_pydict({"id": [1, 2], "v": [1.0, 2.0]})
    with pytest.raises(ValueError, match="partition source column"):
        _write_task_files(
            str(tmp_path), iter([batch]), [("cat", "identity", "cat", "string")]
        )


def test_batch_writer_branch_as_first_write(spark, tmp_path):
    """WAP from scratch: the audit write is the table's FIRST write —
    the writer roots an empty main snapshot, branches, and lands the
    data on the branch; main stays empty until fast_forward."""
    from icepack.datasource import register
    from icepack.table import IceTable
    from pyspark.sql import functions as F

    register(spark)
    loc = str(tmp_path / "wap0")
    df = spark.range(0, 20).withColumn("v", F.col("id") % 3)
    IceTable.create(spark, loc, df.schema)
    df.write.format("icepack").option("location", loc).option(
        "branch", "audit"
    ).mode("append").save()
    t = IceTable.load(spark, loc)
    assert t.toDF().count() == 0  # main: empty root only
    assert t.toDF(snapshot=t.as_of(ref="audit")).count() == 20
    t.fast_forward("audit")
    assert t.toDF().count() == 20


def test_compact_heals_writer_fanout(spark, tmp_path):
    """compact() is the documented remedy for the DSv2 writer's
    tasks x partitions fan-out — pin that it actually re-layouts
    writer-written partitioned tables: fewer files, same rows, same
    tuples, pruning intact."""
    from icepack.datasource import register
    from icepack.expr import col as ecol
    from icepack.maintenance import compact
    from icepack.table import IceTable
    from pyspark.sql import functions as F

    register(spark)
    loc = str(tmp_path / "fan")
    df = spark.range(0, 4000).select(
        F.col("id"), (F.col("id") % 3).alias("g"), (F.col("id") * 1.5).alias("v")
    ).repartition(8)  # un-clustered input: every task touches every g
    df.write.format("icepack").option("location", loc).option(
        "partition-by", "g"
    ).mode("append").save()
    t = IceTable.load(spark, loc)
    before = len(t.live_files())
    assert before > 3  # fan-out happened
    want = rows_sorted(t.toDF())
    compact(t)
    t.refresh()
    after = t.live_files()
    assert len(after) < before
    assert all(set(f.partition) == {"g"} for f in after)
    assert rows_sorted(t.toDF()) == want
    files, rep = t.plan_files(ecol("g") == 1)
    assert files and all(f.partition["g"] == 1 for f in files)
    assert rep["files_scanned"] < rep["files_total"]
