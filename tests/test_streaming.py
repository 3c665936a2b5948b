"""Structured-Streaming ingestion + stateful operators (SURVEY.md
§2.11): file-source stream → icepack sink; watermarked windows; stream
dedup."""


import os

from pyspark.sql import functions as F

from icepack.catalog import Catalog
from icepack.io import load
from icepack.streaming import dedup_within_watermark, tumbling_counts, write_stream_to_table

from tests.conftest import SF_DIR, rows_sorted


def _event_stream(spark, tmp_path, parts=3):
    """Materialize events as N files and open them as a file-source
    stream (one micro-batch per trigger)."""
    ev = load(spark, SF_DIR, "events")
    src = str(tmp_path / "stream-src")
    ev.repartition(parts).write.parquet(src)
    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return ev, stream


def test_stream_ingest_into_table(spark, tmp_path, warehouse):
    """foreachBatch sink: each micro-batch = one snapshot commit; final
    table content == batch content (docs/12:211-236)."""
    ev, stream = _event_stream(spark, tmp_path)
    cat = Catalog(spark, warehouse)
    t = cat.create_table("db.ev", ev.schema, partition_by=[("ts", "day")])
    q = write_stream_to_table(
        stream, t, str(tmp_path / "ckpt"), trigger_available_now=True, coalesce_to=1
    )
    q.awaitTermination(120)
    t.refresh()
    assert rows_sorted(t.toDF()) == rows_sorted(ev)
    assert len(t.meta.snapshots) >= 2  # batch-level snapshot isolation
    ops = {s.operation for s in t.meta.snapshots}
    assert ops == {"append"}


def test_stream_upsert_idempotent(spark, tmp_path, warehouse):
    """CDC-apply: streaming the SAME data twice (at-least-once source)
    leaves exactly one row per key — merge-per-batch is idempotent."""
    from icepack.streaming import write_stream_upsert

    ev = load(spark, SF_DIR, "events")
    src = str(tmp_path / "upsert-src")
    ev.coalesce(1).write.parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)  # duplicate delivery
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    cat = Catalog(spark, warehouse)
    t = cat.create_table("db.ev", ev.schema)
    q = write_stream_upsert(stream, t, ["event_id"], str(tmp_path / "ckpt-upsert"))
    q.awaitTermination(180)
    t.refresh()
    assert t.toDF().count() == ev.count()
    assert t.toDF().select("event_id").distinct().count() == ev.count()


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    """The same window expression under a streaming query and as a
    batch aggregate agree (complete output mode, memory sink)."""
    ev, stream = _event_stream(spark, tmp_path)
    agg = tumbling_counts(stream, window="1 hour", watermark="10 years")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT window_start, event_type, n FROM tumbling_test")
    want = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
    )
    assert rows_sorted(got) == rows_sorted(want)


def test_stream_dedup_within_watermark(spark, tmp_path):
    """A doubled stream deduped on event_id collapses to one copy."""
    ev = load(spark, SF_DIR, "events")
    src = str(tmp_path / "dup-src")
    ev.coalesce(1).write.parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)  # duplicate files
    stream = spark.readStream.schema(ev.schema).parquet(src)
    dedup = dedup_within_watermark(stream, ["event_id"], watermark="10 years")
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) AS n FROM dedup_test").first()["n"]
    assert n == ev.count()


def test_sessionize_with_state(spark, tmp_path):
    """Custom applyInPandasWithState sessionizer: closed sessions match
    a batch session_window twin over the pre-closure rows.  The final
    per-key row (+2 days) closes every earlier session but stays open
    itself, so exactly the twin's sessions are emitted."""
    import datetime as dt

    from icepack.streaming import sessionize_with_state

    base = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    phase1 = [
        ("a", 0), ("a", 60), ("a", 120),       # a session 1
        ("a", 3600), ("a", 3660),              # a session 2
        ("b", 0),                              # b session 1
        ("b", 5000), ("b", 5030),              # b session 2
    ]
    closer = [("a", 200_000), ("b", 200_000)]  # +2.3 days: closes all
    rows = [(k, base + s * sec) for k, s in phase1 + closer]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    src = str(tmp_path / "sess-src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        sessionize_with_state(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT event_type, session_start, session_end, n_events FROM sessions_out"
    )
    phase1_df = spark.createDataFrame(
        [(k, base + s * sec) for k, s in phase1], "event_type string, ts timestamp"
    )
    want = (
        phase1_df.groupBy(F.session_window("ts", "30 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"))
        .select("event_type", "session_start", "session_end", "n_events")
    )
    assert rows_sorted(got) == rows_sorted(want)
    assert got.count() == 4


def test_watermark_drops_late_data(spark, tmp_path):
    """ST4: append-mode windowed agg with a 1-hour watermark — a row
    arriving behind the watermark must be DROPPED, not re-open its
    (already finalized) window."""
    src = str(tmp_path / "late-src")
    os.makedirs(src)

    def write_batch(name, rows):
        spark.createDataFrame(rows, "ts string, k string").select(
            F.to_timestamp("ts").alias("ts"), "k"
        ).coalesce(1).write.mode("append").parquet(src)

    write_batch("b1", [("2024-01-01 10:00:00", "a"), ("2024-01-01 15:00:00", "a")])
    schema = "ts timestamp, k string"
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "k")
        .count()
        .select(F.col("window.start").alias("ws"), "k", "count")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # batch1: watermark advances to 14:00
        # batch2: one LATE row (10:30 < watermark) + one fresh row
        write_batch("b2", [("2024-01-01 10:30:00", "a"), ("2024-01-01 16:00:00", "a")])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["ws"].strftime("%H:%M"), r["k"]): r["count"]
        for r in spark.sql("SELECT * FROM late_test").collect()
    }
    # the 10:00 window was finalized with ONE row; the late 10:30 row
    # must not appear anywhere (would be count=2 or a second emission)
    assert got == {("10:00", "a"): 1}


def test_stream_sink_skips_redelivered_batch(spark, tmp_path, warehouse):
    """foreachBatch is at-least-once: re-running a batch id that
    already committed must be a no-op (batch-id marker in the snapshot
    summary, written inside the same commit)."""
    from icepack.streaming import write_stream_to_table

    cat = Catalog(spark, warehouse)
    ev = load(spark, SF_DIR, "events")
    src = str(tmp_path / "eo-src")
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    t = cat.create_table("db.eo", ev.schema)
    ckpt = str(tmp_path / "eo-ckpt")
    q = write_stream_to_table(stream, t, ckpt)
    q.awaitTermination(180)
    t.refresh()
    assert t.toDF().count() == ev.count()
    # simulate the crash-redelivery: call the sink again with batch 0
    # (same checkpoint identity) — must not double-append
    n_snaps = len(t.meta.snapshots)

    # rebuild the same marker protocol the sink uses
    def redeliver(batch_id):
        t.refresh()
        marker = f"{ckpt}#{batch_id}"
        for s in t.meta.snapshots:
            if s.summary.get("streaming-batch-id") == marker:
                return False
        t.append(ev, extra_summary={"streaming-batch-id": marker})
        return True

    assert redeliver(0) is False          # already committed → skipped
    assert t.toDF().count() == ev.count()
    assert len(t.meta.snapshots) == n_snaps
    assert redeliver(99) is True          # a genuinely new batch commits
    assert t.toDF().count() == 2 * ev.count()


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """ST7: the watermarked click→purchase attribution join under a
    real two-stream query matches the identical batch join."""
    from icepack.streaming import stream_stream_join

    ev = load(spark, SF_DIR, "events")
    csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purch")
    clicks_b = ev.filter("event_type = 'click'")
    purch_b = ev.filter("event_type = 'purchase'")
    clicks_b.coalesce(2).write.parquet(csrc)
    purch_b.coalesce(2).write.parquet(psrc)
    joined = stream_stream_join(
        spark.readStream.schema(ev.schema).parquet(csrc),
        spark.readStream.schema(ev.schema).parquet(psrc),
        watermark="10 years",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ssj_test")
    want = stream_stream_join(clicks_b, purch_b)  # same fn over batch DFs
    assert got.count() > 0
    assert rows_sorted(got) == rows_sorted(want)


def test_record_breakers_matches_batch_twin(spark, tmp_path):
    """transformWithStateInPandas running-max detector: streamed
    record-breaker set equals the batch window twin (prev-row max per
    key), including the broken-record value, across a two-file
    time-ordered replay."""
    import datetime as dt

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from icepack.streaming import record_breakers

    base = dt.datetime(2024, 1, 1)
    rows = []
    vals = {"a": [1.0, 3.0, 2.0, 5.0, 5.0, 7.0], "b": [4.0, 2.0, 6.0, 6.5, 1.0, 9.0]}
    eid = 0
    for k, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append((eid, k, base + dt.timedelta(minutes=i), v))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    src = str(tmp_path / "rb-src")
    # two files split by time: later events in the second file
    df.filter("ts < '2024-01-01 00:03:00'").coalesce(1).write.parquet(src)
    df.filter("ts >= '2024-01-01 00:03:00'").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        record_breakers(stream)
        .writeStream.format("memory")
        .queryName("rb_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_type, r.event_id, r.value, r.prev_record)
        for r in spark.table("rb_out").collect()
    }
    w = W.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    twin = (
        df.withColumn("prev_record", F.max("value").over(w))
        .filter(F.col("prev_record").isNull() | (F.col("value") > F.col("prev_record")))
    )
    want = {
        (r.event_type, r.event_id, r.value, r.prev_record) for r in twin.collect()
    }
    assert got == want and len(want) >= 6


def test_record_breakers_state_survives_restart(spark, tmp_path):
    """State-store durability: run the detector over batch 1 with a
    checkpoint, STOP the query, land batch 2, restart from the same
    checkpoint — the per-key running max must carry across the restart
    (no re-emission, no reset), matching the batch twin over the full
    history."""
    import datetime as dt

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from icepack.streaming import record_breakers

    base = dt.datetime(2024, 1, 1)
    schema = "event_id long, event_type string, ts timestamp, value double"
    src = str(tmp_path / "rbr-src")
    ckpt = str(tmp_path / "rbr-ckpt")

    batch1 = [(0, "a", base, 5.0), (1, "a", base + dt.timedelta(minutes=1), 3.0)]
    # 4.0 is under the carried max 5.0 → must NOT re-emit after restart;
    # 9.0 breaks it
    batch2 = [
        (2, "a", base + dt.timedelta(minutes=2), 4.0),
        (3, "a", base + dt.timedelta(minutes=3), 9.0),
    ]

    def run_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        got: set = set()

        def sink(bdf, _bid):
            got.update(
                (r.event_id, r.value, r.prev_record) for r in bdf.collect()
            )

        q = (
            record_breakers(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    first = run_batch(batch1)
    assert first == {(0, 5.0, None)}
    second = run_batch(batch2)
    # only the genuine new record emits after restart, breaking the
    # max carried in the state store
    assert second == {(3, 9.0, 5.0)}


def test_record_breakers_v2_gate(spark, tmp_path):
    """State-v2 variant: without protobuf it must fail fast with a
    clear ImportError naming the dependency (not an opaque runner
    crash mid-stream); with protobuf present it must produce the same
    record-breaker set as the v1 path's batch twin."""
    import datetime as dt

    from icepack.streaming import record_breakers_v2

    rows = [
        (0, "a", dt.datetime(2024, 1, 1, 0, 0), 1.0),
        (1, "a", dt.datetime(2024, 1, 1, 0, 1), 3.0),
        (2, "a", dt.datetime(2024, 1, 1, 0, 2), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    src = str(tmp_path / "rb2-src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        import pytest

        with pytest.raises(ImportError, match="protobuf"):
            record_breakers_v2(stream)
        return
    q = (
        record_breakers_v2(stream)
        .writeStream.format("memory")
        .queryName("rb2_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.value, r.prev_record)
        for r in spark.table("rb2_out").collect()
    }
    assert got == {(0, 1.0, None), (1, 3.0, 1.0)}


def test_stream_sink_auto_file_sizing(spark, tmp_path):
    """coalesce_to='auto': each commit's file count is estimated batch
    bytes / write.target-file-size-bytes, learned from the live files'
    observed bytes-per-row.  With a deliberately tiny target the second
    batch must split into multiple ~target-sized files; with the
    default 128 MB target a small batch commits exactly one file."""
    from icepack.streaming import write_stream_to_table
    from icepack.table import IceTable

    # incompressible payload (~130 B/row) so parquet size tracks rows
    df = spark.range(0, 20000).selectExpr(
        "id AS event_id",
        "concat(md5(cast(id AS string)), md5(cast(id + 7 AS string)),"
        " md5(cast(id + 13 AS string)), md5(cast(id + 29 AS string))) AS payload",
    )
    src = str(tmp_path / "src")
    df.filter("event_id < 10000").coalesce(1).write.parquet(src)
    df.filter("event_id >= 10000").coalesce(1).write.mode("append").parquet(src)

    def run(location, props):
        t = IceTable.create(spark, location, df.schema, properties=props)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = write_stream_to_table(
            stream, t, location + "-ckpt", coalesce_to="auto"
        )
        q.awaitTermination(120)
        t.refresh()
        return t

    # tiny 8 KB target: batch 2 (10k rows, ~100+ KB parquet) must split
    t = run(str(tmp_path / "small"), {"write.target-file-size-bytes": 8192})
    per_commit = [s.summary.get("added-data-files") for s in t.meta.snapshots]
    assert t.toDF().count() == 20000
    assert int(per_commit[-1]) > 1, per_commit
    # default target: every commit lands exactly one file after the
    # first (which keeps its natural single-task layout here anyway)
    t2 = run(str(tmp_path / "dflt"), None)
    per_commit2 = [int(s.summary.get("added-data-files")) for s in t2.meta.snapshots]
    assert t2.toDF().count() == 20000
    assert per_commit2[-1] == 1, per_commit2


def test_realtime_medallion_stream_to_gold(spark, tmp_path, warehouse):
    """docs/12 'Real-Time Lakehouse' pattern end to end: raw events
    stream into BRONZE (append sink, one snapshot per batch), a second
    streaming query upserts per-user running totals into SILVER (MERGE
    sink via foreachBatch), and a batch GOLD aggregate over silver must
    equal computing the same rollup directly over all raw events —
    streaming+batch unified over the same tables, the docs' claim."""
    from pyspark.sql import functions as F

    from icepack.dml import source_col
    from icepack.streaming import write_stream_to_table

    cat = Catalog(spark, warehouse)
    ev = load(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    src = str(tmp_path / "rt-src")
    ev.repartition(3).write.parquet(src)
    schema = ev.schema
    bronze = cat.create_table("rt.bronze", schema)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q1 = write_stream_to_table(stream, bronze, str(tmp_path / "ck-bronze"))
    q1.awaitTermination(180)
    bronze.refresh()
    assert bronze.toDF().count() == ev.count()
    assert len(bronze.meta.snapshots) >= 2  # batch-level snapshots

    # silver: per-user totals maintained by a MERGE-per-batch sink,
    # fed by the bronze table's files replayed as a stream
    silver = cat.create_table(
        "rt.silver",
        spark.createDataFrame([], "user_id long, n long, total double").schema,
    )
    bsrc = str(tmp_path / "bronze-mirror")
    bronze.toDF().write.parquet(bsrc)

    def upsert_batch(bdf, batch_id):
        silver.refresh()
        silver.merge(
            bdf,
            on=["user_id"],
            when_matched_update={
                "n": source_col("n"),
                "total": source_col("total"),
            },
        )

    totals = (
        spark.readStream.schema(schema)
        .parquet(bsrc)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    q2 = (
        totals.writeStream.outputMode("complete")
        .foreachBatch(upsert_batch)
        .option("checkpointLocation", str(tmp_path / "ck-silver"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    silver.refresh()
    # gold: rollup over silver == direct rollup over raw events
    gold = (
        silver.toDF()
        .agg(
            F.count("*").alias("users"),
            F.sum("n").alias("events"),
            F.round(F.sum("total"), 6).alias("value"),
        )
        .collect()[0]
    )
    direct = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .agg(
            F.count("*").alias("users"),
            F.sum("n").alias("events"),
            F.round(F.sum("t"), 6).alias("value"),
        )
        .collect()[0]
    )
    assert (gold.users, gold.events, gold.value) == (
        direct.users,
        direct.events,
        direct.value,
    )
