"""Structured-Streaming ingestion into icepack tables (SURVEY.md S12,
ST1-ST6; docs/12-lakehouse-patterns.md:211-236).

The reference's streaming surface is ingest-shaped (Kafka/Kinesis →
Iceberg sink with small-file awareness): realized as
``writeStream.foreachBatch`` appending each micro-batch — every batch
is one atomic snapshot commit, so readers see batch-level snapshot
isolation and time travel works across batches.  Kafka itself needs a
connector jar (offline here); the file/rate sources exercise the same
sink path, and the sink is source-agnostic.

Windowed/stateful operators (tumbling/sliding/session windows,
watermark, dropDuplicatesWithinWatermark) are plain Spark expressions
— identical in batch and streaming (the batch twins are the st*
entries in icepack/queries/windows.py, oracle-checked); here they run
under a real streaming query for the pytest invariants.
"""

from __future__ import annotations

import os
import urllib.parse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .table import IceTable


def _local_path(uri: str) -> str | None:
    """file:-scheme (or bare) URI → a stat-able local path; None for
    remote schemes, where the driver can't cheaply size the file."""
    if uri.startswith("file:"):
        return urllib.parse.unquote(urllib.parse.urlparse(uri).path)
    if "://" not in uri:
        return uri
    return None


#: default streaming target file size: top of the 64-128 MB band the
#: docs recommend for streaming commits (docs/02-parquet-data-storage.md:
#: 84-88) — smaller than the 512 MB batch-write default because a
#: streaming table compacts continuously and over-large targets make
#: every commit coalesce to 1 task.
STREAM_TARGET_FILE_BYTES = 128 * 1024 * 1024


def write_stream_to_table(
    stream_df: DataFrame,
    table: IceTable,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    coalesce_to: int | str | None = "auto",
) -> StreamingQuery:
    """Stream → icepack sink via foreachBatch append.

    ``coalesce_to`` bounds files-per-commit (streaming file sizing,
    docs/02-parquet-data-storage.md:84-88: many tiny commits → small
    files; compaction restores health).  The default ``"auto"`` sizes
    each commit's file count from the batch's estimated bytes —
    observed bytes-per-row of the table's live files (footer truth, no
    sampling) × batch rows ÷ the ``write.target-file-size-bytes``
    table property (streaming default 128 MB) — so a small batch
    commits ONE file while a huge backlog batch splits into ~target-
    sized files instead of funneling through one task.  The first
    batch into an empty table has no bytes-per-row evidence and keeps
    its natural partitioning — the 2nd commit onward is sized.  Pass
    an int to pin the file count, or None to keep Spark's layout.
    ``Trigger.AvailableNow`` gives the incremental-batch pattern ST6
    (process everything pending, then stop) — the high-water-mark
    bronze→silver loop without manual bookkeeping.

    Exactly-once: foreachBatch is at-least-once (a crashed trigger
    re-delivers its batch id), so each commit records its
    ``streaming-batch-id`` in the snapshot summary and a re-delivered
    batch id that already committed is skipped — append + batch-id
    check happen under the same table CAS, mirroring the real Iceberg
    Spark sink's idempotence."""
    import math

    def _auto_file_count(batch_df: DataFrame) -> int | None:
        target = int(
            table.meta.properties.get(
                "write.target-file-size-bytes", STREAM_TARGET_FILE_BYTES
            )
        )
        # File-backed batches (the bronze-ingest shape): estimate the
        # commit's bytes from the batch's OWN input file sizes — a
        # driver-side stat per file, zero Spark jobs.  The previous
        # spelling ran batch_df.count(), re-executing every batch's
        # scan once before the write: one extra source pass per commit,
        # forever, on a long-lived stream.
        # only same-format (columnar) inputs predict output bytes 1:1;
        # a json/csv batch re-encodes much smaller and falls through
        inputs = batch_df.inputFiles()
        paths = [
            _local_path(p)
            for p in inputs
            if _local_path(p) and p.endswith((".parquet", ".orc"))
        ]
        if paths and len(paths) == len(inputs):
            try:
                est = sum(os.path.getsize(p) for p in paths)
                return max(1, math.ceil(est / target))
            except OSError:
                pass  # racing source cleanup — fall through to counting
        # non-file sources (rate/kafka/memory): fall back to observed
        # bytes-per-row of the table's live files x a counted batch
        live = table.live_files()
        nbytes = sum(f.file_size_bytes for f in live)
        nrows = sum(f.record_count for f in live)
        if nrows == 0:
            return None  # no evidence yet — first commit learns it
        est = batch_df.count() * (nbytes / nrows)
        return max(1, math.ceil(est / target))

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        table.refresh()
        marker = f"{checkpoint_dir}#{batch_id}"  # checkpoint dir ≡ query identity
        for s in table.meta.snapshots:
            if s.summary.get("streaming-batch-id") == marker:
                return  # this batch already committed — re-delivery
        n = _auto_file_count(batch_df) if coalesce_to == "auto" else coalesce_to
        if n:
            have = batch_df.rdd.getNumPartitions()
            if n < have:
                # shrink: coalesce merges tasks without a shuffle
                batch_df = batch_df.coalesce(n)
            elif n > have:
                # grow: a backlog batch arriving in few partitions would
                # otherwise write files far over target — one round-robin
                # shuffle splits it into ~target-sized files (coalesce
                # cannot raise the partition count)
                batch_df = batch_df.repartition(n)
        table.append(batch_df, extra_summary={"streaming-batch-id": marker})

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_upsert(
    stream_df: DataFrame,
    table: IceTable,
    keys: list[str],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Streaming UPSERT sink: each micro-batch MERGEs into the table on
    ``keys`` (matched → take the batch's values, unmatched → insert) —
    the CDC-apply pattern (docs/12-lakehouse-patterns.md:107-126 run
    continuously).  One snapshot per batch; late re-deliveries of the
    same key overwrite idempotently, so the sink tolerates at-least-
    once sources."""
    from .dml import source_col

    value_cols = None

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal value_cols
        if value_cols is None:
            value_cols = [c for c in batch_df.columns if c not in keys]
        # last-writer-wins within the batch: one row per key
        from pyspark.sql import Window as W

        w = W.partitionBy(*keys).orderBy(*[F.col(c).desc_nulls_last() for c in value_cols])
        deduped = (
            batch_df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
        )
        table.refresh()
        table.merge(
            deduped,
            on=keys,
            when_matched_update={c: source_col(c) for c in value_cols},
        )

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _with_event_time(df: DataFrame) -> DataFrame:
    """Watermarks require TIMESTAMP (not NTZ) event time; under the
    engine's forced-UTC session the cast is value-preserving."""
    if dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_counts(stream_df: DataFrame, window: str = "1 hour", watermark: str = "1 hour") -> DataFrame:
    """ST1+ST4: watermarked tumbling-window aggregation."""
    return (
        _with_event_time(stream_df)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
        )
    )


def dedup_within_watermark(stream_df: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """ST5: stateful stream dedup bounded by the watermark."""
    return (
        _with_event_time(stream_df)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def sessionize_with_state(stream_df: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    sessionization with an explicit (start, last, n) state tuple.

    Unlike the built-in ``session_window`` aggregate (ST3), the state
    transition is user code — the extension point for operators Spark
    lacks (per-entity accumulators, CEP-ish patterns).  A session
    CLOSES when a later event for the same key arrives more than
    ``gap_seconds`` after the previous one; closed sessions are emitted
    (append mode) and the open tail stays in the state store.  Closure
    depends only on event times, never on micro-batch boundaries, so
    output is deterministic under any batch slicing — the pytest
    invariant replays the same events split across files and checks
    the emitted sessions against a batch ``session_window`` twin.

    Scale: state is 3 longs per key, partitioned by the grouping key
    across executors (RocksDB-backed state store on a real cluster);
    per-invocation work is one sort of that key's batch rows."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):  # type: ignore[no-untyped-def]
        import pandas as pd

        ts = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
        secs = (ts.astype("int64") // 1_000_000_000).tolist()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = n = None
        closed: list[tuple[int, int, int]] = []
        for t in secs:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_seconds:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                {
                    "event_type": [key[0]] * len(closed),
                    "session_start": pd.to_datetime([c[0] for c in closed], unit="s"),
                    "session_end": pd.to_datetime([c[1] for c in closed], unit="s"),
                    "n_events": [c[2] for c in closed],
                }
            )

    return (
        _with_event_time(stream_df)
        .groupBy("event_type")
        .applyInPandasWithState(
            fn,
            "event_type string, session_start timestamp, session_end timestamp, n_events long",
            "start long, last long, n long",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "1 hour",
    band_seconds: int = 3600,
) -> DataFrame:
    """ST7: watermarked stream-stream inner join — attribute each
    purchase to a same-user click in the preceding ``band_seconds``.

    Both inputs are watermarked and the join condition carries an
    explicit time band, so Spark can bound the join state on BOTH
    sides (click state expires once no purchase within the band can
    still arrive; purchase state symmetrically) — without the band the
    state store grows forever at 100 TB/day stream rates.  The join
    itself is a state-store hash join keyed on user_id; at scale the
    key space shards across `spark.sql.shuffle.partitions` state
    stores."""
    c = (
        _with_event_time(clicks)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    p = (
        _with_event_time(purchases)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {band_seconds} SECONDS")
        )
    )
    return c.join(p, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "amount",
    )


def record_breakers_v2(stream_df: DataFrame) -> DataFrame:
    """Running high-water-mark detector on the Spark 4 arbitrary-state
    API (``transformWithStateInPandas`` — the successor of
    ``applyInPandasWithState`` with typed, composable state): per-key
    state is ONE double (a typed ValueState).

    GATED: the state-v2 Python driver worker needs ``protobuf`` at
    runtime.  Where it is missing this raises a clear ImportError at
    call time (fail-fast, rather than an opaque crash from Spark's
    runner init mid-stream).  :func:`record_breakers` below is the
    same operator on the v1 ``applyInPandasWithState`` API and is the
    always-tested path; this variant is exercised by a skippable
    pytest (tests/test_streaming.py) whenever protobuf is present, so
    the swap is one call-site rename where it exists."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "record_breakers_v2 requires the 'protobuf' package "
            "(transformWithStateInPandas state-v2 worker protocol); "
            "use record_breakers() — same semantics on the v1 API"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Breakers(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._mx = handle.getValueState("mx", "mx double")

        def handleInputRows(self, key, rows, timerValues):  # type: ignore[no-untyped-def]
            import pandas as pd

            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            mx = self._mx.get()[0] if self._mx.exists() else None
            out = []
            for r in pdf.itertuples(index=False):
                if mx is None or r.value > mx:
                    out.append((r.event_id, r.ts, r.value, mx))
                    mx = r.value
            self._mx.update((mx,))
            if out:
                yield pd.DataFrame(
                    {
                        "event_type": [key[0]] * len(out),
                        "event_id": [o[0] for o in out],
                        "ts": [o[1] for o in out],
                        "value": [o[2] for o in out],
                        "prev_record": [o[3] for o in out],
                    }
                )

        def close(self) -> None:
            pass

    return (
        _with_event_time(stream_df)
        .groupBy("event_type")
        .transformWithStateInPandas(
            _Breakers(),
            "event_type string, event_id long, ts timestamp, value double,"
            " prev_record double",
            "Append",
            "none",  # TimeModes string: no timers used
        )
    )


def record_breakers(stream_df: DataFrame) -> DataFrame:
    """Running high-water-mark detector (working v1-API path): per
    event_type, emit exactly the events whose ``value`` strictly
    exceeds every earlier value for that key, carrying the record they
    broke.  Rows inside a batch are processed in (ts, event_id) order,
    so output is deterministic under any time-ordered batch slicing —
    pytest replays a two-file stream against a batch window twin.

    Scale: state is one double per key in the state store (RocksDB on
    a cluster); each micro-batch does one local sort of its own rows
    per key — no shuffle beyond the groupBy key partitioning every
    stateful operator requires."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):  # type: ignore[no-untyped-def]
        import pandas as pd

        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        mx = state.get[0] if state.exists else None
        out = []
        for r in pdf.itertuples(index=False):
            if mx is None or r.value > mx:
                out.append((r.event_id, r.ts, r.value, mx))
                mx = r.value
        state.update((float(mx),))
        if out:
            yield pd.DataFrame(
                {
                    "event_type": [key[0]] * len(out),
                    "event_id": [o[0] for o in out],
                    "ts": [o[1] for o in out],
                    "value": [o[2] for o in out],
                    "prev_record": [o[3] for o in out],
                }
            )

    return (
        _with_event_time(stream_df)
        .groupBy("event_type")
        .applyInPandasWithState(
            fn,
            "event_type string, event_id long, ts timestamp, value double,"
            " prev_record double",
            "mx double",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
