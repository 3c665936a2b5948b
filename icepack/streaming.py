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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .table import IceTable


def write_stream_to_table(
    stream_df: DataFrame,
    table: IceTable,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    coalesce_to: int | None = None,
) -> StreamingQuery:
    """Stream → icepack sink via foreachBatch append.

    ``coalesce_to`` bounds files-per-commit (streaming file sizing,
    docs/02-parquet-data-storage.md:84-88: many tiny commits → small
    files; compaction restores health).  ``Trigger.AvailableNow`` gives
    the incremental-batch pattern ST6 (process everything pending, then
    stop) — the high-water-mark bronze→silver loop without manual
    bookkeeping."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if coalesce_to:
            batch_df = batch_df.coalesce(coalesce_to)
        table.refresh()
        table.append(batch_df)

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
