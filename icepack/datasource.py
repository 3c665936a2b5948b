"""Spark Python Data Source for icepack tables — streaming-first.

Registers the ``icepack`` format with Spark 4's public Python Data
Source API (pyspark.sql.datasource), giving the table layer a REAL
Structured Streaming source:

    spark.dataSource.register(IcepackDataSource)
    stream = (spark.readStream.format("icepack")
                   .option("location", "/warehouse/db/events")
                   .load())

Incremental-read semantics (SURVEY §2.11 ST6; the Iceberg Spark
source's documented behavior for streaming reads):

- An OFFSET is the table's last observed ``sequence_number``.  Each
  micro-batch covers the files whose sequence number lies in
  ``(start, end]`` and that are still live at the END snapshot — i.e.
  the rows appended by the commits in that range.
- Only ``append`` commits may enter a batch.  A replace/delete commit
  in the range raises (re-emitting compacted rewrites would duplicate
  rows, and deletes cannot be represented in an append-only stream)
  unless ``skip-overwrite-snapshots = true``, which emits only the
  append-derived files in the range — matching the Iceberg source's
  ``streaming-skip-overwrite-snapshots`` escape hatch.
- Offsets live in the stream checkpoint, so restarts resume exactly
  where the last committed batch ended (exactly-once delivery into
  idempotent sinks; pinned in tests/test_datasource.py).
- ``starting-sequence-number`` starts the stream mid-history (default
  0 = from the beginning of retained history).

Executor-side reads are pyarrow over single data files (one
InputPartition per file — Spark schedules them like any other source
partitions), reconciled to the CURRENT schema by field ID so streams
keep working across column renames.  Batch reads (``spark.read``) are
served too, but ``table.toDF()`` remains the batch path of choice —
it adds manifest pruning and MOR delete application; the batch reader
here refuses tables with live delete files rather than silently
returning undeleted rows.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "icepack"


@dataclass
class _FilePart(InputPartition):
    path: str
    #: [(source_column_in_file_or_None, current_name, current_ddl_type)]
    columns: list


def _column_plan(table, schema_id: int) -> list:
    """Field-ID reconciliation plan from a file's schema version to the
    table's current schema (same mapping table._read_files applies)."""
    current = table.meta.schema
    old = table.meta.schema_by_id(schema_id)
    from pyspark.sql.pandas.types import to_arrow_type

    plan = []
    for cf in current.fields:
        of = old.field_by_id(cf.id)
        # arrow types resolved DRIVER-side (needs the session) and
        # shipped inside the pickled partition — executors have no
        # SparkSession to parse DDL strings with
        plan.append(
            (of.name if of is not None else None, cf.name, to_arrow_type(cf.spark_type()))
        )
    return plan


def _read_file(part: _FilePart):
    """Executor-side: one parquet file → arrow batches shaped to the
    current schema — rename by field ID, null-fill post-write added
    columns, and cast widened columns (int→long etc.) to the current
    arrow type so every batch matches the source's declared schema."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    targets = part.columns
    f = pq.ParquetFile(part.path)
    for batch in f.iter_batches():
        arrays, names = [], []
        n = batch.num_rows
        for src, cur, at in targets:
            if src is not None and src in batch.schema.names:
                arr = batch.column(batch.schema.names.index(src))
                if arr.type != at:
                    arr = pc.cast(arr, at)
            else:
                arr = pa.nulls(n, type=at)
            arrays.append(arr)
            names.append(cur)
        yield pa.RecordBatch.from_arrays(arrays, names=names)


class _StreamReader(DataSourceStreamReader):
    def __init__(self, spark_absent, location: str, options: dict):
        # NOTE: runs on the DRIVER; opens its own handle per call so a
        # long-lived stream always sees the latest committed snapshot
        self._location = location
        self._skip_overwrites = (
            str(options.get("skip-overwrite-snapshots", "false")).lower() == "true"
        )
        self._start_seq = int(options.get("starting-sequence-number", 0))

    def _table(self):
        from pyspark.sql import SparkSession

        from .table import IceTable

        spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
        return IceTable.load(spark, self._location)

    def initialOffset(self) -> dict:
        return {"seq": self._start_seq}

    def latestOffset(self) -> dict:
        t = self._table()
        return {"seq": t.meta.last_sequence_number}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["seq"], end["seq"]
        if hi <= lo:
            return []
        t = self._table()
        bad = [
            s
            for s in t.meta.snapshots
            if lo < s.sequence_number <= hi and s.operation != "append"
        ]
        if bad and not self._skip_overwrites:
            ops = sorted({s.operation for s in bad})
            raise ValueError(
                f"stream range ({lo},{hi}] contains non-append commits "
                f"{ops}; an append-only stream cannot represent them — "
                "set skip-overwrite-snapshots=true to read past "
                "compactions/rewrites (appends only), or consume CDC "
                "via table.diff()"
            )
        append_seqs = {
            s.sequence_number
            for s in t.meta.snapshots
            if lo < s.sequence_number <= hi and s.operation == "append"
        }
        out = []
        for f in t.live_files():
            if lo < f.sequence_number <= hi and f.sequence_number in append_seqs:
                out.append(_FilePart(f.path, _column_plan(t, f.schema_id)))
        return out

    def read(self, partition: _FilePart):
        return _read_file(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets persist in the stream checkpoint


class _BatchReader(DataSourceReader):
    def __init__(self, location: str):
        self._location = location

    def partitions(self):
        from pyspark.sql import SparkSession

        from .table import IceTable

        spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
        t = IceTable.load(spark, self._location)
        if any(f.content != "data" for f in t.live_files(content="all")):
            raise ValueError(
                "table has live merge-on-read delete files; the plain "
                "datasource batch reader would resurrect deleted rows — "
                "read through IceTable.toDF() (applies deletes) or "
                "compact first"
            )
        return [_FilePart(f.path, _column_plan(t, f.schema_id)) for f in t.live_files()]

    def read(self, partition: _FilePart):
        return _read_file(partition)


class IcepackDataSource(DataSource):
    """``spark.dataSource.register(IcepackDataSource)`` then
    ``spark.read(.Stream)?.format("icepack").option("location", ...)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _location(self) -> str:
        loc = self.options.get("location") or self.options.get("path")
        if not loc:
            raise ValueError("icepack source needs .option('location', <table dir>)")
        return loc

    def schema(self):
        from pyspark.sql import SparkSession

        from .table import IceTable

        spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
        t = IceTable.load(spark, self._location())
        return t.meta.schema.to_struct()

    def streamReader(self, schema) -> _StreamReader:
        return _StreamReader(None, self._location(), dict(self.options))

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(self._location())


def register(spark) -> None:
    spark.dataSource.register(IcepackDataSource)
