"""Read SPEC-FORMAT Apache Iceberg v2 tables (the reverse of
:mod:`icepack.iceberg_export`): given a ``vN.metadata.json`` (or a
table directory with a ``version-hint.text``), resolve the requested
snapshot through its Avro manifest list/manifests with the generic
:mod:`icepack.avroenc` decoder and return the data as a DataFrame —
so icepack can consume tables written by ANY Iceberg engine
(docs/11-multi-engine-compatibility.md:31-42: interop is
bidirectional; the export covers our→them, this covers them→us).

``import_iceberg_files`` additionally ADOPTS an external table's live
parquet files into an icepack table via ``IceTable.add_files``
(metadata-only commit, footer stats harvested) — the docs/11 migration
path without copying data.

Scope (refusals are loud, never silent):
- v2 DELETE manifests (``content`` ≠ 0 in the manifest list) are
  refused — applying foreign position/equality deletes needs the
  delete-file schemas, and serving unmasked rows would be a silent
  wrong result.
- column resolution is by NAME against the table's current schema
  (plus Spark's own parquet field-id resolution where file schemas
  carry ids); a foreign table whose parquet predates a column rename
  reads that column as null — the same caveat Spark's vanilla parquet
  reader has, documented here rather than hidden.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .avroenc import read_container


def _spark_type(t) -> T.DataType:
    """Iceberg schema-JSON type → Spark DataType (reverse of the
    export's `_iceberg_type`)."""
    if isinstance(t, str):
        prim = {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "date": T.DateType(),
            "time": T.LongType(),  # micros since midnight (io-compatible)
            "timestamp": T.TimestampNTZType(),
            "timestamptz": T.TimestampType(),
            "string": T.StringType(),
            "uuid": T.StringType(),
            "binary": T.BinaryType(),
        }
        if t in prim:
            return prim[t]
        if t.startswith("decimal("):
            p, s = t[len("decimal(") : -1].split(",")
            return T.DecimalType(int(p), int(s))
        if t.startswith("fixed["):
            return T.BinaryType()
        raise ValueError(f"unknown iceberg type {t!r}")
    kind = t["type"]
    if kind == "struct":
        return T.StructType(
            [
                T.StructField(f["name"], _spark_type(f["type"]), not f["required"])
                for f in t["fields"]
            ]
        )
    if kind == "list":
        return T.ArrayType(_spark_type(t["element"]), not t.get("element-required"))
    if kind == "map":
        return T.MapType(
            _spark_type(t["key"]),
            _spark_type(t["value"]),
            not t.get("value-required"),
        )
    raise ValueError(f"unknown iceberg type {t!r}")


def _resolve_metadata(path: str) -> str:
    """Accept a metadata.json path, a metadata dir, or a table dir with
    the HadoopCatalog version-hint convention."""
    if path.endswith(".json"):
        return path
    for base in (path, os.path.join(path, "metadata")):
        hint = os.path.join(base, "version-hint.text")
        if os.path.exists(hint):
            v = open(hint).read().strip()
            return os.path.join(base, f"v{v}.metadata.json")
    raise FileNotFoundError(f"no iceberg metadata at {path}")


def load_iceberg_metadata(path: str) -> dict:
    with open(_resolve_metadata(path)) as fh:
        return json.loads(fh.read())


def iceberg_live_files(md: dict, snapshot_id: int | None = None) -> list[dict]:
    """Live data-file entries of a snapshot: walk manifest list →
    manifests with the generic Avro decoder.  Returns the raw
    ``data_file`` records (path, record_count, partition, ...)."""
    sid = snapshot_id if snapshot_id is not None else md.get("current-snapshot-id")
    if sid in (None, -1):
        return []
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == sid)
    with open(snap["manifest-list"], "rb") as fh:
        _, mlist = read_container(fh.read())
    out = []
    for m in mlist:
        if m.get("content", 0) != 0:
            raise ValueError(
                f"manifest {m['manifest_path']} holds DELETE files; "
                "reading them unapplied would resurrect deleted rows — "
                "compact the source table in its own engine first"
            )
        with open(m["manifest_path"], "rb") as fh:
            _, entries = read_container(fh.read())
        for e in entries:
            if e["status"] == 2:  # deleted
                continue
            out.append(e["data_file"])
    return out


def iceberg_schema(md: dict) -> T.StructType:
    cur = next(
        s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
    )
    return T.StructType(
        [
            T.StructField(f["name"], _spark_type(f["type"]), not f["required"])
            for f in cur["fields"]
        ]
    )


def read_iceberg(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Spec-format Iceberg table → DataFrame at the requested (default
    current) snapshot.  Time travel = any snapshot id present in the
    metadata's snapshots list."""
    md = load_iceberg_metadata(path)
    schema = iceberg_schema(md)
    files = iceberg_live_files(md, snapshot_id)
    if not files:
        return spark.createDataFrame([], schema)
    paths = [f["file_path"] for f in files]
    return spark.read.schema(schema).parquet(*paths)


def import_iceberg_files(spark: SparkSession, table, path: str) -> None:
    """Adopt an external Iceberg table's CURRENT live files into the
    icepack *table* via ``add_files`` (metadata-only commit; footer
    stats harvested so pruning works immediately).  The icepack table
    must be unpartitioned (add_files' contract — no derivable
    partition tuple) and schema-compatible by name."""
    md = load_iceberg_metadata(path)
    files = iceberg_live_files(md)
    table.add_files([f["file_path"] for f in files])
