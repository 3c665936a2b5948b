"""Fixture-table loaders.

All driver fixtures are plain parquet (`TESTDATA.md`).  The only
normalization is ``events.ts``: stored as parquet TIMESTAMP(NANOS),
which Spark reads (under ``nanosAsLong``) as a long of ns-since-epoch.
We convert with integer division (``div``) — float division of ~1.7e18
ns loses precision past double's 53-bit mantissa — and surface it as
TIMESTAMP_NTZ to match both the other fixtures (e.g. ``o_orderdate``)
and the DuckDB oracle's naive timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .session import ensure_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: ((path, mtime_ns, size) -> inferred StructType) METADATA memo.
#: Guide §1.2/§6: the fixtures are immutable parquet, yet every
#: ``spark.read.parquet`` re-runs footer schema inference on the
#: driver — measured 78 ms per warm call vs 11 ms with an explicit
#: schema.  A real warehouse never pays this per query either (the
#: catalog serves the schema); caching the SCHEMA only (never rows,
#: never results) mirrors that.  Fresh processes re-infer once per
#: path.  The key carries the file's (mtime_ns, size) identity (r13
#: verdict item 1): a fixture-shaped path REWRITTEN in-process (test
#: harnesses) re-infers instead of serving a stale schema — one
#: ``os.stat`` is ~1000× cheaper than footer inference.
_SCHEMA_MEMO: dict[tuple[str, int, int], StructType] = {}


def _memo_key(path: str) -> tuple[str, int, int] | None:
    import os

    try:
        st = os.stat(path)
    except OSError:
        return None  # directory-style/remote layouts: no memo, just read
    return (path, st.st_mtime_ns, st.st_size)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing event timestamps."""
    ensure_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    key = _memo_key(path)
    schema = _SCHEMA_MEMO.get(key) if key else None
    if schema is None:
        df = spark.read.parquet(path)
        if key:
            _SCHEMA_MEMO[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view for the SQL API."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
