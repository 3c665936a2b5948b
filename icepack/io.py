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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing event timestamps."""
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
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
