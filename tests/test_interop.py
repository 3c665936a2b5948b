"""Multi-engine compatibility (docs/11-multi-engine-compatibility.md):
the table's data is plain immutable parquet tracked by metadata, so any
engine that can read parquet + the file list sees the same rows Spark
does — consistency across engines is checked with set-equality queries
(docs/11:22-25)."""

import duckdb
from pyspark.sql import functions as F

from icepack.catalog import Catalog
from icepack.expr import col
from icepack.io import load

from tests.conftest import SF_DIR


def _duck_rows(paths, order_cols):
    con = duckdb.connect()
    quoted = ",".join(f"'{p}'" for p in paths)
    q = f"SELECT * FROM read_parquet([{quoted}]) ORDER BY {order_cols}"
    try:
        return con.sql(q).fetchall()
    finally:
        con.close()


def _spark_rows(df, order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols.split(", ")).collect()]


def test_duckdb_reads_current_snapshot(spark, warehouse):
    """An external engine pointed at live_files() sees exactly the
    table — including after a COW delete rewrote files."""
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o", orders.schema)
    t.append(orders.repartition(3))
    t.delete(col("o_orderstatus") == "F")  # COW rewrite
    paths = [f.path for f in t.live_files()]
    assert _duck_rows(paths, "o_orderkey") == _spark_rows(t.toDF(), "o_orderkey")


def test_duckdb_reads_time_travel_snapshot(spark, warehouse):
    """File lists of HISTORICAL snapshots are equally consumable —
    time travel is an external-engine capability, not a Spark one."""
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o2", orders.schema)
    s1 = t.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    old = t.as_of(snapshot_id=s1.snapshot_id)
    paths = [f.path for f in t.live_files(old)]
    assert _duck_rows(paths, "o_orderkey") == _spark_rows(
        t.toDF(snapshot=old), "o_orderkey"
    )
