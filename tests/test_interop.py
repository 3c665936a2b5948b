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


def test_add_files_adopts_duckdb_parquet(spark, warehouse, tmp_path):
    """docs/11 migration path: parquet written by ANOTHER ENGINE
    (DuckDB COPY TO) is adopted via add_files as a metadata-only
    commit — rows readable, footer stats prune, time travel sees the
    adoption as a normal snapshot, and native appends coexist."""
    import os

    import duckdb
    from pyspark.sql import functions as F

    from icepack.expr import col
    from icepack.table import IceTable

    from tests.conftest import SF_DIR

    ext = str(tmp_path / "ext")
    os.makedirs(ext)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT o_orderkey, o_totalprice FROM '{SF_DIR}/orders.parquet'
              WHERE o_orderkey <= 500 ORDER BY o_orderkey)
        TO '{ext}/low.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT o_orderkey, o_totalprice FROM '{SF_DIR}/orders.parquet'
              WHERE o_orderkey > 500 ORDER BY o_orderkey)
        TO '{ext}/high.parquet' (FORMAT PARQUET)
        """
    )
    base = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    t = IceTable.create(spark, warehouse, base.schema)
    s1 = t.add_files([f"{ext}/low.parquet", f"{ext}/high.parquet"])
    got = t.toDF()
    assert got.count() == base.count()
    import pytest as _pt

    assert got.agg(F.sum("o_totalprice")).collect()[0][0] == _pt.approx(
        base.agg(F.sum("o_totalprice")).collect()[0][0], rel=1e-12
    )
    # footer stats from the foreign files drive min/max pruning
    files, report = t.plan_files(col("o_orderkey") <= 100)
    assert len(files) == 1 and files[0].path.endswith("low.parquet")
    assert report["files_total"] == 2
    # native append coexists; time travel isolates the adoption
    t.append(base.withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000))
    assert t.toDF().count() == 2 * base.count()
    assert t.toDF(snapshot=t.as_of(snapshot_id=s1.snapshot_id)).count() == base.count()
    # partitioned tables refuse adoption (no derivable partition tuple)
    t2 = IceTable.create(
        spark,
        str(tmp_path / "wh2"),
        base.schema,
        partition_by=[("o_orderkey", "bucket[4]")],
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t2.add_files([f"{ext}/low.parquet"])

def test_add_files_rejects_dup_and_incompatible(spark, warehouse, tmp_path):
    """Adoption guards: the input list is deduplicated (one commit, no
    double count), a path already live in the table is rejected (a
    second metadata-only adoption would double-count rows), and a file
    whose same-named column carries an incompatible type is rejected at
    adoption time instead of failing or coercing at read time.  Widening
    (file INT -> table BIGINT) stays allowed."""
    import os

    import duckdb
    import pytest

    from icepack.table import IceTable

    from tests.conftest import SF_DIR

    ext = str(tmp_path / "ext")
    os.makedirs(ext)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT o_orderkey, o_totalprice FROM '{SF_DIR}/orders.parquet'
              WHERE o_orderkey <= 500)
        TO '{ext}/a.parquet' (FORMAT PARQUET)
        """
    )
    base = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM '{ext}/a.parquet'"
    ).fetchone()[0]
    t = IceTable.create(spark, warehouse, base.schema)
    # same path twice in ONE call: deduplicated, counted once
    t.add_files([f"{ext}/a.parquet", f"{ext}/a.parquet"])
    assert t.toDF().count() == n
    # re-adopting a live path: refused
    with pytest.raises(ValueError, match="already live"):
        t.add_files([f"{ext}/a.parquet"])
    assert t.toDF().count() == n
    # same column name, incompatible type (VARCHAR vs DOUBLE): refused
    con.execute(
        f"""
        COPY (SELECT o_orderkey, CAST(o_totalprice AS VARCHAR) AS o_totalprice
              FROM '{SF_DIR}/orders.parquet' WHERE o_orderkey > 500)
        TO '{ext}/bad.parquet' (FORMAT PARQUET)
        """
    )
    with pytest.raises(ValueError, match="incompatible"):
        t.add_files([f"{ext}/bad.parquet"])
    # widening file INT -> table BIGINT is a permitted promotion
    con.execute(
        f"""
        COPY (SELECT CAST(o_orderkey AS INTEGER) AS o_orderkey, o_totalprice
              FROM '{SF_DIR}/orders.parquet' WHERE o_orderkey > 500)
        TO '{ext}/narrow.parquet' (FORMAT PARQUET)
        """
    )
    t.add_files([f"{ext}/narrow.parquet"])
    assert t.toDF().count() == base.count()
