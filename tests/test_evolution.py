"""Schema evolution: stable-ID semantics (docs/06-schema-evolution.md)."""

import pytest
from pyspark.sql import functions as F

from icepack.catalog import Catalog
from icepack.io import load

from tests.conftest import SF_DIR, rows_sorted


def _t(spark, warehouse):
    cat = Catalog(spark, warehouse)
    c = load(spark, SF_DIR, "customer")
    t = cat.create_table("db.c", c.schema)
    t.append(c)
    return t, c


def test_rename_reads_old_files(spark, warehouse):
    t, c = _t(spark, warehouse)
    t.rename_column("c_name", "customer_name")
    df = t.toDF()
    assert "customer_name" in df.columns and "c_name" not in df.columns
    assert rows_sorted(df.select("customer_name")) == rows_sorted(c.select("c_name"))


def test_add_column_old_files_null(spark, warehouse):
    t, c = _t(spark, warehouse)
    t.add_column("tier", "string", after="c_name")
    df = t.toDF()
    assert df.columns.index("tier") == df.columns.index("c_name") + 1
    assert df.filter(F.col("tier").isNotNull()).count() == 0
    # new writes carry the column; old files still read NULL
    t.append(df.withColumn("tier", F.lit("gold")))
    assert t.toDF().filter("tier = 'gold'").count() == c.count()
    assert t.toDF().filter("tier IS NULL").count() == c.count()


def test_drop_then_readd_does_not_resurrect(spark, warehouse):
    """The crown-jewel ID rule (docs/06:55-73): a re-added column gets
    a FRESH id, so old data under the same NAME must not reappear."""
    t, c = _t(spark, warehouse)
    t.drop_column("c_mktsegment")
    assert "c_mktsegment" not in t.toDF().columns
    t.add_column("c_mktsegment", "string")
    df = t.toDF()
    assert "c_mktsegment" in df.columns
    assert df.filter(F.col("c_mktsegment").isNotNull()).count() == 0


def test_widen_int_to_long(spark, warehouse):
    t, c = _t(spark, warehouse)
    t.widen_column("c_nationkey", "bigint")
    df = t.toDF()
    assert dict(df.dtypes)["c_nationkey"] == "bigint"
    assert rows_sorted(df.select(F.col("c_nationkey").cast("int"))) == rows_sorted(
        c.select("c_nationkey")
    )


def test_illegal_narrowing_rejected(spark, warehouse):
    t, _ = _t(spark, warehouse)
    with pytest.raises(ValueError):
        t.widen_column("c_custkey", "int")  # narrowing prohibited (docs/06:146-152)


def test_mixed_schema_files_union(spark, warehouse):
    """Files written under v1 and v3 schemas are read consistently."""
    t, c = _t(spark, warehouse)
    t.rename_column("c_acctbal", "balance")
    t.add_column("flag", "int")
    t.append(t.toDF().withColumn("flag", F.lit(1)))
    df = t.toDF()
    assert df.count() == 2 * c.count()
    total = df.agg(F.round(F.sum("balance"), 2)).first()[0]
    want = round(2 * c.agg(F.sum("c_acctbal")).first()[0], 2)
    assert abs(total - want) < 0.05
