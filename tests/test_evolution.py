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


def test_time_primitive_longtype_micros_roundtrip(spark, tmp_path):
    """Iceberg `time` primitive (docs/06-schema-evolution.md:94-110):
    Spark's parquet writer has no usable TIME type, so the schema layer
    maps `time` -> LongType micros-since-midnight while the table
    metadata keeps the `time` annotation verbatim.  Pin the full loop:
    create with a time column, append, read back exact micros, metadata
    string survives reload, min/max pruning works on the column, and
    the written parquet stays engine-neutral (DuckDB reads int64)."""
    import duckdb

    from icepack.expr import col
    from icepack.metadata import IceSchema, NestedField, type_from_str
    from icepack.table import IceTable
    from pyspark.sql import types as T

    assert type_from_str("time") == T.LongType()
    schema = IceSchema(
        0,
        [
            NestedField(1, "id", "bigint", True),
            NestedField(2, "wake", "time", False),
        ],
    )
    t = IceTable.create(spark, str(tmp_path / "t"), schema)
    # metadata keeps the logical annotation, runtime struct is long
    assert t.meta.schema.field_by_name("wake").type == "time"
    assert t.meta.schema.to_struct()["wake"].dataType == T.LongType()
    us = lambda h, m, s: (h * 3600 + m * 60 + s) * 1_000_000  # noqa: E731
    rows = [(1, us(6, 30, 0)), (2, us(12, 0, 15)), (3, us(23, 59, 59))]
    t.append(spark.createDataFrame(rows, t.meta.schema.to_struct()))
    assert sorted(tuple(r) for r in t.toDF().collect()) == sorted(rows)
    # annotation survives a cold reload from disk
    t2 = IceTable.load(spark, str(tmp_path / "t"))
    assert t2.meta.schema.field_by_name("wake").type == "time"
    # footer stats prune on the shim column like any long
    t2.append(spark.createDataFrame([(4, us(1, 0, 0))], t.meta.schema.to_struct()))
    files, report = t2.plan_files(col("wake") < us(2, 0, 0))
    assert report["files_total"] > 1 and len(files) == 1
    # engine-neutral: DuckDB sees plain int64 micros
    paths = [f.path for f in t2.live_files()]
    got = duckdb.sql(
        f"SELECT wake FROM read_parquet({paths!r}) ORDER BY wake"
    ).fetchall()
    assert [g[0] for g in got] == sorted(r[1] for r in rows + [(4, us(1, 0, 0))])
    # schema evolution can add a time column too
    t2.add_column("alarm", "time")
    assert t2.meta.schema.field_by_name("alarm").type == "time"
    assert t2.toDF().schema["alarm"].dataType == T.LongType()


def test_randomized_evolution_interleavings_match_model(spark, tmp_path):
    """Random append / add / rename / drop / widen sequences against a
    field-id model: every row readable under the CURRENT schema must
    carry each column's value by FIELD ID (renames keep values, drops
    hide them forever, adds null-fill older rows, widens preserve)."""
    import random

    from pyspark.sql import types as T

    from icepack.table import IceTable

    rnd = random.Random(99)
    for trial in range(3):
        cols = [
            {"id": 0, "name": "c0", "t": "int"},
            {"id": 1, "name": "c1", "t": "string"},
        ]
        next_cid = 2
        data: list[dict] = []  # rows keyed by field id
        spark_t = {"int": T.IntegerType(), "long": T.LongType(), "string": T.StringType()}

        def struct():
            return T.StructType(
                [T.StructField(c["name"], spark_t[c["t"]]) for c in cols]
            )

        t = IceTable.create(spark, str(tmp_path / f"e{trial}"), struct())
        seq = 0
        for step in range(9):
            op = rnd.choice(["append", "append", "add", "rename", "drop", "widen"])
            if op == "append":
                new = []
                for _ in range(3):
                    row = {}
                    for c in cols:
                        row[c["id"]] = (
                            f"s{seq}" if c["t"] == "string" else seq
                        )
                        seq += 1
                    new.append(row)
                df = spark.createDataFrame(
                    [tuple(r[c["id"]] for c in cols) for r in new], struct()
                )
                t.append(df)
                data += new
            elif op == "add":
                name = f"n{next_cid}"
                cols.append({"id": next_cid, "name": name, "t": "long"})
                next_cid += 1
                t.add_column(name, "bigint")
            elif op == "rename" and cols:
                c = rnd.choice(cols)
                c["name"] = c["name"] + "r"
                t.rename_column(c["name"][:-1], c["name"])
            elif op == "drop" and len(cols) > 1:
                c = cols.pop(rnd.randrange(len(cols)))
                t.drop_column(c["name"])
            elif op == "widen":
                ints = [c for c in cols if c["t"] == "int"]
                if not ints:
                    continue
                c = rnd.choice(ints)
                c["t"] = "long"
                t.widen_column(c["name"], "bigint")
            got = sorted(
                tuple(row[c["name"]] for c in cols)
                for row in (r.asDict() for r in t.toDF().collect())
            )
            want = sorted(tuple(r.get(c["id"]) for c in cols) for r in data)
            assert got == want, f"trial {trial} step {step} op {op}"


def test_time_travel_presents_current_schema_after_evolution(spark, tmp_path):
    """AT(snapshot) after rename/add/drop: historical rows present
    under the CURRENT schema (Snowflake-style time travel), values
    carried by field id — renames keep values, later-added-then-dropped
    columns never appear, and the pinned row set is exactly the
    snapshot's."""
    from pyspark.sql import Row

    from icepack.table import IceTable

    df = spark.createDataFrame([Row(id=1, v=1.0), Row(id=2, v=2.0)])
    t = IceTable.create(spark, str(tmp_path / "tt"), df.schema)
    s1 = t.append(df)
    t.rename_column("v", "w")
    t.add_column("z", "string")
    t.append(spark.createDataFrame([Row(id=3, w=3.0, z="x")]))
    t.drop_column("z")
    out = t.toDF(snapshot=t.as_of(snapshot_id=s1.snapshot_id))
    assert out.columns == ["id", "w"]
    assert sorted((r.id, r.w) for r in out.collect()) == [(1, 1.0), (2, 2.0)]
