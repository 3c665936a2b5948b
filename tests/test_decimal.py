"""Decimal columns through the table layer: spec-arithmetic
truncate[W] partitioning (Iceberg spec "Partition Transforms" —
unscaled v - (v mod W)), footer-stats harvesting for Spark's
INT32/INT64-backed decimal layout, and 1:1 spec export/import of the
decimal truncate transform (docs/07-partitioning.md:42-52,
docs/11-multi-engine-compatibility.md:31-42).

Before r10, decimal data columns CRASHED the append path (pyarrow
raises ArrowNotImplementedError on INT32-backed decimal stats, and
decimal.Decimal isn't JSON-serializable in manifests) and decimal
truncate partitions lived on a string-prefix lane exported as void.
"""

import decimal
import json

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from icepack import transforms as tr
from icepack.expr import col as icol
from icepack.table import IceTable

D = decimal.Decimal


# ------------------------------------------------------------ transform lanes


def test_decimal_truncate_literal_lane():
    from pyspark.sql import types as T

    t = tr.parse("truncate[50]")
    dt = T.DecimalType(9, 2)
    # spec example: truncate(50, d) of 10.65 (unscaled 1065) = 10.50 → 1050
    assert t.apply(D("10.65"), None, dt) == 1050
    assert t.apply(D("10.50"), None, dt) == 1050
    assert t.apply(D("-0.05"), None, dt) == -50  # floor, not toward zero
    assert t.apply(10.65, None, dt) == 1050  # float literal, exact spelling
    # literal finer than the column scale: no value can match — no pruning
    assert t.apply(D("10.505"), None, dt) is None
    # precision > 18 (r11): the SAME unscaled arithmetic, big-int exact
    wide = T.DecimalType(22, 2)
    assert t.apply(D("10.65"), None, wide) == 1050
    assert (
        t.apply(D("12345678901234567890.10"), None, T.DecimalType(25, 2))
        == 1234567890123456789010 - (1234567890123456789010 % 50)
    )


def test_decimal_truncate_py_value_and_batch_parity():
    t = tr.parse("truncate[2500]")
    vals = [D("0.25"), D("31.75"), D("-12.50"), None, D("99.99")]
    arr = pa.array(vals, pa.decimal128(9, 2))
    batch = t.batch_values(arr, "decimal(9,2)")
    single = [None if v is None else t.py_value(v, "decimal(9,2)") for v in vals]
    assert batch == single
    assert batch[0] == 0 and batch[1] == 2500 and batch[2] == -2500
    assert batch[3] is None and batch[4] == 7500


def test_decimal_truncate_spark_column_matches_py_value(spark):
    t = tr.parse("truncate[2500]")
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(D("0.25"),), (D("31.75"),), (D("-12.50"),), (D("99.99"),)],
        T.StructType([T.StructField("p", T.DecimalType(9, 2))]),
    )
    got = [
        r[0]
        for r in df.select(t.spark_column("p", T.DecimalType(9, 2))).collect()
    ]
    want = [t.py_value(v, "decimal(9,2)") for v in [D("0.25"), D("31.75"), D("-12.50"), D("99.99")]]
    assert got == want


# ------------------------------------------------------------- stats harvest


def test_decimal_stats_harvest_int32_backed(spark, tmp_path):
    """Spark writes decimal(9,2) as INT32 physical; pyarrow refuses the
    logical stat decode — harvest falls back to min_raw/max_raw (the
    unscaled ints) + the footer's decimal logical type."""
    d = str(tmp_path / "w")
    spark.range(100).select(
        (F.col("id") * F.lit(1.05)).cast("decimal(9,2)").alias("price")
    ).coalesce(1).write.parquet(d)
    import glob

    from icepack.manifest import harvest_stats

    p = glob.glob(d + "/*.parquet")[0]
    _, _, stats = harvest_stats(p)
    st = stats["price"]
    # exact endpoints 0.00 and 103.95; float widening may push one ULP out
    assert st["min"] is not None and st["min"] <= 0.0
    assert st["max"] is not None and st["max"] >= 103.95 - 1e-9
    assert st["max"] < 103.96


def test_decimal_stats_widening_direction():
    """Decimal bounds that don't convert to float exactly must widen
    OUTWARD (min down, max up) — a narrowed range would prune files
    whose true decimal bound still matches a predicate."""
    from icepack.manifest import _enc

    v = D("25.20")  # float(25.2) < 25.20 exactly? binary rounds below
    lo = _enc(v, widen=-1)
    hi = _enc(v, widen=1)
    assert D(lo) <= v <= D(hi)
    exact = D("0.25")  # 0.25 is a binary-exact float
    assert _enc(exact, widen=-1) == 0.25 == _enc(exact, widen=1)


def test_decimal_append_and_stats_pruning(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * F.lit(1.05)).cast("decimal(9,2)").alias("price")
    )
    t = IceTable.create(spark, str(tmp_path / "t"), df.schema)
    t.append(df)
    assert t.toDF().count() == 100
    _, rep = t.plan_files(icol("price") > 200.0)
    assert rep["files_scanned"] == 0  # max is 103.95: all files pruned
    got = t.toDF().filter("price > 90").count()
    assert got == 14


# --------------------------------------------------- truncate partitioning


def test_decimal_truncate_partition_prune(spark, tmp_path):
    df = spark.range(400).select(
        F.col("id"), (F.col("id") * F.lit(0.25)).cast("decimal(9,2)").alias("price")
    )
    t = IceTable.create(
        spark,
        str(tmp_path / "t"),
        df.schema,
        partition_by=[("price", "truncate[2500]")],
    )
    t.append(df)
    vals = {f.partition["price_truncate"] for f in t.live_files()}
    assert vals == {0, 2500, 5000, 7500}  # unscaled longs: 25.00-wide bins
    hit, rep = t.plan_files(icol("price") == D("10.25"))
    assert rep["files_scanned"] == 1 and rep["files_total"] == 4
    assert {f.partition["price_truncate"] for f in hit} == {0}
    _, rep = t.plan_files(icol("price") > 80.0)
    assert rep["files_scanned"] == 1
    assert t.toDF().filter("price = 10.25").count() == 1
    assert t.toDF().filter("price > 80").count() == 79


def test_decimal_truncate_dsv2_write_parity(spark, tmp_path):
    """The task-level DSv2 writer computes partition tuples in plain
    Python workers (py_value/batch_values) — its manifests must be
    indistinguishable from the driver append path's."""
    from pyspark.sql import types as T

    from icepack.datasource import register

    register(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("price", T.DecimalType(9, 2)),
        ]
    )
    rows = [(i, D(i) * D("0.25")) for i in range(100)]
    df = spark.createDataFrame(rows, schema)
    loc = str(tmp_path / "t")
    t = IceTable.create(
        spark, loc, schema, partition_by=[("price", "truncate[2500]")]
    )
    df.write.format("icepack").option("location", loc).mode("append").save()
    t.refresh()
    assert {f.partition["price_truncate"] for f in t.live_files()} == {0}
    assert t.toDF().count() == 100


# ------------------------------------------------------------ spec export


def test_decimal_truncate_exports_one_to_one(spark, tmp_path):
    from icepack.avroenc import read_container
    from icepack.iceberg_export import export_iceberg
    from icepack.iceberg_import import (
        _prune_files,
        _snapshot_entries,
        load_iceberg_metadata,
        read_iceberg,
    )

    df = spark.range(400).select(
        F.col("id"), (F.col("id") * F.lit(0.25)).cast("decimal(9,2)").alias("price")
    )
    t = IceTable.create(
        spark,
        str(tmp_path / "t"),
        df.schema,
        partition_by=[("price", "truncate[2500]")],
    )
    t.append(df)
    mpath = export_iceberg(t)
    md = json.load(open(mpath))
    spec0 = md["partition-specs"][0]["fields"][0]
    assert spec0["transform"] == "truncate[2500]"  # NOT void
    _, mlist = read_container(
        open(md["snapshots"][-1]["manifest-list"], "rb").read()
    )
    _, entries = read_container(open(mlist[0]["manifest_path"], "rb").read())
    vals = {
        int.from_bytes(e["data_file"]["partition"][spec0["name"]], "big", signed=True)
        for e in entries
    }
    assert vals == {0, 2500, 5000, 7500}  # avro decimal bytes = unscaled int
    # import-side partition pruning from the exported metadata
    imd = load_iceberg_metadata(mpath)
    data, _ = _snapshot_entries(imd)
    pruned = _prune_files(imd, data, icol("price") == D("10.25"))
    assert len(pruned) == 1 and len(data) == 4
    got = read_iceberg(spark, mpath, where=icol("price") == D("10.25"))
    assert [str(r.price) for r in got.collect()] == ["10.25"]
    assert read_iceberg(spark, mpath).count() == 400


def test_wide_decimal_truncate_exports_one_to_one():
    """r11 (VERDICT r10 item 6): EVERY decimal precision exports the
    truncate transform 1:1 — the p>18 prefix/void lane is retired."""
    from icepack.iceberg_export import _export_transform

    assert _export_transform("truncate[10]", "decimal(22,2)") == "truncate[10]"
    assert _export_transform("truncate[10]", "decimal(38,10)") == "truncate[10]"
    assert _export_transform("truncate[10]", "decimal(9,2)") == "truncate[10]"


def test_wide_decimal_truncate_spark_matches_py_value(spark):
    """The wide lane (18 < p <= 38): Spark's decimal mod-subtract +
    digit-strip must produce the same arbitrary-precision unscaled
    ints as the Python spec arithmetic, negatives and sub-unit values
    included."""
    from pyspark.sql import types as T

    t = tr.parse("truncate[100000000000000000]")  # W = 1e17, > int32
    vals = [
        D("12345678901234567890.1234"),
        D("-12345678901234567890.1234"),
        D("0.0003"),
        D("-0.0003"),
        D("99999999999999999999.9999"),
        None,
    ]
    df = spark.createDataFrame(
        [(v,) for v in vals],
        T.StructType([T.StructField("p", T.DecimalType(25, 4))]),
    )
    got = [
        None if r[0] is None else int(r[0])
        for r in df.select(t.spark_column("p", T.DecimalType(25, 4))).collect()
    ]
    want = [t.py_value(v, "decimal(25,4)") for v in vals]
    assert got == want
    assert any(v is not None and abs(v) > 2**63 for v in want)


def test_wide_decimal_truncate_round_trip_both_ways(spark, tmp_path):
    """decimal(25,4) truncate: native write -> prune (driver AND
    distributed planner) -> v2 export carries the transform -> the
    independent spec reader prunes the SAME files back; and a
    spec-primary tree carries the same transform natively (Avro
    decimal bytes of the big unscaled int)."""
    import os

    from icepack.iceberg_export import export_iceberg
    from icepack.iceberg_import import read_iceberg

    W = 100_000_000_000_000_000
    df = spark.range(1000).selectExpr(
        "CAST(CAST(id AS DECIMAL(25,4)) * 1234567890123.4567 + 0.0003"
        " AS DECIMAL(25,4)) AS amt"
    )
    t = IceTable.create(
        spark, str(tmp_path / "n"), df.schema,
        partition_by=[("amt", f"truncate[{W}]")],
    )
    t.append(df)
    pvals = {f.partition["amt_truncate"] for f in t.live_files()}
    assert any(isinstance(v, int) and v > 2**63 for v in pvals)
    probe = D("1234567890123.4570")  # id = 1
    hit, rep = t.plan_files(icol("amt") == probe)
    assert rep["files_scanned"] <= 2 < rep["files_total"]
    assert t.toDF(icol("amt") == probe).count() == 1
    t.set_properties(**{"read.plan-mode": "distributed"})
    assert t.toDF(icol("amt") == probe).count() == 1
    t.set_properties(**{"read.plan-mode": "auto"})

    mpath = export_iceberg(t)
    md = json.load(open(mpath))
    assert {
        pf["transform"] for sp in md["partition-specs"] for pf in sp["fields"]
    } == {f"truncate[{W}]"}
    ext = read_iceberg(spark, os.path.dirname(mpath), where=(icol("amt") == probe))
    assert [r["amt"] for r in ext.collect()] == [probe]

    # spec-primary carries it natively (was refused-as-void pre-r11)
    sp_loc = str(tmp_path / "sp")
    t2 = IceTable.create(
        spark, sp_loc, df.schema,
        partition_by=[("amt", f"truncate[{W}]")],
        properties={"format.spec-primary": "true"},
    )
    t2.append(df)
    pvals2 = {f.partition["amt_truncate"] for f in t2.live_files()}
    assert pvals2 == pvals  # avro decimal bytes decode to the same ints
    hit2, rep2 = t2.plan_files(icol("amt") == probe)
    assert rep2["files_scanned"] <= 2 < rep2["files_total"]
    assert t2.toDF(icol("amt") == probe).count() == 1
    ext2 = read_iceberg(spark, os.path.join(sp_loc, "metadata"),
                        where=(icol("amt") == probe))
    assert [r["amt"] for r in ext2.collect()] == [probe]


def test_decimal_truncate_spec_primary_tuple_fidelity(spark, tmp_path):
    """Spec-primary (Avro) manifests carry decimal-truncate partition
    values as decimal-logical BYTES; the native decode must return the
    truncated unscaled LONG so tuple pruning works — not the raw bytes
    (which compare incomparably and silently stop pruning)."""
    df = spark.range(200).select(
        F.col("id"), (F.col("id") * F.lit(0.25)).cast("decimal(9,2)").alias("price")
    )
    t = IceTable.create(
        spark,
        str(tmp_path / "sp"),
        df.schema,
        partition_by=[("price", "truncate[2500]")],
        properties={"format.spec-primary": "true"},
    )
    t.append(df)
    vals = {f.partition["price_truncate"] for f in t.live_files()}
    assert vals == {0, 2500}  # ints, decoded from avro decimal bytes
    hit, rep = t.plan_files(icol("price") == D("10.25"))
    assert rep["files_scanned"] == 1 and rep["files_total"] == 2
    assert {f.partition["price_truncate"] for f in hit} == {0}
    assert t.toDF().filter("price = 10.25").count() == 1


def test_identity_decimal_partition_exact_scale_literal(spark, tmp_path):
    """Identity-partitioned DECIMAL: the stored tuple value is the
    directory decode's float (0.1 for "0.10"), and Decimal('0.10') ==
    0.1 is False in Python — before r10 an exact-scale Decimal literal
    pruned every file and silently returned no rows.  The literal now
    projects through the same directory encoding as the stored value."""
    df = spark.createDataFrame(
        [(1, D("0.10")), (2, D("0.30")), (3, D("1.50"))],
        "id long, price decimal(9,2)",
    )
    t = IceTable.create(
        spark, str(tmp_path / "t"), df.schema, partition_by=[("price", "identity")]
    )
    t.append(df)
    for lit, want in [(D("0.10"), 1), (D("1.50"), 1), (0.1, 1), (D("0.20"), 0)]:
        hit, rep = t.plan_files(icol("price") == lit)
        assert t.toDF(icol("price") == lit).count() == want, lit
        if want:
            assert rep["files_scanned"] == 1
    _, rep = t.plan_files(icol("price") >= D("0.30"))
    assert rep["files_scanned"] == 2
    assert t.toDF(icol("price") >= D("0.30")).count() == 2
    # DELETE through the same projection: exactly one row goes
    t.delete(icol("price") == D("0.30"))
    assert sorted(r.id for r in t.toDF().collect()) == [1, 3]


def test_decimal_bucket_dsv2_write_and_prune(spark, tmp_path):
    """bucket(N) on a decimal column: the DSv2 task-level writer's
    pure-Python xxh64 lane (unscaled-long hashing, r10) must land rows
    in the buckets the planner's projection probes — wrong-bucket
    writes would make equality scans silently return nothing."""
    from pyspark.sql import types as T

    from icepack.datasource import register

    register(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("price", T.DecimalType(9, 2)),
        ]
    )
    rows = [(i, D(i) * D("0.25")) for i in range(64)]
    loc = str(tmp_path / "t")
    t = IceTable.create(spark, loc, schema, partition_by=[("price", "bucket[8]")])
    spark.createDataFrame(rows, schema).write.format("icepack").option(
        "location", loc
    ).mode("append").save()
    t.refresh()
    hit, rep = t.plan_files(icol("price") == D("10.25"))
    # task-parallel writes produce several files per bucket; the point
    # is the scan touches exactly ONE bucket's files
    assert {f.partition["price_bucket"] for f in hit} == {
        next(iter({f.partition["price_bucket"] for f in hit}))
    }
    assert rep["files_scanned"] < rep["files_total"]
    assert t.toDF().filter("price = 10.25").count() == 1
    assert t.toDF().count() == 64


def test_wide_decimal_truncate_dsv2_write_parity(spark, tmp_path):
    """r11 pin: the DSv2 batch writer (py_value lane — plain Python
    workers, no JVM) lands wide-decimal truncate rows in EXACTLY the
    partition-tuple domain the Spark append lane produces — one
    spelling drift and the same value would split into two tuples."""
    from icepack.datasource import register

    register(spark)
    wdf = spark.range(1000).selectExpr(
        "CAST(CAST(id AS DECIMAL(25,4)) * 1234567890123.4567 + 0.0003"
        " AS DECIMAL(25,4)) AS amt"
    )
    t = IceTable.create(
        spark, str(tmp_path / "w"), wdf.schema,
        partition_by=[("amt", "truncate[100000000000000000]")],
    )
    wdf.write.format("icepack").option("location", t.location).mode(
        "append"
    ).save()
    t.refresh()
    vals = {f.partition["amt_truncate"] for f in t.live_files()}
    assert any(isinstance(v, int) and v > 2**63 for v in vals)
    t.append(wdf)  # same rows via the Spark lane
    after = {f.partition["amt_truncate"] for f in t.live_files()}
    assert after == vals  # identical tuple domain, no spelling drift
    probe = D("1234567890123.4570")
    assert t.toDF(icol("amt") == probe).count() == 2
    hit, rep = t.plan_files(icol("amt") == probe)
    assert rep["files_scanned"] < rep["files_total"]
