"""Partition-spec evolution (T4), bucket-transform pruning, and
pruning/DML interplay with schema evolution."""

from pyspark.sql import functions as F

from icepack.catalog import Catalog
from icepack.expr import col
from icepack.io import load

from tests.conftest import SF_DIR, rows_sorted


def test_partition_evolution_mixed_specs(spark, warehouse):
    """Files written under the old and new spec coexist; each is pruned
    under its own spec and results stay exact
    (docs/07-partitioning.md:117-129)."""
    cat = Catalog(spark, warehouse)
    ev = load(spark, SF_DIR, "events")
    half1 = ev.filter("event_id % 2 = 0")
    half2 = ev.filter("event_id % 2 = 1")
    t = cat.create_table("db.ev", ev.schema, partition_by=[("ts", "day")])
    t.append(half1)
    t.update_spec([("event_type", "identity")])
    t.append(half2)
    assert {s.spec_id for s in (t.meta.spec_by_id(f.spec_id) for f in t.live_files())} == {0, 1}
    # time-range predicate: prunes day-partitioned files, keeps all
    # identity-partitioned files (no ts in their spec) — still correct
    pred = (col("ts") >= "2024-01-03") & (col("ts") < "2024-01-05")
    want = ev.filter((F.col("ts") >= "2024-01-03") & (F.col("ts") < "2024-01-05"))
    assert rows_sorted(t.toDF(pred)) == rows_sorted(want)
    # event_type predicate: prunes new-spec files, keeps old-spec ones
    pred2 = col("event_type") == "click"
    want2 = ev.filter("event_type = 'click'")
    assert rows_sorted(t.toDF(pred2)) == rows_sorted(want2)
    _, rep = t.plan_files(pred2)
    assert rep["files_scanned"] < rep["files_total"]


def test_bucket_transform_pruning(spark, warehouse):
    """bucket(4, o_custkey) partitioning: an equality predicate prunes
    to a single bucket (the driver-side bucket value is computed with
    the same xxhash64 the write used)."""
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o", orders.schema, partition_by=[("o_custkey", "bucket[4]")])
    t.append(orders)
    assert len(t.live_files()) >= 4
    some_key = orders.select("o_custkey").first()[0]
    pred = col("o_custkey") == some_key
    files, rep = t.plan_files(pred)
    assert rep["files_scanned"] < rep["files_total"]
    buckets = {f.partition["o_custkey_bucket"] for f in files}
    assert len(buckets) == 1
    assert rows_sorted(t.toDF(pred)) == rows_sorted(
        orders.filter(F.col("o_custkey") == some_key)
    )


def test_delete_on_renamed_column(spark, warehouse):
    """DML through a renamed column: stats in old files are keyed by
    the old physical name → no pruning (safe), but results are exact."""
    cat = Catalog(spark, warehouse)
    c = load(spark, SF_DIR, "customer")
    t = cat.create_table("db.c", c.schema)
    t.append(c)
    t.rename_column("c_acctbal", "balance")
    t.delete(col("balance") < 0)
    want = c.filter("c_acctbal >= 0").withColumnRenamed("c_acctbal", "balance")
    assert rows_sorted(t.toDF().select(*sorted(t.toDF().columns))) == rows_sorted(
        want.select(*sorted(want.columns))
    )


def test_compact_uses_sort_order_property(spark, warehouse):
    """write.sort-order property drives auto-clustering at compaction."""
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table(
        "db.o", orders.schema, properties={"write.sort-order": "o_orderkey"}
    )
    t.append(orders.repartition(8))
    t.compact(target_file_size=8 * 1024)
    _, rep = t.plan_files(col("o_orderkey") < 100)
    assert rep["files_total"] > 1
    assert rep["files_scanned"] < rep["files_total"]


def test_mmh3bucket_partition_prunes_and_matches(spark, tmp_path):
    """The spec-hash bucket transform participates in hidden-partition
    pruning like the native bucket: an equality predicate projects to
    one bucket (driver murmur3 == executor murmur3 — the write/plan
    split must agree or pruning silently returns nothing), and results
    equal an unpartitioned scan."""
    from pyspark.sql import functions as F

    from icepack.expr import col
    from icepack.murmur3 import bucket as pyb
    from icepack.table import IceTable

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(64)], "id bigint, s string"
    )
    t = IceTable.create(
        spark, str(tmp_path / "mb"), df.schema, partition_by=[("id", "mmh3bucket[8]")]
    )
    t.append(df)
    hit, report = t.plan_files(col("id") == 7)
    assert report["files_scanned"] < report["files_total"]
    # the pruned scan still finds the row (write-side bucket == plan-side)
    got = t.toDF(col("id") == 7).collect()
    assert [r.s for r in got] == ["v7"]
    # every file's partition value equals the python spec bucket of its rows
    for f in t.live_files():
        b = f.partition["id_mmh3bucket"]
        ids = [r.id for r in spark.read.parquet(f.path).collect()]
        assert all(pyb(i, 8) == b for i in ids), (f.partition, ids)
