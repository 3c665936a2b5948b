"""Icepack table-layer round-trips as driver-checkable queries
(SURVEY.md §2.1, §2.8-2.10).

Each entry creates a scratch icepack table under /tmp from fixture
slices, exercises a table-format capability (append / time travel /
COW & MOR DML / merge / schema evolution / hidden-partition pruning /
compaction+expiry), and returns the resulting table content — which
the DuckDB oracle recomputes directly from the original parquet.  So
the *whole* write→commit→plan→read lifecycle is value-checked, not
just row-counted.  Scratch dirs must outlive the returned (lazy)
DataFrame, so they are not cleaned up eagerly.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..expr import col
from ..io import load
from ..session import local_df
from ..table import IceTable
from . import query

_ORDER_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"


def _scratch() -> str:
    return tempfile.mkdtemp(prefix="icepack-q-")


@query(
    "ice1_create_append_read",
    oracle=f"SELECT {_ORDER_COLS} FROM orders WHERE o_orderkey % 2 = 0",
)
def ice1_create_append_read(spark: SparkSession, sf: str) -> DataFrame:
    """S3+S6+S1: create → append → full scan returns exactly what went in."""
    orders = load(spark, sf, "orders")
    t = IceTable.create(spark, _scratch(), orders.schema)
    t.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    return t.toDF()


@query(
    "ice2_time_travel",
    oracle=f"SELECT {_ORDER_COLS} FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'",
)
def ice2_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    """S8: two appends; AT(first snapshot) reproduces the first slice."""
    orders = load(spark, sf, "orders")
    early = orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    late = orders.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
    t = IceTable.create(spark, _scratch(), orders.schema)
    s1 = t.append(early)
    t.append(late)
    return t.toDF(snapshot=t.as_of(snapshot_id=s1.snapshot_id))


@query(
    "ice3_delete_cow",
    oracle=f"SELECT {_ORDER_COLS} FROM orders WHERE o_orderstatus <> 'F'",
)
def ice3_delete_cow(spark: SparkSession, sf: str) -> DataFrame:
    """D2: copy-on-write DELETE rewrites only hit files."""
    orders = load(spark, sf, "orders")
    t = IceTable.create(spark, _scratch(), orders.schema)
    t.append(orders)
    t.delete(col("o_orderstatus") == "F")
    return t.toDF()


@query(
    "ice4_update",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           ROUND(SUM(CASE WHEN o_orderstatus = 'O'
                          THEN o_totalprice * 1.1 ELSE o_totalprice END), 2) AS sum_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def ice4_update(spark: SparkSession, sf: str) -> DataFrame:
    """D4: UPDATE ... SET price = price*1.1 WHERE status='O'."""
    orders = load(spark, sf, "orders")
    t = IceTable.create(spark, _scratch(), orders.schema)
    t.append(orders)
    t.update(col("o_orderstatus") == "O", {"o_totalprice": F.col("o_totalprice") * 1.1})
    return t.toDF().groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("sum_price")
    )


@query(
    "ice5_merge",
    oracle=f"""
    WITH tgt AS (SELECT {_ORDER_COLS} FROM orders WHERE o_orderkey % 2 = 0),
    src AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, 1.0 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT * FROM src
    UNION ALL
    SELECT * FROM tgt WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
    """,
)
def ice5_merge(spark: SparkSession, sf: str) -> DataFrame:
    """D5: MERGE — matched rows take source values, unmatched source
    rows insert, all in one snapshot."""
    from ..dml import source_col

    orders = load(spark, sf, "orders")
    t = IceTable.create(spark, _scratch(), orders.schema)
    t.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    src = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn("o_totalprice", F.lit(1.0))
    t.merge(
        src,
        on=["o_orderkey"],
        when_matched_update={c: source_col(c) for c in orders.columns if c != "o_orderkey"},
    )
    return t.toDF()


@query(
    "ice6_schema_evolution",
    oracle="""
    SELECT c_custkey, c_name AS customer_name, c_nationkey, c_acctbal,
           c_mktsegment, CAST(NULL AS VARCHAR) AS tier
    FROM customer
    """,
)
def ice6_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """M8: rename + add column; files written before the evolution read
    under the new schema via stable column IDs."""
    c = load(spark, sf, "customer")
    t = IceTable.create(spark, _scratch(), c.schema)
    t.append(c)
    t.rename_column("c_name", "customer_name")
    t.add_column("tier", "string")
    return t.toDF()


@query(
    "ice7_hidden_partition_prune",
    oracle="""
    SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-15'
    """,
)
def ice7_hidden_partition_prune(spark: SparkSession, sf: str) -> DataFrame:
    """T1/T2: day(ts) hidden partitioning — the query filters the
    natural ts column only; the planner prunes day partitions
    (pruning effectiveness is asserted in tests/test_table.py)."""
    ev = load(spark, sf, "events").select("event_id", "event_type", "ts", "value")
    t = IceTable.create(spark, _scratch(), ev.schema, partition_by=[("ts", "day")])
    t.append(ev)
    return t.toDF(
        (col("ts") >= "2024-01-10") & (col("ts") < "2024-01-15")
    )


@query(
    "ice8_metadata_tables",
    oracle="""
    SELECT CAST(2 AS BIGINT) AS n_snapshots, CAST(4 AS BIGINT) AS n_files,
           CAST(2 AS BIGINT) AS n_manifests, CAST(1 AS BIGINT) AS n_current
    """,
)
def ice8_metadata_tables(spark: SparkSession, sf: str) -> DataFrame:
    """S9/S10: snapshots/files/manifests metadata relations; the oracle
    is the structural invariant (2 appends × 2 files, incremental
    manifests, one current snapshot)."""
    orders = load(spark, sf, "orders")
    t = IceTable.create(spark, _scratch(), orders.schema)
    t.append(orders.filter("o_orderkey % 2 = 0").repartition(2))
    t.append(orders.filter("o_orderkey % 2 = 1").repartition(2))
    snaps = t.snapshots().count()
    files = t.files().count()
    mans = t.manifests().count()
    cur = t.history().filter("is_current").count()
    return local_df(spark, 
        [(snaps, files, mans, cur)],
        "n_snapshots long, n_files long, n_manifests long, n_current long",
    )


@query(
    "ice9_compact_expire",
    oracle=f"SELECT {_ORDER_COLS} FROM orders",
)
def ice9_compact_expire(spark: SparkSession, sf: str) -> DataFrame:
    """M1+M3: fragmented appends → compact → expire old snapshots; the
    current content is bit-identical to the input."""
    import time as _time

    orders = load(spark, sf, "orders")
    t = IceTable.create(spark, _scratch(), orders.schema)
    for i in range(4):
        t.append(orders.filter(F.col("o_orderkey") % 4 == i).repartition(3))
    t.compact(target_file_size=128 * 1024 * 1024)
    t.expire_snapshots(older_than_ms=int(_time.time() * 1000) + 60_000, retain_last=1)
    return t.toDF()


@query(
    "ice11_incremental_read",
    oracle="""
    SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
    FROM events WHERE ts >= TIMESTAMP '2024-01-15'
    """,
)
def ice11_incremental_read(spark: SparkSession, sf: str) -> DataFrame:
    """ST6: bronze→silver incremental pipeline via the changelog scan —
    after processing snapshot 1, ``changes(since)`` returns exactly the
    rows appended after it, reading only the new files."""
    ev = load(spark, sf, "events").select("event_id", "event_type", "ts", "value")
    # events span 2024-01-01..30 at every SF; mid-range cut keeps
    # BOTH appends non-empty (an out-of-range cut once made this test
    # pass vacuously with two empty sides)
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    t = IceTable.create(spark, _scratch(), ev.schema)
    s1 = t.append(ev.filter(F.col("ts") < cut))
    t.append(ev.filter(F.col("ts") >= cut))
    return t.changes(since_snapshot_id=s1.snapshot_id)


@query(
    "ice12_sql_over_table",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
    GROUP BY c.c_mktsegment
    """,
)
def ice12_sql_over_table(spark: SparkSession, sf: str) -> DataFrame:
    """S2 (analyzer side): icepack tables registered as views are
    first-class spark.sql citizens — a SQL join across two icepack
    tables resolves through the session catalog and runs on stock
    Catalyst."""
    orders = load(spark, sf, "orders")
    customer = load(spark, sf, "customer")
    to = IceTable.create(spark, _scratch(), orders.schema)
    to.append(orders)
    tc = IceTable.create(spark, _scratch(), customer.schema)
    tc.append(customer)
    to.toDF().createOrReplaceTempView("ice_orders")
    tc.toDF().createOrReplaceTempView("ice_customer")
    return spark.sql(
        """
        SELECT c.c_mktsegment, COUNT(*) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS revenue
        FROM ice_orders o JOIN ice_customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderdate >= TIMESTAMP_NTZ '1998-01-01'
        GROUP BY c.c_mktsegment
        """
    )


@query(
    "ice13_medallion",
    oracle="""
    WITH silver AS (
      SELECT DISTINCT ON (event_id) event_id, event_type,
             CAST(ts AS TIMESTAMP) AS ts,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
      ORDER BY event_id
    )
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k
    FROM silver GROUP BY 1, 2
    """,
)
def ice13_medallion(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's medallion pattern end-to-end
    (docs/12-lakehouse-patterns.md): bronze = raw append (day-
    partitioned icepack table); silver = dedup + VARIANT extraction
    into a second table; gold = daily aggregates.  Every layer is an
    icepack table; the oracle recomputes the gold result straight from
    the raw fixture."""
    from pyspark.sql import Window as W

    ev = load(spark, sf, "events")
    bronze = IceTable.create(spark, _scratch(), ev.schema, partition_by=[("ts", "day")])
    bronze.append(ev)

    w = W.partitionBy("event_id").orderBy("ts", "event_id")
    silver_df = (
        bronze.toDF()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "event_type",
            "ts",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
    )
    silver = IceTable.create(spark, _scratch(), silver_df.schema)
    silver.append(silver_df)

    gold_df = (
        silver.toDF()
        .groupBy(
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), F.sum("k").cast("bigint").alias("sum_k"))
    )
    gold = IceTable.create(spark, _scratch(), gold_df.schema)
    gold.append(gold_df)
    return gold.toDF()


@query(
    "ice10_mor_delete",
    oracle="""
    SELECT event_id, event_type, value FROM events WHERE value <= 100.0
    """,
)
def ice10_mor_delete(spark: SparkSession, sf: str) -> DataFrame:
    """D3: merge-on-read DELETE — the equality-delete file is applied
    at read time (anti-join), no data rewrite."""
    ev = load(spark, sf, "events").select("event_id", "event_type", "value")
    t = IceTable.create(
        spark,
        _scratch(),
        ev.schema,
        properties={"write.delete.mode": "merge-on-read", "identifier-field-names": "event_id"},
    )
    t.append(ev)
    t.delete(col("value") > 100.0)
    return t.toDF()


@query(
    "ice15_mor_position_delete",
    oracle="""
    SELECT event_id, event_type, value FROM events WHERE value <= 100.0
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE value > 250.0
    """,
)
def ice15_mor_position_delete(spark: SparkSession, sf: str) -> DataFrame:
    """D3 (position form, docs/08:167-187): DELETE writes (file_path,
    pos) pairs keyed on the parquet reader's own row ordinal; the scan
    anti-joins them per file.  Rows re-appended AFTER the delete land
    in new files, so — unlike an equality delete — identical key
    values survive: the final state is the kept rows plus the
    re-inserted slice of the deleted ones."""
    ev = load(spark, sf, "events").select("event_id", "event_type", "value")
    t = IceTable.create(
        spark,
        _scratch(),
        ev.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(ev)
    t.delete(col("value") > 100.0)
    t.append(ev.filter(F.col("value") > 250.0))  # same event_ids come back
    return t.toDF()


@query(
    "ice16_mor_update",
    oracle="""
    SELECT event_id, event_type,
           CASE WHEN value > 100.0 THEN 0.0 ELSE value END AS value
    FROM events
    """,
)
def ice16_mor_update(spark: SparkSession, sf: str) -> DataFrame:
    """D4 merge-on-read: UPDATE = position-delete of the matched rows
    + append of their updated copies, one snapshot, unmatched rows
    untouched on disk."""
    ev = load(spark, sf, "events").select("event_id", "event_type", "value")
    t = IceTable.create(
        spark,
        _scratch(),
        ev.schema,
        properties={"write.update.mode": "merge-on-read"},
    )
    t.append(ev)
    t.update(col("value") > 100.0, {"value": F.lit(0.0)})
    return t.toDF()


@query(
    "ice17_zorder_compact",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_quantity FROM lineitem
    WHERE l_partkey < 50 AND l_suppkey < 20
    """,
)
def ice17_zorder_compact(spark: SparkSession, sf: str) -> DataFrame:
    """O5/M6 z-order: compact with multi-column bit-interleaved
    clustering, then scan with a predicate on BOTH cluster columns —
    content must be exactly the source rows (clustering is a layout
    change, never a semantic one), while the layout now prunes on
    either column (asserted via file stats in pytest)."""
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    t = IceTable.create(spark, _scratch(), li.schema)
    t.append(li)
    t.compact(
        target_file_size=4 * 1024 * 1024,
        cluster_by=["l_partkey", "l_suppkey"],
        cluster_strategy="zorder",
    )
    return t.toDF((col("l_partkey") < 50) & (col("l_suppkey") < 20))


@query(
    "ice14_refs_rollback",
    oracle=f"SELECT {_ORDER_COLS} FROM orders WHERE o_orderstatus = 'F'",
)
def ice14_refs_rollback(spark: SparkSession, sf: str) -> DataFrame:
    """Refs (docs/05:141-172): tag the good state, write a branch
    lineage that never touches main, roll main back to the tag.  The
    final read must equal the tagged snapshot exactly — proving tags
    resolve, branch commits isolate, and rollback restores without
    erasing history (asserted via the snapshot count in pytest;
    here the scan itself is the oracle-checked surface)."""
    orders = load(spark, sf, "orders")
    good = orders.filter(F.col("o_orderstatus") == "F")
    bad = orders.filter(F.col("o_orderstatus") != "F")
    t = IceTable.create(spark, _scratch(), orders.schema)
    s1 = t.append(good)
    t.create_tag("validated", s1.snapshot_id)
    t.create_branch("experiment")
    t.append(bad, branch="experiment")  # never reaches main
    t.append(bad)  # the bad main commit
    t.rollback(t.as_of(ref="validated").snapshot_id)
    return t.toDF()


@query(
    "ice18_sorted_write",
    oracle=f"SELECT {_ORDER_COLS} FROM orders",
)
def ice18_sorted_write(spark: SparkSession, sf: str) -> DataFrame:
    """WRITE ORDERED BY (metadata sort order + range-distributed
    append, docs/03:53-75 + docs/09:156-168): declare the order, append
    a deliberately shuffled input, and read back — contents are
    value-identical to the source while the files land as disjoint
    sorted slices of the key space (pruning invariants pinned in
    tests/test_sort_order.py)."""
    orders = load(spark, sf, "orders")
    t = IceTable.create(spark, _scratch(), orders.schema)
    t.replace_sort_order("o_orderdate", "o_orderkey")
    t.set_properties(**{"write.distribution-mode": "range"})
    t.append(orders.repartition(8))
    return t.toDF()


@query(
    "ice19_partition_evolution",
    oracle=f"""
    SELECT {_ORDER_COLS} FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-06-01'
      AND o_orderdate <  TIMESTAMP '1998-06-01'
    """,
)
def ice19_partition_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """T4 partition evolution (docs/07:117-129): the first slice lands
    under month(o_orderdate) partitioning, the spec then evolves to
    (year(o_orderdate), bucket[4](o_custkey)) WITHOUT rewriting old
    files, the second slice lands under the new spec, and one
    predicate scan reads across both layouts — old files pruned under
    the old spec, new under the new (spec-id per manifest)."""
    orders = load(spark, sf, "orders")
    cut = F.lit("1997-06-01").cast("timestamp_ntz")
    t = IceTable.create(
        spark, _scratch(), orders.schema, partition_by=[("o_orderdate", "month")]
    )
    t.append(orders.filter(F.col("o_orderdate") < cut))
    t.update_spec([("o_orderdate", "year"), ("o_custkey", "bucket[4]")])
    t.append(orders.filter(F.col("o_orderdate") >= cut))
    return t.toDF(
        (col("o_orderdate") >= "1997-06-01 00:00:00")
        & (col("o_orderdate") < "1998-06-01 00:00:00")
    )


@query(
    "ice20_wap",
    oracle=f"SELECT {_ORDER_COLS} FROM orders WHERE o_custkey IS NOT NULL",
)
def ice20_wap(spark: SparkSession, sf: str) -> DataFrame:
    """Write-audit-publish over refs (the docs/05:149-172 audit-branch
    diagram made executable): stage the incoming batch on an ``audit``
    branch — main readers never see it — run the audit against the
    branch head, then publish with a metadata-only ``fast_forward`` of
    main.  A failed audit would just ``drop_ref`` the branch: no data
    file is ever deleted or rewritten either way, and the publish is
    one atomic CAS, so downstream consumers flip from none-of-it to
    all-of-it with nothing in between."""
    orders = load(spark, sf, "orders")
    seed = orders.filter(F.col("o_orderstatus") == "F")
    incoming = orders.filter(F.col("o_orderstatus") != "F")
    t = IceTable.create(spark, _scratch(), orders.schema)
    t.append(seed)
    t.create_branch("audit")
    t.append(incoming, branch="audit")
    staged = t.toDF(snapshot=t.as_of(ref="audit"))
    # the audit: no NULL join keys may be published (limit(1) → the
    # check short-circuits; only a 0/1 count crosses to the driver)
    if staged.filter(F.col("o_custkey").isNull()).limit(1).count() > 0:
        t.drop_ref("audit")
        raise ValueError("audit failed: NULL o_custkey staged")
    t.fast_forward("audit")
    return t.toDF()


@query(
    "ice21_query_history",
    oracle="""
    WITH d AS (SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS total FROM events),
         r AS (SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS hit FROM events
               WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-15')
    SELECT 1 AS seq, FALSE AS pruned,
           CAST(total AS INT) AS partitions_scanned,
           CAST(total AS INT) AS partitions_total
    FROM d
    UNION ALL
    SELECT 2, TRUE, CAST(hit AS INT), CAST(total AS INT) FROM r, d
    """,
)
def ice21_query_history(spark: SparkSession, sf: str) -> DataFrame:
    """QUERY_HISTORY monitoring (docs/09:183-194): a full scan then a
    hidden-partition-pruned scan of a day(ts)-partitioned table, read
    back through ``table.query_history()`` — the oracle pins the
    pruning-effectiveness arithmetic itself (the pruned scan touches
    exactly the days in range; the full scan touches every day), which
    is the docs' partitions_scanned ≪ partitions_total health check."""
    ev = load(spark, sf, "events").select("event_id", "event_type", "ts", "value")
    t = IceTable.create(spark, _scratch(), ev.schema, partition_by=[("ts", "day")])
    t.append(ev)
    t.toDF()  # scan 1: no predicate
    t.toDF((col("ts") >= "2024-01-10") & (col("ts") < "2024-01-15"))  # scan 2
    return t.query_history().select(
        "seq",
        F.col("predicate").isNotNull().alias("pruned"),
        "partitions_scanned",
        "partitions_total",
    )


@query(
    "ice22_cdc_diff",
    oracle=f"""
    SELECT {_ORDER_COLS}, 'delete' AS _change_type
    FROM orders WHERE o_orderstatus IN ('F', 'O')
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority,
           'insert' AS _change_type
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def ice22_cdc_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Row-level CDC between snapshots (``table.diff``, the changes
    view over time travel): after a COW DELETE and an UPDATE, the diff
    against the pre-DML snapshot surfaces the deleted rows as
    ``delete`` and each update as its delete+insert pair.  Files
    common to both snapshots cancel at the FILE level and are never
    read — only the symmetric difference of the file sets is scanned,
    so adjacent-snapshot CDC on a 100 TB table costs ~one commit's
    worth of I/O, and the exceptAll pair cancels rewritten-but-
    unchanged rows inside the hit files."""
    orders = load(spark, sf, "orders")
    t = IceTable.create(spark, _scratch(), orders.schema)
    s1 = t.append(orders)
    t.delete(col("o_orderstatus") == "F")
    t.update(col("o_orderstatus") == "O", {"o_totalprice": F.col("o_totalprice") * 1.1})
    return t.diff(s1.snapshot_id)


@query(
    "ice23_orphan_cleanup",
    oracle=f"SELECT {_ORDER_COLS} FROM orders WHERE o_orderkey % 3 = 0",
)
def ice23_orphan_cleanup(spark: SparkSession, sf: str) -> DataFrame:
    """M4 REMOVE ORPHAN FILES (docs/10:97-111) through the contract
    surface: plant a stray parquet under data/ (a crashed writer's
    leftover — written, never committed), sweep with the reachability
    check over EVERY snapshot, and prove the sweep took exactly the
    stray while the committed content reads back untouched."""
    import os as _os
    import time as _time

    from ..maintenance import remove_orphan_files

    orders = load(spark, sf, "orders")
    t = IceTable.create(spark, _scratch(), orders.schema)
    t.append(orders.filter(F.col("o_orderkey") % 3 == 0))
    stray = _os.path.join(t.location, "data", "stray-uncommitted.parquet")
    orders.limit(5).coalesce(1).write.mode("overwrite").parquet(stray + ".d")
    part = next(
        p for p in _os.listdir(stray + ".d") if p.endswith(".parquet")
    )
    _os.rename(_os.path.join(stray + ".d", part), stray)
    removed = remove_orphan_files(
        t, older_than_ms=int(_time.time() * 1000) + 60_000
    )
    if [_os.path.basename(p) for p in removed] != ["stray-uncommitted.parquet"]:
        raise AssertionError(f"orphan sweep took the wrong files: {removed}")
    return t.toDF()


@query(
    "ice24_rewrite_manifests",
    oracle=f"SELECT {_ORDER_COLS} FROM orders",
)
def ice24_rewrite_manifests(spark: SparkSession, sf: str) -> DataFrame:
    """M2 REWRITE MANIFESTS (docs/10:80-95): four fragmented appends
    leave four manifests; the rewrite coalesces them into one — a
    metadata-only commit (operation=replace, zero data files moved) —
    and the scan afterwards is value-identical to the input."""
    from ..maintenance import rewrite_manifests

    orders = load(spark, sf, "orders")
    t = IceTable.create(spark, _scratch(), orders.schema)
    for i in range(4):
        t.append(orders.filter(F.col("o_orderkey") % 4 == i))
    before = t.manifests().count()
    rewrite_manifests(t)
    after = t.manifests().count()
    if not (after == 1 < before):
        raise AssertionError(f"manifest rewrite: {before} -> {after}")
    return t.toDF()


@query(
    "ice25_sql_surface",
    oracle="""
    WITH cur AS (
      SELECT o_orderstatus,
             CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderstatus <> 'F'
    )
    SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(price), 2) AS revenue
    FROM cur GROUP BY o_orderstatus
    """,
)
def ice25_sql_surface(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's DECLARED surface is Snowflake-dialect SQL — this
    entry runs the docs' own statement lifecycle verbatim through the
    ``icepack.sql.IceSQL`` front-end (CREATE ICEBERG TABLE →
    INSERT..SELECT → UPDATE → DELETE → SELECT), each statement routed
    onto the table layer with the same predicate pruning as the Python
    API.  The full dialect battery (PARTITION BY transforms, MERGE with
    conditional matched-DELETE, AT() time travel, maintenance ALTERs,
    $METADATA relations, DROP/UNDROP) is pinned in tests/test_sql.py."""
    from ..sql import IceSQL

    isql = IceSQL(spark, _scratch())
    load(spark, sf, "orders").createOrReplaceTempView("orders_src")
    isql.sql(
        """
        CREATE ICEBERG TABLE db.ord (
            o_orderkey      BIGINT NOT NULL,
            o_custkey       BIGINT,
            o_orderstatus   VARCHAR(1),
            o_totalprice    DOUBLE,
            o_orderdate     TIMESTAMP_NTZ,
            o_orderpriority VARCHAR(15)
        )
        """
    )
    isql.sql("INSERT INTO db.ord SELECT * FROM orders_src")
    isql.sql("UPDATE db.ord SET o_totalprice = o_totalprice * 1.1 WHERE o_orderstatus = 'O'")
    isql.sql("DELETE FROM db.ord WHERE o_orderstatus = 'F'")
    return isql.sql(
        "SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS revenue "
        "FROM ord GROUP BY o_orderstatus"
    )


@query(
    "ice26_incremental_dedup",
    oracle="""
    WITH existing AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0),
    keyed AS (
      SELECT doc_id, lang, substr(text, 1, 12) AS k
      FROM documents WHERE doc_id % 2 = 1
    ),
    dedup_in AS (
      SELECT doc_id, lang, k FROM (
        SELECT keyed.*, ROW_NUMBER() OVER (PARTITION BY k ORDER BY doc_id) AS rn
        FROM keyed
      ) WHERE rn = 1
    ),
    new_clean AS (
      SELECT d.doc_id, d.lang FROM dedup_in d
      WHERE NOT EXISTS (
        SELECT 1 FROM existing e WHERE substr(e.text, 1, 12) = d.k
      )
    ),
    final AS (
      SELECT lang FROM existing UNION ALL SELECT lang FROM new_clean
    )
    SELECT lang, COUNT(*) AS n_docs FROM final GROUP BY lang
    """,
)
def ice26_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """The incremental-corpus pattern every training pipeline runs
    nightly, on the table layer end to end: an icepack documents table
    holds the accepted corpus; a new batch is deduped WITHIN itself
    (keep-first per key) and AGAINST the live table (anti join on the
    dup key), and only the survivors are appended — one atomic
    snapshot.  The corpus side projects just its key column out of the
    table scan (column pruning reaches the parquet), and at 100 TB the
    anti join shuffles (key, doc_id) pairs, never document text.
    Returned state is the final table's per-lang counts, so the oracle
    checks the whole lifecycle, not just the join."""
    docs = load(spark, sf, "documents")
    t = IceTable.create(spark, _scratch(), docs.schema)
    t.append(docs.filter(F.col("doc_id") % 2 == 0))

    from pyspark.sql import Window

    key = F.substring("text", 1, 12)
    incoming = docs.filter(F.col("doc_id") % 2 == 1).withColumn("k", key)
    w = Window.partitionBy("k").orderBy("doc_id")
    dedup_in = (
        incoming.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    corpus_keys = t.toDF().select(key.alias("k"))
    survivors = dedup_in.join(corpus_keys, "k", "left_anti").drop("k")
    t.append(survivors)
    return t.toDF().groupBy("lang").agg(F.count("*").alias("n_docs"))


@query(
    "ice27_scd2",
    oracle="""
    WITH upd AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal AS bal,
           CAST(1 AS BIGINT) AS version,
           CASE WHEN u.c_custkey IS NULL THEN CAST(NULL AS BIGINT)
                ELSE CAST(2 AS BIGINT) END AS valid_to,
           u.c_custkey IS NULL AS is_current
    FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
    UNION ALL
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal + 100.0 AS bal,
           CAST(2 AS BIGINT) AS version, CAST(NULL AS BIGINT) AS valid_to,
           true AS is_current
    FROM customer c JOIN upd u ON c.c_custkey = u.c_custkey
    """,
)
def ice27_scd2(spark: SparkSession, sf: str) -> DataFrame:
    """Slowly-changing-dimension type 2 on the table layer (the
    guide's 'CDC/SCD2 without Delta' pattern, done with our own MERGE):
    a CDC batch against a dimension closes each matched CURRENT row
    (merge keyed on (key, is_current) flips the flag and stamps
    valid_to) and appends the new version — history preserved, exactly
    one row current per key.  Two commits (close, insert) mirror the
    engine's one-statement-one-snapshot contract (D6); time travel to
    the pre-batch snapshot recovers the pre-CDC dimension for free.
    Scale: MERGE prunes target files by the source key set, so a
    narrow CDC batch against a wide dimension rewrites only hit files
    (or, under merge-on-read, only delete files + changed rows)."""
    from ..dml import merge

    cust = load(spark, sf, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").alias("bal"),
        F.lit(1).cast("long").alias("version"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    t = IceTable.create(spark, _scratch(), cust.schema)
    t.append(cust)
    upd = (
        load(spark, sf, "customer")
        .filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            "c_mktsegment",
            (F.col("c_acctbal") + 100.0).alias("bal"),
            F.lit(2).cast("long").alias("version"),
            F.lit(None).cast("long").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    # close the matched current rows…
    merge(
        t,
        upd,
        on=["c_custkey", "is_current"],
        when_matched_update={
            "is_current": F.lit(False),
            "valid_to": F.lit(2).cast("long"),
        },
        when_not_matched_insert=False,
    )
    # …then insert the new versions
    t.append(upd)
    return t.toDF()


@query(
    "ice28_json_ingest",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events GROUP BY 1
    """,
)
def ice28_json_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """S12-adjacent source breadth: a JSON-lines drop (the classic
    bronze landing format) ingested with an EXPLICIT schema — never
    inferSchema in a pipeline — into an icepack table, then aggregated
    off the table.  The doubles round-trip bit-exactly through JSON
    (shortest-repr write, exact parse), which the oracle's sum over
    the original parquet verifies.  Scale: schema-on-read JSON scans
    parallelize per file split like any text source; the append
    commits once regardless of source format, so format choice never
    touches the table-layer contract."""
    scratch = _scratch()
    ev = load(spark, sf, "events").select("event_id", "event_type", "value")
    jdir = scratch + "/json-src"
    ev.write.json(jdir)
    src = spark.read.schema("event_id long, event_type string, value double").json(
        jdir
    )
    t = IceTable.create(spark, scratch + "/tbl", src.schema)
    t.append(src)
    return (
        t.toDF()
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


@query(
    "ice29_add_files",
    oracle=f"""
    SELECT {_ORDER_COLS} FROM orders WHERE o_orderkey <= 700
    UNION ALL
    SELECT {_ORDER_COLS} FROM orders WHERE o_orderkey > 700
    """,
)
def ice29_add_files(spark: SparkSession, sf: str) -> DataFrame:
    """Migration path (docs/11): parquet files written OUTSIDE the
    table layer are adopted with add_files — a metadata-only commit
    (no rewrite, no move) that harvests footer stats so pruning works
    immediately.  The scan of the adopted table must return exactly
    the external files' rows."""
    scratch = _scratch()
    orders = load(spark, sf, "orders")
    ext = scratch + "/external"
    orders.filter("o_orderkey <= 700").coalesce(1).write.parquet(ext + "/low")
    orders.filter("o_orderkey > 700").coalesce(1).write.parquet(ext + "/high")
    import glob as _g

    paths = sorted(_g.glob(ext + "/*/*.parquet"))
    t = IceTable.create(spark, scratch + "/tbl", orders.schema)
    t.add_files(paths)
    return t.toDF()


@query(
    "ice30_csv_ingest",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events WHERE event_id % 2 = 0 GROUP BY 1
    """,
)
def ice30_csv_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """Source breadth, CSV leg (with ice28's JSON leg this completes
    the landing-format matrix): a headered CSV drop read with an
    EXPLICIT schema — never inferSchema — into an icepack table.
    Doubles survive the text round-trip bit-exactly (shortest-repr
    write, exact parse), verified by the oracle's sum over the
    original parquet.  The table layer stays parquet-only (the
    reference's own storage restriction,
    docs/02-parquet-data-storage.md:3-15): format conversion happens
    exactly once, at ingest."""
    scratch = _scratch()
    ev = (
        load(spark, sf, "events")
        .filter(F.col("event_id") % 2 == 0)
        .select("event_id", "event_type", "value")
    )
    cdir = scratch + "/csv-src"
    ev.write.option("header", True).csv(cdir)
    src = (
        spark.read.option("header", True)
        .schema("event_id long, event_type string, value double")
        .csv(cdir)
    )
    t = IceTable.create(spark, scratch + "/tbl", src.schema)
    t.append(src)
    return (
        t.toDF()
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


@query(
    "ice31_mor_pipeline",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS w
      FROM documents WHERE lang <> 'de'
    ),
    q AS (
      SELECT * FROM base
      WHERE len(w) BETWEEN 30 AND 1000
        AND len(list_distinct(w)) * 10 > len(w) * 3
    ),
    dedup AS (
      SELECT doc_id, lang, w FROM (
        SELECT doc_id, lang, w,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM q
      ) WHERE rn = 1
    ),
    sp AS (
      SELECT doc_id, lang, w,
             CASE
               WHEN substring(md5('split42|' || CAST(doc_id AS VARCHAR)), 1, 2)
                    < '0d' THEN 'test'
               WHEN substring(md5('split42|' || CAST(doc_id AS VARCHAR)), 1, 2)
                    < '1a' THEN 'val'
               ELSE 'train'
             END AS split
      FROM dedup
    ),
    chunks AS (
      SELECT split, lang, doc_id, w, unnest(range(1, len(w) + 1, 96)) AS s
      FROM sp
    )
    SELECT split, lang,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(len(list_slice(w, s, least(s + 127, len(w))))) AS BIGINT)
             AS n_tokens
    FROM chunks GROUP BY 1, 2
    """,
)
def ice31_mor_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The x42 training-data pipeline composed OVER a live
    merge-on-read table: documents land in an icepack table, a
    MOR DELETE drops one language as an equality-delete file (no data
    rewrite — the deleted rows are still physically present in the
    data files), then the full quality→dedup→split→chunk→census
    pipeline runs on the table read.

    What this pins: the MOR merge (anti-join against the delete file)
    happens at SCAN level, underneath the entire composed Catalyst
    plan — operators above the read never see deleted rows and never
    know the table is MOR.  At 100 TB this is the everyday shape:
    pipelines consume tables with in-flight deletes (GDPR erasure,
    retraction feeds) without waiting for compaction, paying one
    broadcast-sized anti-join at the scan instead of a table rewrite.
    The oracle is the x42 SQL with the deleted language filtered at
    base — equality by construction iff the delete file is applied
    exactly."""
    from .llm import pipeline_census

    docs = load(spark, sf, "documents")
    t = IceTable.create(
        spark,
        _scratch(),
        docs.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "identifier-field-names": "doc_id",
        },
    )
    t.append(docs)
    t.delete(col("lang") == "de")
    return pipeline_census(t.toDF())


@query(
    "ice32_rest_catalog",
    oracle=f"""
    SELECT {_ORDER_COLS} FROM orders
    WHERE o_orderkey % 2 = 0 AND o_orderstatus <> 'F'
    """,
)
def ice32_rest_catalog(spark: SparkSession, sf: str) -> DataFrame:
    """S5 end to end, self-contained: an in-process loopback service
    speaking the Iceberg REST catalog protocol (icepack/restcat.py —
    config/namespaces/load/commit with the 409-on-stale-base CAS), an
    external client seeding a table through it, the docs/04:77-93
    columnless CREATE ICEBERG TABLE ... CATALOG_TABLE_NAME linking form
    resolving that table over HTTP, and a DELETE whose commit goes
    through the service pointer swap.  Returns the linked table's final
    state — value-checked against the plain-SQL oracle, so the whole
    external-catalog path (protocol, pointer CAS, linked DML) lands in
    the driver's correctness evidence, not just pytest."""
    from ..restcat import RestCatalog, RestCatalogClient, loopback_catalog_server
    from ..sql import IceSQL

    url, shutdown = loopback_catalog_server()
    try:
        scratch = _scratch()
        orders = load(spark, sf, "orders")
        ext = RestCatalog(
            spark, scratch + "/ext", RestCatalogClient(url), "ns"
        )
        ext.create_table("src", orders.schema).append(
            orders.filter(F.col("o_orderkey") % 2 == 0)
        )
        isql = IceSQL(spark, scratch + "/local")
        isql.sql(
            "CREATE CATALOG INTEGRATION rc CATALOG_SOURCE = ICEBERG_REST"
            f" CATALOG_URI = '{url}' ENABLED = TRUE"
        )
        isql.sql(
            "CREATE ICEBERG TABLE linked CATALOG = 'rc'"
            " CATALOG_TABLE_NAME = 'ns.src'"
        )
        isql.sql("DELETE FROM linked WHERE o_orderstatus = 'F'")
        return isql.sql("SELECT * FROM linked")
    finally:
        shutdown()


@query(
    "ice33_orc_ingest",
    oracle="""
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events WHERE event_id % 3 = 0 GROUP BY event_type
    """,
)
def ice33_orc_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """Bronze landing from ORC (docs/11-multi-engine-compatibility.md:
    31-42 — engines land data in whatever columnar format their
    upstream uses; Spark reads ORC natively, no extra jar): write an
    ORC drop zone, read it back with an EXPLICIT schema, ingest into an
    icepack table — the table layer itself stays parquet-only
    (docs/02-parquet-data-storage.md:3-15), so the format conversion
    happens exactly once, at ingest, completing the JSON (ice28) / CSV
    (ice30) / ORC landing matrix.  Doubles survive ORC bit-exactly
    (same IEEE754 binary layout), verified by the oracle's sum over the
    original parquet."""
    scratch = _scratch()
    ev = (
        load(spark, sf, "events")
        .filter(F.col("event_id") % 3 == 0)
        .select("event_id", "event_type", "value")
    )
    odir = scratch + "/orc-src"
    ev.write.orc(odir)
    src = (
        spark.read.schema("event_id long, event_type string, value double")
        .orc(odir)
    )
    t = IceTable.create(spark, scratch + "/tbl", src.schema)
    t.append(src)
    return (
        t.toDF()
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


@query(
    "ice34_scheduled_compaction",
    oracle=f"SELECT {_ORDER_COLS} FROM orders WHERE o_orderkey % 2 = 1",
)
def ice34_scheduled_compaction(spark: SparkSession, sf: str) -> DataFrame:
    """M7 end to end as CORRECTNESS evidence (docs/10-maintenance-
    operations.md:174-183): fragment a table with six small appends,
    CREATE TASK with a nightly CRON schedule, RESUME it, and drive one
    deterministic scheduler tick at the scheduled instant — the task
    body's ALTER ICEBERG TABLE ... COMPACT DATA must actually shrink
    the file count, SHOW TASKS must surface the run (state, last_run_ms,
    no error), and the compacted content must hash-match the plain-SQL
    oracle.  Raises (driver err) if the scheduled run didn't happen or
    didn't compact, so a silent scheduler regression can't stay green."""
    import datetime as _dt

    from ..scheduler import TaskScheduler
    from ..sql import IceSQL

    isql = IceSQL(spark, _scratch())
    orders = load(spark, sf, "orders").filter(F.col("o_orderkey") % 2 == 1)
    orders.createOrReplaceTempView("ice34_src")
    isql.sql("CREATE ICEBERG TABLE frag AS SELECT * FROM ice34_src WHERE 1 = 0")
    for i in range(6):
        isql.sql(
            f"INSERT INTO frag SELECT * FROM ice34_src WHERE o_orderkey % 12 = {2 * i + 1}"
        )
    t = isql.catalog.load_table("frag")
    before = len(t.live_files())
    isql.sql(
        "CREATE TASK nightly_opt SCHEDULE = 'USING CRON 0 3 * * * UTC' "
        "AS ALTER ICEBERG TABLE frag COMPACT DATA"
    )
    isql.sql("ALTER TASK nightly_opt RESUME")
    tick = int(
        _dt.datetime(2024, 6, 1, 3, 0, tzinfo=_dt.timezone.utc).timestamp() * 1000
    )
    ran = TaskScheduler(isql).run_due(tick)
    if ran != ["nightly_opt"]:
        raise RuntimeError(f"scheduled task did not run at its instant: {ran}")
    st = {r.name: r for r in isql.sql("SHOW TASKS").collect()}["nightly_opt"]
    if st.last_run_ms != tick or getattr(st, "last_error", None):
        raise RuntimeError(f"task state wrong after tick: {st}")
    t.refresh()
    after = len(t.live_files())
    if not (after < before):
        raise RuntimeError(f"compaction did not shrink files: {before} -> {after}")
    return t.toDF()


@query(
    "ice35_multi_stmt_txn",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 100.0
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 3 = 0
    """,
)
def ice35_multi_stmt_txn(spark: SparkSession, sf: str) -> DataFrame:
    """D6 as driver evidence (docs/08-acid-transactions.md:143-165,
    managed-table mode): BEGIN; INSERT; INSERT; UPDATE; COMMIT through
    IceSQL, staged on a hidden WAP branch (icepack/txn.py) and
    fast-forwarded atomically.  An OUTSIDE reader (separate catalog
    handle) probes between statements and must see ZERO transaction
    effects until COMMIT — the query raises (driver err) on any
    atomicity breach, and the committed content is value-checked
    against the plain-SQL oracle."""
    from ..sql import IceSQL

    wh = _scratch()
    isql = IceSQL(spark, wh)
    outside = IceSQL(spark, wh)
    orders = load(spark, sf, "orders").filter(F.col("o_orderkey") % 3 == 0)
    orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    ).createOrReplaceTempView("ice35_src")
    isql.sql(
        "CREATE ICEBERG TABLE txn_orders AS SELECT * FROM ice35_src WHERE 1 = 0"
    )
    isql.sql("BEGIN")
    isql.sql(
        "INSERT INTO txn_orders SELECT * FROM ice35_src WHERE o_orderkey % 6 = 0"
    )
    mid1 = outside.sql("SELECT COUNT(*) AS n FROM txn_orders").collect()[0].n
    isql.sql(
        "INSERT INTO txn_orders SELECT * FROM ice35_src WHERE o_orderkey % 6 = 3"
    )
    isql.sql(
        "UPDATE txn_orders SET o_totalprice = o_totalprice + 100.0"
        " WHERE o_orderstatus = 'F'"
    )
    mid2 = outside.sql("SELECT COUNT(*) AS n FROM txn_orders").collect()[0].n
    if mid1 != 0 or mid2 != 0:
        raise RuntimeError(
            f"atomicity breach: outside reader saw {mid1}/{mid2} staged rows"
        )
    isql.sql("COMMIT")
    return outside.sql(
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM txn_orders"
    )


@query(
    "ice36_glue_catalog",
    oracle=f"""
    SELECT {_ORDER_COLS} FROM orders
    WHERE o_orderkey % 2 = 1 AND o_orderpriority <> '1-URGENT'
    """,
)
def ice36_glue_catalog(spark: SparkSession, sf: str) -> DataFrame:
    """S5 Glue half, end to end and self-contained (docs/04-catalog-
    systems.md:58-76): an in-process loopback speaking the AWS Glue
    Data Catalog JSON-1.1 dialect (icepack/gluecat.py — GetTable/
    CreateTable/UpdateTable with the VersionId optimistic lock), an
    external client seeding a table through it, the docs' CREATE
    CATALOG INTEGRATION ... CATALOG_SOURCE = GLUE + columnless CREATE
    ICEBERG TABLE ... CATALOG_TABLE_NAME link, and a DELETE whose
    commit swaps the Glue pointer under the version lock.  Mirrors
    ice32 so BOTH documented external-catalog protocols carry driver
    correctness evidence."""
    from ..gluecat import GlueCatalog, GlueCatalogClient, loopback_glue_server
    from ..sql import IceSQL

    endpoint, shutdown = loopback_glue_server()
    try:
        scratch = _scratch()
        orders = load(spark, sf, "orders")
        ext = GlueCatalog(
            spark, scratch + "/ext", GlueCatalogClient(endpoint), "gdb"
        )
        ext.create_table("src", orders.schema).append(
            orders.filter(F.col("o_orderkey") % 2 == 1)
        )
        isql = IceSQL(spark, scratch + "/local")
        isql.sql(
            "CREATE CATALOG INTEGRATION glue_catalog"
            " CATALOG_SOURCE = GLUE CATALOG_NAMESPACE = 'gdb'"
            " TABLE_FORMAT = ICEBERG"
            f" GLUE_ENDPOINT = '{endpoint}' ENABLED = TRUE"
        )
        isql.sql(
            "CREATE ICEBERG TABLE linked CATALOG = 'glue_catalog'"
            " CATALOG_TABLE_NAME = 'gdb.src'"
        )
        isql.sql("DELETE FROM linked WHERE o_orderpriority = '1-URGENT'")
        return isql.sql("SELECT * FROM linked")
    finally:
        shutdown()


@query(
    "ice37_memory_store",
    oracle=f"""
    SELECT {_ORDER_COLS} FROM orders
    WHERE (o_orderkey % 2 = 0 AND o_orderstatus <> 'F') OR o_orderkey % 2 = 1
    """,
)
def ice37_memory_store(spark: SparkSession, sf: str) -> DataFrame:
    """Storage seam (icepack/storage.py; docs/01-table-format-
    architecture.md:101-124): the full table lifecycle — create, two
    appends, a MOR delete, compaction, expiration — with every metadata
    document (version docs, manifests, manifest lists, pointer) living
    ONLY in an in-memory object store while Spark writes the parquet to
    disk.  That is the metadata/data split of an object-store + catalog
    deployment; the query raises (driver err) if any metadata file
    leaks onto the local filesystem, and the final scan is value-checked
    against the oracle recomputing the same slices from the raw parquet."""
    import os as _os

    from ..storage import InMemoryStore

    store = InMemoryStore()
    orders = load(spark, sf, "orders")
    t = IceTable.create(
        spark,
        _scratch(),
        orders.schema,
        properties={"write.delete.mode": "merge-on-read"},
        store=store,
    )
    t.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    t.delete(col("o_orderstatus") == "F")  # equality-delete file, in-store
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    t.compact()  # folds the MOR delete; rewrites via Spark, commits in-store
    t.expire_snapshots(older_than_ms=int(1e18), retain_last=1)
    mdir = _os.path.join(t.location, "metadata")
    if _os.path.exists(mdir) and _os.listdir(mdir):
        raise RuntimeError(f"metadata leaked to local filesystem: {_os.listdir(mdir)}")
    if not store.glob(_os.path.join(mdir, "v*.metadata.json")):
        raise RuntimeError("no metadata documents in the in-memory store")
    return t.toDF()


@query(
    "ice38_sql_pruned_select",
    oracle=f"SELECT {_ORDER_COLS} FROM orders WHERE o_orderstatus = 'F'",
)
def ice38_sql_pruned_select(spark: SparkSession, sf: str) -> DataFrame:
    """SELECT-side manifest pruning through the SQL front-end
    (docs/09:17-44 + the docs/09:181-194 monitoring loop): a plain SQL
    WHERE on a partitioned scratch table must scan strictly fewer
    partitions than the table has, and QUERY_HISTORY must report it.
    The query raises (driver err) if pruning didn't happen; the rows
    are value-checked against the raw-parquet oracle."""
    from ..sql import IceSQL

    isql = IceSQL(spark, _scratch())
    orders = load(spark, sf, "orders")
    orders.createOrReplaceTempView("ice38_src")
    isql.sql(
        "CREATE ICEBERG TABLE po (o_orderkey BIGINT, o_custkey BIGINT,"
        " o_orderstatus STRING, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP, o_orderpriority STRING)"
        " PARTITION BY (o_orderstatus)"
    )
    isql.sql("INSERT INTO po SELECT * FROM ice38_src")
    out = isql.sql("SELECT * FROM po WHERE o_orderstatus = 'F'")
    hist = isql.sql(
        "SELECT partitions_scanned, partitions_total FROM"
        " TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())"
        " WHERE query_text LIKE '%o_orderstatus = ''F''%'"
        " AND query_type = 'SELECT'"
    ).collect()
    if not hist or not (0 < hist[-1].partitions_scanned < hist[-1].partitions_total):
        raise RuntimeError(f"SQL SELECT did not prune: {hist}")
    return out


@query(
    "ice39_distributed_plan",
    oracle=f"""
    SELECT {_ORDER_COLS} FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderstatus <> 'F'
    """,
)
def ice39_distributed_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed scan planning (icepack/scanplan.py): pruning
    evaluated in Spark over the manifests, opted in via
    ``read.plan-mode='distributed'``.  The query builds a
    month-partitioned table, runs the same predicate through BOTH
    planners, raises (driver err) unless the distributed selection is a
    superset of the exact one AND actually prunes, then returns the
    distributed-planned scan for value-checking against the raw-parquet
    oracle."""
    from ..scanplan import plan_entries_distributed

    orders = load(spark, sf, "orders")
    t = IceTable.create(
        spark,
        _scratch(),
        orders.schema,
        partition_by=[("o_orderdate", "month")],
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(orders)
    t.delete(col("o_orderstatus") == "F")
    pred = col("o_orderdate") >= "1996-01-01 00:00:00"
    exact, _ = t.plan_files(pred)
    dist, _dels = plan_entries_distributed(t, pred)
    total = len(t.live_files())
    exact_paths, dist_paths = {f.path for f in exact}, {f.path for f in dist}
    if not (exact_paths <= dist_paths and 0 < len(dist_paths) < total):
        raise RuntimeError(
            f"distributed plan wrong: exact={len(exact_paths)}"
            f" dist={len(dist_paths)} total={total}"
        )
    t.set_properties(**{"read.plan-mode": "distributed"})
    return t.toDF(pred)


@query(
    "ice40_stream_source",
    oracle=f"SELECT {_ORDER_COLS} FROM orders WHERE o_orderkey % 4 = 1",
)
def ice40_stream_source(spark: SparkSession, sf: str) -> DataFrame:
    """The table layer as BOTH ends of a Structured Streaming pipe
    (icepack/datasource.py, Spark 4 Python Data Source API): an icepack
    source table streams through ``readStream.format('icepack')`` INTO
    an icepack destination via ``writeStream.format('icepack')`` (the
    native sink: executors write task parquet, the driver commits one
    atomic snapshot per micro-batch) — two checkpointed AvailableNow
    runs, the second delivering ONLY the rows appended in between (the
    query raises on re-delivery or wrong snapshot count).  The
    destination TABLE scan is value-checked against the oracle."""
    import os as _os

    from ..datasource import register

    register(spark)
    scratch = _scratch()
    loc, dst, ck = (
        _os.path.join(scratch, "t"),
        _os.path.join(scratch, "dst"),
        _os.path.join(scratch, "ck"),
    )
    orders = load(spark, sf, "orders")
    t = IceTable.create(spark, loc, orders.schema)
    d = IceTable.create(spark, dst, orders.schema)
    t.append(orders.filter(F.col("o_orderkey") % 8 == 1))

    def run():
        q = (
            spark.readStream.format("icepack")
            .option("location", loc)
            .load()
            .writeStream.format("icepack")
            .option("location", dst)
            .option("sink-id", "ice40")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()
    n1 = d.refresh().toDF().count()
    t.append(orders.filter(F.col("o_orderkey") % 8 == 5))
    run()
    d.refresh()
    n2 = d.toDF().count()
    expect = orders.filter(F.col("o_orderkey") % 4 == 1).count()
    snaps = [s for s in d.meta.snapshots if s.operation == "append"]
    if not (0 < n1 < n2 == expect and len(snaps) == 2):
        raise RuntimeError(
            f"incremental delivery broken: {n1} -> {n2}, expect {expect},"
            f" append snapshots {len(snaps)}"
        )
    return d.toDF()


@query(
    "ice41_time_travel_prune",
    oracle=f"""
    SELECT {_ORDER_COLS} FROM orders
    WHERE o_orderdate < TIMESTAMP '1997-01-01' AND o_orderstatus = 'F'
    """,
)
def ice41_time_travel_prune(spark: SparkSession, sf: str) -> DataFrame:
    """S8 × P3 through the SQL front-end: AT(SNAPSHOT => ...) with a
    partition-column WHERE gets the same manifest pruning a
    current-snapshot SELECT does (docs/05:57-72 + docs/09:17-44) — the
    file list comes from the PINNED snapshot's manifests.  Raises
    (driver err) unless QUERY_HISTORY shows the time-travel scan read
    strictly fewer partitions than the snapshot has; rows value-check
    against the raw-parquet oracle for the first commit's slice."""
    from ..sql import IceSQL

    isql = IceSQL(spark, _scratch())
    orders = load(spark, sf, "orders")
    orders.createOrReplaceTempView("ice41_src")
    isql.sql(
        "CREATE ICEBERG TABLE ptt (o_orderkey BIGINT, o_custkey BIGINT,"
        " o_orderstatus STRING, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP, o_orderpriority STRING)"
        " PARTITION BY (o_orderstatus)"
    )
    isql.sql(
        "INSERT INTO ptt SELECT * FROM ice41_src"
        " WHERE o_orderdate < TIMESTAMP '1997-01-01'"
    )
    snap_id = isql.sql("SELECT snapshot_id FROM ptt$SNAPSHOTS").collect()[-1].snapshot_id
    isql.sql(
        "INSERT INTO ptt SELECT * FROM ice41_src"
        " WHERE o_orderdate >= TIMESTAMP '1997-01-01'"
    )
    out = isql.sql(
        f"SELECT * FROM ptt AT(SNAPSHOT => {snap_id}) WHERE o_orderstatus = 'F'"
    )
    hist = isql.sql(
        "SELECT partitions_scanned, partitions_total FROM"
        " TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())"
        " WHERE query_text LIKE '%AT(SNAPSHOT%' AND query_type = 'SELECT'"
    ).collect()
    if not hist or not (0 < hist[-1].partitions_scanned < hist[-1].partitions_total):
        raise RuntimeError(f"time-travel SELECT did not prune: {hist}")
    return out


@query(
    "ice42_fsck",
    oracle=f"SELECT {_ORDER_COLS} FROM orders WHERE o_orderstatus <> 'F'",
)
def ice42_fsck(spark: SparkSession, sf: str) -> DataFrame:
    """M-family: table integrity verification as a gate.  After a
    lifecycle that exercises what the planners trust (append, COW
    delete rewrite, compaction, manifest rewrite), `verify(check_data=
    True)` must report ZERO findings — summaries match recomputed ones,
    sequence invariants hold, every footer's record count matches its
    manifest entry.  Raises (driver err) on any finding; rows
    value-check against the raw-parquet oracle."""
    from ..maintenance import compact, rewrite_manifests

    orders = load(spark, sf, "orders")
    t = IceTable.create(spark, _scratch(), orders.schema)
    t.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    t.delete(col("o_orderstatus") == "F")
    compact(t, target_file_size=32 * 1024 * 1024)
    rewrite_manifests(t)
    findings = t.verify(check_data=True)
    if findings:
        raise RuntimeError(f"table failed integrity check: {findings}")
    return t.toDF()


@query(
    "ice43_iceberg_export",
    oracle=(
        "SELECT n_nationkey, n_name, n_regionkey FROM nation "
        "UNION ALL SELECT n_nationkey, n_name, n_regionkey FROM nation"
    ),
)
def ice43_iceberg_export(spark: SparkSession, sf: str) -> DataFrame:
    """S-family interop: SPEC-FORMAT Iceberg metadata export
    (docs/11-multi-engine-compatibility.md:31-42,174-183).  Builds a
    partitioned table over two appends, exports v2 metadata (from-
    scratch Avro manifests + manifest list + spec JSON,
    iceberg_export.py), then re-reads the export with the INDEPENDENT
    schema-driven Avro decoder and raises unless the exported
    snapshot's (file path, record count) list matches ``live_files()``
    exactly AND the per-file record counts sum to the table count.
    Rows value-check against the doubled-nation oracle."""
    from ..iceberg_export import export_iceberg, read_exported_file_list

    nation = load(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    t = IceTable.create(
        spark, _scratch(), nation.schema,
        partition_by=[("n_regionkey", "mmh3bucket[4]")],
    )
    t.append(nation)
    t.append(nation)
    mpath = export_iceberg(t)
    exported = read_exported_file_list(mpath)
    live = sorted((f.path, f.record_count) for f in t.live_files())
    if exported != live:
        raise RuntimeError(
            f"exported file list diverged: {len(exported)} exported vs "
            f"{len(live)} live"
        )
    if sum(rc for _, rc in exported) != t.toDF().count():
        raise RuntimeError("exported record counts do not sum to table count")
    return t.toDF().select("n_nationkey", "n_name", "n_regionkey")


@query(
    "ice44_result_cache",
    oracle=(
        "SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, COUNT(*) AS n, "
        "COUNT(*) AS n2 FROM nation GROUP BY n_regionkey"
    ),
)
def ice44_result_cache(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-query result caching (docs/01-table-format-architecture.md:163):
    the same SELECT re-issued with no intervening commit must be served
    from the retained plan (QUERY_HISTORY cache_hit=true — raises
    otherwise), and a commit must invalidate (third run re-executes,
    raises if it hits).  Returns the cached and post-commit counts side
    by side so the oracle value-checks both executions."""
    from ..sql import IceSQL

    isql = IceSQL(spark, _scratch())
    nation = load(spark, sf, "nation")
    nation.createOrReplaceTempView("ice44_seed")
    isql.sql("CREATE ICEBERG TABLE rc44 (n_nationkey BIGINT, n_regionkey BIGINT)")
    isql.sql(
        "INSERT INTO rc44 SELECT n_nationkey, n_regionkey FROM ice44_seed"
    )
    q = "SELECT n_regionkey, COUNT(*) AS n FROM rc44 GROUP BY n_regionkey"
    first = isql.sql(q)
    second = isql.sql(q)
    if second is not first:
        raise RuntimeError("identical statement was not served from the cache")
    hist = isql.sql("SELECT query_text, cache_hit FROM TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())")
    hits = [r.cache_hit for r in hist.collect() if r.query_text == q]
    if hits != [False, True]:
        raise RuntimeError(f"QUERY_HISTORY cache marks wrong: {hits}")
    # any commit invalidates
    isql.sql("INSERT INTO rc44 SELECT n_nationkey + 1000, n_regionkey FROM ice44_seed WHERE n_nationkey < 0")
    third = isql.sql(q)
    if third is first:
        raise RuntimeError("commit did not invalidate the result cache")
    return (
        second.withColumnRenamed("n", "n_cached")
        .join(third.withColumnRenamed("n", "n2"), "n_regionkey")
        .select("n_regionkey", F.col("n_cached").alias("n"), "n2")
    )


@query(
    "ice45_mor_batch_read",
    oracle=(
        "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey <> 2 "
        "AND n_nationkey <> 5"
    ),
)
def ice45_mor_batch_read(spark: SparkSession, sf: str) -> DataFrame:
    """The registered batch data source reads a merge-on-read table
    row-identically to toDF(): an equality DELETE and a position
    DELETE both mask through spark.read.format('icepack'), with a
    pushed filter composing on top (r5; previously the reader refused
    MOR tables)."""
    from ..datasource import register

    register(spark)
    nation = load(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    t = IceTable.create(
        spark, _scratch(), nation.schema,
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(nation)
    t.delete(col("n_regionkey") == 2)  # equality delete file
    t.set_properties(**{"write.delete.mor.strategy": "position"})
    t.delete(col("n_nationkey") == 5)  # position delete file
    got = (
        spark.read.format("icepack")
        .option("location", t.location)
        .load()
        .select("n_nationkey", "n_name")
    )
    # cross-check row identity with the delete-applying table scan
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, t.toDF().select("n_nationkey", "n_name").collect()))
    if a != b:
        raise RuntimeError("datasource MOR read diverged from toDF()")
    return got


@query(
    "ice46_s3_store",
    oracle=f"""
    SELECT {_ORDER_COLS} FROM orders
    WHERE (o_orderkey % 2 = 0 AND o_orderstatus <> 'F') OR o_orderkey % 2 = 1
    """,
)
def ice46_s3_store(spark: SparkSession, sf: str) -> DataFrame:
    """Cloud-transport seam, real wire (icepack/s3store.py + sigv4.py):
    the same lifecycle as ice37 — create, appends, MOR delete, compact,
    expire — with every metadata document living ONLY in a loopback S3
    server over real HTTP, every request SigV4-SIGNED and the server
    VERIFYING each signature before serving (sigv4.py is pinned against
    AWS's published example signature).  create_exclusive maps to S3's
    conditional PUT (If-None-Match: *), so the commit CAS is the real
    object-store protocol.  Raises on any unsigned/forged request, any
    metadata leak to local disk, or an empty store at the end."""
    import os as _os
    import threading as _th
    from http.server import ThreadingHTTPServer

    from ..s3store import LoopbackS3Handler, S3Store

    ACCESS, SECRET, REGION = "AKIDDRIVER", "driver/secret+key", "us-east-1"
    handler = LoopbackS3Handler.make(ACCESS, SECRET, REGION)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    _th.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        store = S3Store(
            f"http://127.0.0.1:{srv.server_port}",
            bucket="warehouse",
            region=REGION,
            access_key=ACCESS,
            secret_key=SECRET,
        )
        orders = load(spark, sf, "orders")
        t = IceTable.create(
            spark, _scratch(), orders.schema,
            properties={"write.delete.mode": "merge-on-read"},
            store=store,
        )
        t.append(orders.filter(F.col("o_orderkey") % 2 == 0))
        t.delete(col("o_orderstatus") == "F")
        t.append(orders.filter(F.col("o_orderkey") % 2 == 1))
        t.compact()
        t.expire_snapshots(older_than_ms=int(1e18), retain_last=1)
        if handler.bad_auth:
            raise RuntimeError(f"unsigned/forged S3 requests: {handler.bad_auth}")
        mdir = _os.path.join(t.location, "metadata")
        if _os.path.exists(mdir) and _os.listdir(mdir):
            raise RuntimeError("metadata leaked to local filesystem")
        if not store.glob(_os.path.join(mdir, "v*.metadata.json")):
            raise RuntimeError("no metadata documents in the S3 store")
        return t.toDF()
    finally:
        srv.shutdown()


@query(
    "ice47_iceberg_read",
    oracle=(
        "SELECT n_nationkey, n_name, n_regionkey FROM nation "
        "WHERE n_regionkey <> 3"
    ),
)
def ice47_iceberg_read(spark: SparkSession, sf: str) -> DataFrame:
    """Bidirectional spec interop (docs/11-multi-engine-compatibility.md):
    a table is exported to SPEC-FORMAT Iceberg v2 metadata
    (iceberg_export.py) and read back EXCLUSIVELY through that spec
    metadata — Avro manifest list → manifests → parquet — by
    read_iceberg (iceberg_import.py), never touching icepack's native
    metadata.  A COW delete before export proves the exported snapshot
    reflects DML; the result value-checks against the oracle."""
    from ..iceberg_import import read_iceberg
    from ..iceberg_export import export_iceberg

    nation = load(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    t = IceTable.create(spark, _scratch(), nation.schema)
    t.append(nation)
    t.delete(col("n_regionkey") == 3)  # COW: exported manifests reflect it
    mpath = export_iceberg(t)
    got = read_iceberg(spark, mpath)
    n_direct = t.toDF().count()
    if got.count() != n_direct:
        raise RuntimeError("spec-format read diverged from the native scan")
    return got.select("n_nationkey", "n_name", "n_regionkey")


@query(
    "ice48_spec_read_prune",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderdate >= DATE '1997-01-01'"
    ),
)
def ice48_spec_read_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Spec-read planning (docs/11 + docs/09): a date-partitioned table
    is exported to spec metadata and read back THROUGH the export with
    a predicate — read_iceberg must prune files from the exported
    bounds/partition values (raises unless kept < total) and still
    return exactly the oracle's rows."""
    from ..iceberg_export import export_iceberg
    from ..iceberg_import import (
        _prune_files,
        _snapshot_entries,
        load_iceberg_metadata,
        read_iceberg,
    )

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    t = IceTable.create(
        spark, _scratch(), orders.schema, partition_by=[("o_orderdate", "year")]
    )
    t.append(orders)
    mpath = export_iceberg(t)
    md = load_iceberg_metadata(mpath)
    data, _ = _snapshot_entries(md)
    pred = col("o_orderdate") >= "1997-01-01"
    kept = _prune_files(md, data, pred)
    if not (0 < len(kept) < len(data)):
        raise RuntimeError(
            f"spec-read pruning ineffective: kept {len(kept)} of {len(data)}"
        )
    return read_iceberg(spark, mpath, where=pred).select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "ice49_spec_primary",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(o_totalprice) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderstatus
    """,
)
def ice49_spec_primary(spark: SparkSession, sf: str) -> DataFrame:
    """SPEC-PRIMARY metadata (docs/11:112-120, specio.py): with
    ``format.spec-primary=true`` every commit writes ONLY Iceberg v2
    spec files (Avro manifests + spec metadata.json) — there is no
    native tree and no mirror; external engines follow the SAME
    version hint the engine commits.  The query runs a lifecycle
    (create → append → MOR equality delete → reload from disk) and
    cross-checks the native scan against read_iceberg planning from
    the very same metadata directory before returning the aggregate."""
    import os

    from ..iceberg_import import read_iceberg

    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = IceTable.create(
        spark,
        _scratch(),
        orders.schema,
        properties={
            "format.spec-primary": "true",
            "write.delete.mode": "merge-on-read",
        },
    )
    t.append(orders)
    t.delete(col("o_orderstatus") == "F")  # MOR delete in spec files
    t2 = IceTable.load(spark, t.location)  # cold reload from spec tree
    native = t2.toDF()
    ext = read_iceberg(spark, os.path.join(t.location, "metadata"))
    if ext.count() != native.count():
        raise RuntimeError("spec-primary: external read diverged from native")
    return native.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum("o_totalprice").cast("double").alias("sum_price"),
    )


@query(
    "ice50_foreign_adopt",
    oracle="""
    SELECT n_regionkey,
           COUNT(*) AS n,
           MIN(n_name) AS first_name
    FROM nation
    WHERE n_regionkey <> 2 AND n_nationkey <> 5
    GROUP BY n_regionkey
    """,
)
def ice50_foreign_adopt(spark: SparkSession, sf: str) -> DataFrame:
    """FOREIGN spec-tree adoption (docs/11:91-120, specio.py +
    table.py::_read_foreign_files): a spec-format metadata tree with
    NO icepack stashes — an external engine's table, stood in for by
    export_iceberg output — loads through IceTable.load as a
    first-class native table.  The query exercises the whole story:
    foreign MOR equality-delete masks apply natively, a native DML
    commits ON TOP of the foreign tree (writing spec files), and the
    independent spec reader agrees with the native scan afterwards."""
    import os

    from ..iceberg_export import export_iceberg
    from ..iceberg_import import read_iceberg

    nation = load(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    src = IceTable.create(
        spark, _scratch(), nation.schema,
        properties={"write.delete.mode": "merge-on-read"},
    )
    src.append(nation)
    src.delete(col("n_regionkey") == 2)  # foreign MOR delete
    floc = os.path.join(_scratch(), "ftbl")
    os.makedirs(os.path.join(floc, "metadata"))
    export_iceberg(src, dest=os.path.join(floc, "metadata"))

    t = IceTable.load(spark, floc)  # adopt the foreign tree natively
    t.delete(col("n_nationkey") == 5)  # OUR commit on top (spec files)
    native = t.toDF()
    ext = read_iceberg(spark, os.path.join(floc, "metadata"))
    if ext.count() != native.count():
        raise RuntimeError("foreign adoption: spec reader diverged from native")
    return native.groupBy("n_regionkey").agg(
        F.count("*").alias("n"), F.min("n_name").alias("first_name")
    )


@query(
    "ice51_table_stats",
    oracle="""
    WITH base AS (SELECT doc_id, text, lang FROM documents)
    SELECT col_name, phase, n_rows, duplicated FROM (
      SELECT 'doc_id' AS col_name, 1 AS phase, COUNT(*) AS n_rows,
             CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT doc_id) >= 1.5 AS duplicated
      FROM base
      UNION ALL
      SELECT 'text', 1, COUNT(*),
             CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT text) >= 1.5 FROM base
      UNION ALL
      SELECT 'lang', 1, COUNT(*),
             CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT lang) >= 1.5 FROM base
      UNION ALL
      SELECT 'doc_id', 2, 2 * COUNT(*),
             CAST(2 * COUNT(*) AS DOUBLE) / COUNT(DISTINCT doc_id) >= 1.5 FROM base
      UNION ALL
      SELECT 'text', 2, 2 * COUNT(*),
             CAST(2 * COUNT(*) AS DOUBLE) / COUNT(DISTINCT text) >= 1.5 FROM base
      UNION ALL
      SELECT 'lang', 2, 2 * COUNT(*),
             CAST(2 * COUNT(*) AS DOUBLE) / COUNT(DISTINCT lang) >= 1.5 FROM base
    )
    """,
)
def ice51_table_stats(spark: SparkSession, sf: str) -> DataFrame:
    """TABLE-LEVEL STATISTICS (docs/04-catalog-systems.md:45 "Automatic
    statistics collection"; icepack/stats.py + icepack/puffin.py): the
    snapshot-keyed NDV/duplication stat, persisted as a table property
    AND as an Iceberg StatisticsFile (Puffin) entry.

    Lifecycle under test: compute stats for three columns on the first
    snapshot (one scan each, persisted); append an EXACT COPY of the
    data (a pure append); re-ask the thresholded question.  The
    duplicate-saturated column (``lang``) must be re-answered from the
    appends-only metadata BOUNDS with zero additional scans — the
    100 TB contract — while columns whose bracket straddles the
    threshold recompute once.  The Puffin blob NDVs are cross-checked
    against the persisted properties before returning.

    The decision threshold (1.5) sits far from every column's true
    ratio at both phases (1.0 or >= 2.0), so the HLL estimate
    (~2.3% rsd) can never flip a returned boolean — which is what
    makes an approx-backed stat oracle-checkable exactly."""
    import json as _json

    from ..puffin import read_puffin
    from ..stats import read_stat

    cols = ("doc_id", "text", "lang")
    d = load(spark, sf, "documents").select(*cols)
    t = IceTable.create(spark, _scratch(), d.schema)
    t.append(d)
    rows = []
    for c in cols:
        ratio = t.duplication_ratio(c, threshold=1.5)
        st = read_stat(t, c)
        rows.append((c, 1, st["rows"], ratio >= 1.5))
    # Puffin cross-check: blob NDVs must equal the persisted properties
    e = t.meta.statistics[0]
    blobs, _ = read_puffin(t.store.read_bytes(e["statistics-path"]))
    by_field = {b["fields"][0]: int(b["properties"]["ndv"]) for b in blobs}
    for c in cols:
        fid = t.meta.schema.field_by_name(c).id
        if by_field.get(fid) != read_stat(t, c)["ndv"]:
            raise RuntimeError(f"puffin/property NDV divergence for {c}")
    t.append(d)  # exact copy: every value now appears twice
    scans_before = t.query_history().count()
    lang_ratio = t.duplication_ratio("lang", threshold=1.5)
    if t.query_history().count() != scans_before:
        raise RuntimeError("bounds should have answered lang without a scan")
    rows.append(("lang", 2, read_stat(t, "lang")["rows"] * 2, lang_ratio >= 1.5))
    for c in ("doc_id", "text"):  # bracket straddles 1.5 -> recompute
        ratio = t.duplication_ratio(c, threshold=1.5)
        st = read_stat(t, c)
        if st["snapshot_id"] != t.meta.current_snapshot_id:
            raise RuntimeError(f"straddling bracket must recompute {c}")
        rows.append((c, 2, st["rows"], ratio >= 1.5))
    return local_df(spark, 
        rows, "col_name string, phase int, n_rows bigint, duplicated boolean"
    )


@query(
    "ice52_table_dedup",
    oracle="""
    WITH all_docs AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, lang, text FROM documents WHERE doc_id % 7 = 0
    ),
    keep AS (
      SELECT MIN(doc_id) AS doc_id FROM all_docs GROUP BY text
    )
    SELECT a.lang, COUNT(*) AS n_docs
    FROM all_docs a JOIN keep k ON a.doc_id = k.doc_id
    GROUP BY a.lang
    """,
)
def ice52_table_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup as a TABLE MAINTENANCE commit (icepack.dedup.dedupe_table;
    MERGE semantics per docs/08-acid-transactions.md:133-141, the
    silver-layer cleansing step of docs/12-lakehouse-patterns.md:57-83):
    a documents table polluted with re-ingested copies (and the
    fixture corpus's own exact duplicates) dedupes IN PLACE — groups
    keyed by a 128-bit content hash, survivor = MIN(doc_id), losers
    removed through one MERGE ... WHEN MATCHED DELETE snapshot (under
    merge-on-read only tombstones move).  Returned state is the final
    table's per-lang counts, so the oracle checks the delete actually
    landed, not just the group math."""
    docs = load(spark, sf, "documents").select("doc_id", "lang", "text")
    from ..dedup import dedupe_table

    t = IceTable.create(
        spark, _scratch(), docs.schema,
        properties={"write.merge.mode": "merge-on-read"},
    )
    copies = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    t.append(docs.unionByName(copies))
    dedupe_table(t)
    return t.toDF().groupBy("lang").agg(F.count("*").alias("n_docs"))


@query(
    "ice53_stream_dedup_ingest",
    oracle="""
    WITH p1 AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id + 1000000, lang, text FROM documents
      WHERE doc_id % 2 = 0 AND doc_id % 6 = 0
    ),
    p2 AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 1),
    s1 AS (SELECT text, MIN(doc_id) AS doc_id FROM p1 GROUP BY text),
    s2 AS (
      SELECT p2.text, MIN(p2.doc_id) AS doc_id
      FROM p2 LEFT JOIN s1 ON s1.text = p2.text
      WHERE s1.text IS NULL
      GROUP BY p2.text
    ),
    surv AS (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2),
    u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
    SELECT u.lang, COUNT(*) AS n_docs
    FROM surv JOIN u ON u.doc_id = surv.doc_id
    GROUP BY u.lang
    """,
)
def ice53_stream_dedup_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming dedup INGESTION — the incremental bronze→silver
    pattern (docs/12-lakehouse-patterns.md:94-104; ice26's batch twin)
    as a real Structured Streaming pipe: an icepack source table
    streams through ``foreachBatch``; each micro-batch exact-dedups
    WITHIN itself (keep-min-id per 128-bit content hash) and AGAINST
    the destination table (left-anti on the same hash — only (hash,
    nothing) key pairs cross the exchange, never document text), and
    survivors append as one atomic snapshot per batch.  Two
    checkpointed AvailableNow runs: phase 1 carries internal
    duplicates, phase 2 repeats phase-1 texts — re-delivered or
    resurrected duplicates would break the value hash.

    Determinism: each phase is one commit = one AvailableNow
    micro-batch (the source resolves the whole (start, latest] range
    as a single batch), so survivor precedence is
    phase-1-then-phase-2, min id within a phase — exactly what the
    oracle computes."""
    import os as _os

    from pyspark.sql import Window as _W

    from ..datasource import register

    register(spark)
    scratch = _scratch()
    loc, dst_loc, ck = (
        _os.path.join(scratch, "src"),
        _os.path.join(scratch, "dst"),
        _os.path.join(scratch, "ck"),
    )
    docs = load(spark, sf, "documents").select("doc_id", "lang", "text")
    src = IceTable.create(spark, loc, docs.schema)
    dst = IceTable.create(spark, dst_loc, docs.schema)
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    copies = evens.filter(F.col("doc_id") % 6 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    src.append(evens.unionByName(copies))

    h1, h2 = F.xxhash64("text"), F.xxhash64(F.lit(1), "text")

    def fb(batch_df, _bid):
        dedup_in = (
            batch_df.withColumn("_rn", F.row_number().over(
                _W.partitionBy(h1, h2).orderBy("doc_id")
            ))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        d = IceTable.load(batch_df.sparkSession, dst_loc)
        existing = d.toDF().select(h1.alias("_h1"), h2.alias("_h2"))
        survivors = dedup_in.join(
            existing,
            (h1 == F.col("_h1")) & (h2 == F.col("_h2")),
            "left_anti",
        )
        d.append(survivors)

    def run():
        q = (
            spark.readStream.format("icepack")
            .option("location", loc)
            .load()
            .writeStream.foreachBatch(fb)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        # awaitTermination(timeout) returns False on timeout WITHOUT
        # raising — a still-running phase would silently overlap the
        # next append and make the result nondeterministic
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("ice53 stream phase did not finish in 300s")

    run()
    src.append(docs.filter(F.col("doc_id") % 2 == 1))  # repeats + novel
    run()
    dst.refresh()
    return dst.toDF().groupBy("lang").agg(F.count("*").alias("n_docs"))


@query(
    "ice54_deletion_vectors",
    oracle=f"""
    SELECT {_ORDER_COLS}
    FROM orders
    WHERE o_orderstatus <> 'F' AND o_orderpriority <> '1-URGENT'
    """,
)
def ice54_deletion_vectors(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg v3 DELETION VECTORS (docs/08 MOR story, v3 extension):
    two merge-on-read position deletes consolidate into roaring-bitmap
    DVs (one blob per data file in a Puffin container —
    icepack/roaring.py pins the public byte formats), and the native
    scan applies them through the same sequence-correct anti-join
    machinery as v2 tombstones.  The blobs decode in EXECUTORS
    (dv.dv_positions_df), so a 100 TB table's deleted positions never
    visit the driver; the scan pays at most ONE delete structure per
    data file after consolidation."""
    from ..maintenance import write_deletion_vectors

    orders = load(spark, sf, "orders")
    t = IceTable.create(
        spark,
        _scratch(),
        orders.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(orders)
    t.delete(col("o_orderstatus") == "F")
    t.delete(col("o_orderpriority") == "1-URGENT")
    assert write_deletion_vectors(t) is not None
    live = t.live_files(content="all")
    assert [f for f in live if f.content == "deletion-vectors"]
    assert not [f for f in live if f.content.endswith("-deletes")]
    return t.toDF()


@query(
    "ice55_versioned_view",
    oracle="""
    SELECT 1 AS version_id, o_orderstatus, COUNT(*) AS n,
           CAST(NULL AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 2 AS version_id, o_orderstatus, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus
    ORDER BY version_id, o_orderstatus
    """,
)
def ice55_versioned_view(spark: SparkSession, sf: str) -> DataFrame:
    """Persistent VERSIONED views (docs/12-lakehouse-patterns.md:168-172
    CREATE VIEW, stored in the public Iceberg view-spec shape —
    icepack/views.py): CREATE ICEBERG VIEW pins v1; CREATE OR REPLACE
    appends v2 with the definition history retained, so BOTH versions
    stay queryable — the result unions v1's output (via the version-id
    time travel) with v2's, tagged by version.  A fresh IceSQL session
    over the same warehouse resolves the view from disk."""
    from ..sql import IceSQL

    orders = load(spark, sf, "orders")
    wh = _scratch()
    q = IceSQL(spark, wh)
    q.sql(
        "CREATE ICEBERG TABLE ot (o_orderkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE)"
    )
    q.catalog.load_table("ot").append(
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    q.sql(
        "CREATE ICEBERG VIEW status_counts AS SELECT o_orderstatus,"
        " COUNT(*) AS n FROM ot GROUP BY o_orderstatus"
    )
    q.sql(
        "CREATE OR REPLACE ICEBERG VIEW status_counts AS SELECT"
        " o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total"
        " FROM ot GROUP BY o_orderstatus"
    )
    # a FRESH session resolves both the current and the historical
    # definition from the persisted view tree
    q2 = IceSQL(spark, wh)
    pv = q2._persistent_view("status_counts")
    v1 = (
        pv.toDF(version_id=1)
        .select(
            F.lit(1).alias("version_id"),
            "o_orderstatus",
            "n",
            F.lit(None).cast("double").alias("total"),
        )
    )
    v2 = q2.sql("SELECT * FROM status_counts").select(
        F.lit(2).alias("version_id"), "o_orderstatus", "n", "total"
    )
    return v1.unionByName(v2).orderBy("version_id", "o_orderstatus")


@query(
    "ice56_partition_stats",
    oracle="""
    SELECT '{"o_orderdate_month": "' || strftime(o_orderdate, '%Y-%m') || '"}'
             AS partition,
           CAST(COUNT(*) AS BIGINT) AS data_rows,
           CAST(0 AS BIGINT) AS pos_delete_rows
    FROM orders GROUP BY 1
    UNION ALL
    SELECT '{}',
           CAST(0 AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_orderstatus = 'F')
    ORDER BY partition
    """,
)
def ice56_partition_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Partition statistics files (public Iceberg spec "Partition
    Statistics"; icepack/stats.write_partition_stats): a month-
    partitioned table takes a MOR position delete, `ALTER ... ANALYZE
    PARTITIONS` persists the per-partition totals as a field-id-stamped
    parquet registered in table metadata, and `$PARTITION_STATS` serves
    the dashboard FROM that file — no manifest walk.  Data rows stay
    with their month partitions; the unpartitioned tombstone file
    surfaces as the '{}' partition row, exactly as the spec's unified
    partition tuple prescribes."""
    from ..sql import IceSQL

    orders = load(spark, sf, "orders")
    wh = _scratch()
    q = IceSQL(spark, wh)
    t = IceTable.create(
        spark,
        _scratch(),
        orders.schema,
        partition_by=[("o_orderdate", "month")],
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(orders)
    t.delete(col("o_orderstatus") == "F")
    # address the externally-created table through IceSQL's linked-
    # table surface (same mechanism REST-catalog tables use)
    q._linked["pt"] = t
    q.sql("ALTER ICEBERG TABLE pt ANALYZE PARTITIONS")
    t.refresh()
    assert t.meta.partition_statistics, "stats file must be registered"
    out = q.sql(
        "SELECT partition, data_record_count AS data_rows,"
        " position_delete_record_count AS pos_delete_rows"
        " FROM pt$PARTITION_STATS ORDER BY partition"
    )
    return out


@query(
    "ice57_batch_writer",
    oracle=f"""
    SELECT {_ORDER_COLS}
    FROM orders
    WHERE o_orderstatus = 'O' OR o_orderkey % 3 = 0
    """,
)
def ice57_batch_writer(spark: SparkSession, sf: str) -> DataFrame:
    """Native DSv2 BATCH write path (datasource._BatchWriter) onto a
    PARTITIONED table: ``df.write.format("icepack")`` against a
    ``PARTITION BY (o_orderstatus)`` target has each task materialize
    the hidden partition tuple per row and the driver commit record
    real tuples (docs/07-partitioning.md:19-52 — partitioning is the
    reference's core performance story, so the idiomatic writer must
    feed it).  Appends accumulate, ``mode("overwrite")`` replaces
    everything in one atomic snapshot, and partition pruning on the
    result is asserted before returning it through the native scan."""
    from ..datasource import register
    from ..expr import col as ecol

    register(spark)
    orders = load(spark, sf, "orders")
    loc = _scratch() + "/t"
    t = IceTable.create(
        spark, loc, orders.schema, partition_by=[("o_orderstatus", "identity")]
    )
    orders.filter(F.col("o_orderstatus") == "O").write.format(
        "icepack"
    ).option("location", loc).mode("append").save()
    orders.filter(
        (F.col("o_orderstatus") != "O") & (F.col("o_orderkey") % 3 == 0)
    ).write.format("icepack").option("location", loc).mode("append").save()
    # overwrite with the union the oracle states (one replace snapshot)
    t.refresh()
    n_before = len(t.meta.snapshots)
    orders.filter(
        (F.col("o_orderstatus") == "O") | (F.col("o_orderkey") % 3 == 0)
    ).write.format("icepack").option("location", loc).mode(
        "overwrite"
    ).save()
    t.refresh()
    assert len(t.meta.snapshots) == n_before + 1
    # tuples are real and manifest pruning works on the writer's output
    assert {f.partition["o_orderstatus"] for f in t.live_files()} <= {
        "O", "F", "P",
    }
    files, rep = t.plan_files(ecol("o_orderstatus") == "F")
    assert all(f.partition["o_orderstatus"] == "F" for f in files)
    assert rep["files_scanned"] < rep["files_total"]
    return t.toDF()


@query(
    "ice58_materialized_view",
    oracle="""
    WITH base AS (
      SELECT o_orderstatus, o_totalprice FROM orders
      UNION ALL
      SELECT o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey <= 40
    )
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM base GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def ice58_materialized_view(spark: SparkSession, sf: str) -> DataFrame:
    """MATERIALIZED views (docs/12-lakehouse-patterns.md:260 "cache
    frequently accessed Gold tables — consider materialized views"):
    CREATE MATERIALIZED ICEBERG VIEW pins the base tables' snapshots
    and serves from a backing Iceberg table; a base-table append makes
    it STALE (still serving the pinned result — asserted), and REFRESH
    MATERIALIZED VIEW atomically swaps in the recomputation.  The
    returned rows are the post-refresh state over base + appended
    slice."""
    from ..sql import IceSQL

    orders = load(spark, sf, "orders")
    q = IceSQL(spark, _scratch())
    q.sql(
        "CREATE ICEBERG TABLE ot (o_orderkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE)"
    )
    t = q.catalog.load_table("ot")
    t.append(orders.select("o_orderkey", "o_orderstatus", "o_totalprice"))
    q.sql(
        "CREATE MATERIALIZED ICEBERG VIEW gold AS SELECT o_orderstatus,"
        " COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total FROM ot"
        " GROUP BY o_orderstatus"
    )
    before = q.sql("SELECT SUM(n) AS s FROM gold").collect()[0][0]
    t.append(
        orders.filter(F.col("o_orderkey") <= 40).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
    )
    # stale by design: still the pinned materialization
    assert q.sql("SELECT SUM(n) AS s FROM gold").collect()[0][0] == before
    assert not all(
        r["fresh"] for r in q.sql("DESCRIBE MATERIALIZED VIEW gold").collect()
    )
    q.sql("REFRESH MATERIALIZED VIEW gold")
    return q.sql("SELECT * FROM gold ORDER BY o_orderstatus")


@query(
    "ice59_partitioned_adopt",
    oracle=f"""
    SELECT {_ORDER_COLS}
    FROM orders
    WHERE o_orderstatus <> 'P'
    """,
)
def ice59_partitioned_adopt(spark: SparkSession, sf: str) -> DataFrame:
    """PARTITIONED metadata-only migration (docs/11:174-183 +
    table.py::_adoption_partition): a hive-style ``o_orderstatus=X``
    parquet tree written by a foreign engine adopts via ``add_files``
    into an identity-partitioned table with REAL partition tuples —
    no rewrite, pruning effective immediately (asserted on the plan
    report), and the returned scan must match the oracle recomputing
    from the raw fixture."""
    import glob as _g
    import os as _os

    orders = load(spark, sf, "orders")
    tree = _os.path.join(_scratch(), "tree")
    for status in ("O", "F", "P"):
        # per-group writes KEEP the partition column in the files
        # (Iceberg-style layout) while the directory carries the key
        orders.filter(F.col("o_orderstatus") == status).coalesce(1).write.parquet(
            _os.path.join(tree, f"o_orderstatus={status}")
        )
    t = IceTable.create(
        spark,
        _os.path.join(_scratch(), "t"),
        orders.schema,
        partition_by=[("o_orderstatus", "identity")],
    )
    t.add_files(sorted(_g.glob(f"{tree}/**/*.parquet", recursive=True)))
    # adopted tuples prune: a one-status scan opens only that subtree
    files, rep = t.plan_files(col("o_orderstatus") == "P")
    assert files and all(f.partition["o_orderstatus"] == "P" for f in files)
    assert rep["files_scanned"] < rep["files_total"]
    return t.toDF().filter(F.col("o_orderstatus") != "P")


@query(
    "ice60_auto_distributed_scan",
    oracle=f"""
    SELECT {_ORDER_COLS}
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 1000
    """,
)
def ice60_auto_distributed_scan(spark: SparkSession, sf: str) -> DataFrame:
    """AUTO plan-mode (table.py::_use_distributed_planner): past the
    manifest/file thresholds a scan plans DISTRIBUTED by default — the
    pruning predicate evaluates in Spark over the manifests and the
    driver collects O(selected), the 100 TB planning posture — with no
    opt-in.  Thresholds are shrunk via table properties so the
    fixture-sized table crosses them; the scan log must record the
    distributed planner and the rows must hash-match the oracle
    recomputing from the raw fixture (superset + full re-filter).

    r9: the table is bucket(8)-partitioned on the filter key — the one
    spec shape where min/max stats prune NOTHING (files in a bucket
    span the full key range, docs/07-partitioning.md:51), so the
    asserted files_scanned < files_total proves the distributed
    planner's phase-1 partition-TUPLE pruning (scanplan.py
    partition_match_column), not just the stats phase."""
    orders = load(spark, sf, "orders")
    t = IceTable.create(
        spark,
        _scratch(),
        orders.schema,
        partition_by=[("o_custkey", "bucket[8]")],
        properties={"read.plan-mode.auto.manifest-threshold": "3"},
    )
    # several appends -> several manifests -> auto flips to distributed
    t.append(orders.filter(F.col("o_orderkey") % 3 == 0))
    t.append(orders.filter(F.col("o_orderkey") % 3 == 1))
    t.append(orders.filter(F.col("o_orderkey") % 3 == 2))
    some_key = orders.select("o_custkey").first()[0]
    probe = t.toDF(col("o_custkey") == some_key)
    rep = t._scan_log[-1]
    assert rep.get("planner") == "distributed"
    assert probe.count() >= 1
    # bucket-tuple pruning: an equality on the bucketed key scans only
    # matching-bucket files (min/max stats cannot prune a bucket spec)
    assert rep["files_scanned"] < len(t.live_files())
    out = t.toDF(
        (col("o_orderstatus") == "O") & (col("o_totalprice") > 1000)
    )
    assert t._scan_log[-1].get("planner") == "distributed"
    return out


@query(
    "ice61_dedup_keep_best",
    oracle="""
    WITH all_docs AS (
      SELECT doc_id, lang, text, CAST(doc_id % 13 AS DOUBLE) AS score
      FROM documents
      UNION ALL
      SELECT doc_id + 1000000, lang, text,
             CAST((doc_id + 1000000) % 13 AS DOUBLE)
      FROM documents WHERE doc_id % 5 = 0
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY text ORDER BY score DESC, doc_id ASC
      ) AS rn FROM all_docs
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(ROUND(SUM(score), 6) AS DOUBLE) AS total_score
    FROM ranked WHERE rn = 1
    GROUP BY lang
    """,
)
def ice61_dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """KEEP-BEST dedup as a table maintenance commit
    (icepack.dedup.dedupe_table(keep='best'); the x23 curation rule —
    docs/12-lakehouse-patterns.md:57-83's silver cleansing — keeping
    the HIGHEST-QUALITY copy per duplicate group instead of the
    oldest): a documents table polluted with re-ingested copies whose
    quality scores DIFFER from the originals dedupes in place;
    survivor per content-hash group = max(score), ties → min(doc_id).
    The returned state aggregates BOTH the count and the score sum per
    lang, so the oracle verifies the RIGHT rows survived — a min-id
    survivor set has the same counts but a different score sum."""
    docs = load(spark, sf, "documents").select("doc_id", "lang", "text")
    from ..dedup import dedupe_table

    scored = docs.withColumn(
        "score", (F.col("doc_id") % 13).cast("double")
    )
    copies = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
        .withColumn("score", (F.col("doc_id") % 13).cast("double"))
    )
    t = IceTable.create(
        spark, _scratch(), scored.schema,
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.append(scored.unionByName(copies))
    dedupe_table(t, keep="best", quality_col="score")
    return t.toDF().groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum("score"), 6).alias("total_score"),
    )


@query(
    "ice62_decimal_truncate",
    oracle="""
    WITH priced AS (
      SELECT CAST(o_totalprice AS DECIMAL(12,2)) AS price FROM orders
    ),
    binned AS (
      SELECT CAST(price * 100 AS BIGINT)
             - (CAST(price * 100 AS BIGINT) % 1000000) AS bin,
             CAST(price * 100 AS BIGINT) AS cents
      FROM priced
    )
    SELECT bin, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def ice62_decimal_truncate(spark: SparkSession, sf: str) -> DataFrame:
    """T1/F6 (r10): spec-arithmetic ``truncate[W]`` on a DECIMAL
    partition column (Iceberg spec "Partition Transforms": unscaled
    v - (v mod W); docs/07-partitioning.md:42-52).  Orders are CTAS'd
    into a table hidden-partitioned by truncate[1000000] of the
    decimal(12,2) price (10000.00-wide bins, partition value = the
    truncated UNSCALED long); a point predicate on the natural column
    must prune to a single bin, and the returned per-bin aggregate is
    recomputed by the oracle in exact integer cents — so both the
    partition VALUES and the routed rows are value-checked.  The same
    transform exports 1:1 as spec Avro decimal bytes
    (tests/test_decimal.py)."""
    orders = load(spark, sf, "orders").select(
        F.col("o_totalprice").cast("decimal(12,2)").alias("price")
    )
    t = IceTable.create(
        spark,
        _scratch(),
        orders.schema,
        partition_by=[("price", "truncate[1000000]")],
    )
    t.append(orders)
    # hidden-partition pruning on the natural decimal column: one bin
    import decimal as _dec

    _, rep = t.plan_files(col("price") == _dec.Decimal("100000.00"))
    assert rep["files_scanned"] <= 1 < rep["files_total"]
    df = t.toDF()
    cents = (F.col("price") * F.lit(100)).cast("long")
    return (
        df.select(
            (cents - F.pmod(cents, F.lit(1_000_000))).alias("bin"),
            cents.alias("cents"),
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("sum_cents"))
        .orderBy("bin")
    )


@query(
    "ice63_dv_v3_export",
    oracle="""
    SELECT CAST(o_custkey % 10 AS BIGINT) AS bucket,
           COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders
    WHERE o_orderkey >= 100 AND NOT (o_orderkey >= 150 AND o_orderkey < 300)
    GROUP BY bucket ORDER BY bucket
    """,
)
def ice63_dv_v3_export(spark: SparkSession, sf: str) -> DataFrame:
    """M12/S13 (r11, VERDICT r10 item 3): deletion vectors survive spec
    export as Iceberg FORMAT VERSION 3.  A MOR table takes a position
    delete, consolidates to deletion vectors (one roaring blob per data
    file in a Puffin container), then takes ANOTHER position delete —
    so the v3 export must both reference the native Puffin zero-copy
    AND merge the newer parquet tombstones into fresh
    ``deletion-vector-v1`` blobs (v3 allows at most one DV per data
    file and forbids position-delete parquet).  The export is re-read
    with the independent spec reader and must match the native scan
    row-for-row; the returned aggregate is computed FROM THE EXTERNAL
    READ, so the oracle value-checks the v3 tree itself.  Public spec:
    "Delete Formats" / Puffin ``deletion-vector-v1``
    (docs/11-multi-engine-compatibility.md:31-42)."""
    import glob as _glob
    import json as _json
    import os as _os

    from ..iceberg_export import export_iceberg
    from ..iceberg_import import read_iceberg
    from ..maintenance import write_deletion_vectors

    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    t = IceTable.create(
        spark, _scratch(), orders.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(orders)
    t.delete(col("o_orderkey") < 100)
    if write_deletion_vectors(t) is None:
        raise RuntimeError("DV consolidation found nothing to consolidate")
    # fresh tombstones AFTER consolidation, hitting the same data files
    t.delete((col("o_orderkey") >= 150) & (col("o_orderkey") < 300))
    mpath = export_iceberg(t, format_version=3)
    md = _json.load(open(mpath))
    if md["format-version"] != 3 or "next-row-id" not in md:
        raise RuntimeError("export did not produce v3 metadata")
    dest = _os.path.dirname(mpath)
    # v3 invariants on the exported tree: no position-delete parquet,
    # at least one consolidated Puffin for the post-DV tombstones
    if _glob.glob(_os.path.join(dest, "delete-*.parquet")):
        raise RuntimeError("v3 export wrote position-delete parquet")
    if not _glob.glob(_os.path.join(dest, "dv-*.puffin")):
        raise RuntimeError("v3 export wrote no consolidated Puffin")
    # r12 (ADVICE r11 medium): v3 manifest lists must ASSIGN field-520
    # first_row_id on every data manifest (null only on deletes) —
    # strict external readers run row-id inheritance from it
    from ..avroenc import read_container_with_meta as _rc

    for lp in _glob.glob(_os.path.join(dest, "snap-*.avro")):
        with open(lp, "rb") as fh:
            _sch, lrecs, _m = _rc(fh.read())
        for r in lrecs:
            want_null = r["content"] == 1
            if (r.get("first_row_id") is None) != want_null:
                raise RuntimeError(
                    f"v3 manifest-list row-id assignment wrong in {lp}: "
                    f"content={r['content']} first_row_id={r.get('first_row_id')}"
                )
    ext = read_iceberg(spark, dest).select("o_orderkey", "o_custkey")
    native = t.toDF().select("o_orderkey", "o_custkey")
    if ext.exceptAll(native).count() or native.exceptAll(ext).count():
        raise RuntimeError("external v3 read diverges from native scan")
    return (
        ext.groupBy((F.col("o_custkey") % 10).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").cast("bigint").alias("sum_key"),
        )
        .orderBy("bucket")
    )


@query(
    "ice64_wide_decimal_truncate",
    oracle="""
    WITH priced AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(25,4)) * 10000000000 + 0.0003
             AS DECIMAL(25,4)) AS amt
      FROM orders
    ),
    binned AS (
      SELECT CAST(amt * 10000 AS HUGEINT) AS u FROM priced
    )
    SELECT CAST((u - (u % 100000000000000000)) / 100000000000000000 AS BIGINT)
           AS bin_e17,
           COUNT(*) AS n
    FROM binned GROUP BY bin_e17 ORDER BY bin_e17
    """,
)
def ice64_wide_decimal_truncate(spark: SparkSession, sf: str) -> DataFrame:
    """T1 (r11, VERDICT r10 item 6): spec-arithmetic ``truncate[W]`` on
    a WIDE decimal partition column — decimal(25,4), unscaled values
    beyond int64 — per the Iceberg spec's unscaled arithmetic
    (v - (v mod W)).  The r6/r10 prefix/void lane is retired: the
    Spark write path truncates in exact decimal arithmetic (the digit
    string IS the unscaled), partition values are arbitrary-precision
    ints, a point predicate on the natural column prunes to ≤2 of the
    bins (raises otherwise), and the v2 export carries the transform
    1:1 (NOT void) with the same rows served back through the
    independent spec reader under a pruning predicate.  The oracle
    recomputes the per-bin counts in DuckDB HUGEINT arithmetic; bins
    are reported as bin/1e17 so the compared values fit BIGINT."""
    import decimal as _decmod
    import json as _json
    import os as _os

    from ..iceberg_export import export_iceberg
    from ..iceberg_import import read_iceberg

    W = 100_000_000_000_000_000  # 1e17 unscaled = 1e13 in value domain
    priced = load(spark, sf, "orders").select(
        (
            F.col("o_totalprice").cast("decimal(25,4)") * F.lit(10_000_000_000)
            + F.lit(_decmod.Decimal("0.0003"))
        )
        .cast("decimal(25,4)")
        .alias("amt")
    )
    t = IceTable.create(
        spark, _scratch(), priced.schema,
        partition_by=[("amt", f"truncate[{W}]")],
    )
    t.append(priced)
    pvals = {f.partition["amt_truncate"] for f in t.live_files()}
    if not any(isinstance(v, int) and abs(v) > 2**63 for v in pvals):
        raise RuntimeError("expected partition values beyond int64")
    # point predicate prunes to at most 2 files (bin + stats boundary)
    probe = t.toDF().select("amt").orderBy("amt").limit(1).first()["amt"]
    if len(t.plan_files(col("amt") == probe)) > 2:
        raise RuntimeError("wide-decimal truncate did not prune")
    # export carries the transform 1:1 and serves the same rows back
    mpath = export_iceberg(t)
    md = _json.load(open(mpath))
    tr = {
        pf["transform"]
        for sp in md["partition-specs"]
        for pf in sp["fields"]
    }
    if f"truncate[{W}]" not in tr:
        raise RuntimeError(f"export degraded the transform: {tr}")
    ext = read_iceberg(
        spark, _os.path.dirname(mpath), where=(col("amt") >= probe)
    )
    if ext.count() != t.toDF(col("amt") >= probe).count():
        raise RuntimeError("external pruned read diverges from native")
    u = (F.col("amt") * F.lit(10_000)).cast("decimal(38,0)")
    return (
        t.toDF()
        .select(((u - F.pmod(u, F.lit(W))) / F.lit(W)).cast("bigint").alias("bin_e17"))
        .groupBy("bin_e17")
        .agg(F.count("*").alias("n"))
        .orderBy("bin_e17")
    )


@query(
    "ice65_row_lineage",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey,
             CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS BIGINT)
               AS row_id,
             CAST(CASE WHEN o_orderkey < 1000 THEN 2 ELSE 1 END AS BIGINT)
               AS last_upd
      FROM orders
    )
    SELECT o_orderkey, row_id, last_upd FROM ranked
    WHERE o_orderkey < 2000 OR o_orderkey >= 3000
    ORDER BY o_orderkey
    """,
)
def ice65_row_lineage(spark: SparkSession, sf: str) -> DataFrame:
    """S13/M12 (r12, VERDICT r11 task 5): Iceberg v3 ROW LINEAGE served
    by the native scan — ``toDF(row_lineage=True)`` resolves
    ``_row_id`` / ``_last_updated_sequence_number`` from the
    manifest-list field-520 assignment (commit-time, specio.
    assign_first_row_ids) with materialized per-row values from
    lineage-preserving rewrites taking precedence.  The table ingests
    orders as ONE sorted file (row ids = rank-1 by construction, which
    is what makes a DuckDB oracle possible), takes a COW UPDATE (every
    row keeps its id; updated rows' last-updated becomes the update's
    sequence number via the null-inherits-new-seq carry), then a FULL
    COMPACTION (data files rewritten; ids must survive through the
    physically materialized lineage columns).  Sequence numbers:
    append=1, update=2, compact=3 — surviving last-updated values stay
    1/2, proving the compaction preserved rather than re-stamped them.
    Public Iceberg v3 spec "Row Lineage"
    (docs/05-snapshots-time-travel.md, docs/11:31-42)."""
    from ..dml import delete, update
    from ..maintenance import compact

    orders = load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    t = IceTable.create(
        spark, _scratch(), orders.schema,
        properties={"format.spec-primary": "true", "format.spec-version": "3"},
    )
    t.append(orders.repartition(1).sortWithinPartitions("o_orderkey"))
    update(
        t,
        col("o_orderkey") < 1000,
        {"o_totalprice": F.col("o_totalprice") + F.lit(1)},
    )
    compact(t, target_file_size=1 << 26)
    # r13 (VERDICT r12 task 4): grow the survival matrix a DV row — a
    # v3 MOR DELETE commits a deletion vector (never position-delete
    # parquet), which masks rows WITHOUT rewriting data: survivors keep
    # both their _row_id and their _last_updated_sequence_number.
    t.set_properties(**{
        "write.delete.mode": "merge-on-read",
        "write.delete.mor.strategy": "position",
    })
    delete(t, (col("o_orderkey") >= 2000) & (col("o_orderkey") < 3000))
    if not [
        f for f in t.live_files(content="all")
        if f.content == "deletion-vectors"
    ]:
        raise RuntimeError("v3 MOR delete did not commit a deletion vector")
    return (
        t.toDF(row_lineage=True)
        .select(
            "o_orderkey",
            F.col("_row_id").alias("row_id"),
            F.col("_last_updated_sequence_number").alias("last_upd"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "ice66_v3_dv_dml",
    oracle="""
    SELECT CAST(o_custkey % 10 AS BIGINT) AS bucket,
           COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders
    WHERE o_orderkey >= 200 AND o_custkey <> 7
    GROUP BY bucket ORDER BY bucket
    """,
)
def ice66_v3_dv_dml(spark: SparkSession, sf: str) -> DataFrame:
    """D3/M12 under Iceberg v3 (VERDICT r12 task 1): on a
    ``format.spec-version=3`` spec-primary table, MOR DELETE commits
    DELETION VECTORS directly — the public v3 spec forbids adding
    position-delete files, so the DML write path routes every position
    tombstone through the distributed roaring-bitmap build
    (icepack/dv.py) and Puffin framing, merging with any prior DV per
    the v3 one-DV-per-file rule.  Pins, in order: (1) a v3 DELETE
    leaves ZERO position-delete parquet in the tree; (2) overlapping
    second DELETE keeps exactly one DV per touched data file; (3)
    equality deletes remain legal in v3 and coexist; (4) the survivors'
    ``_row_id`` values are untouched by DV deletes (DVs never rewrite
    data); (5) the spec tree round-trips through the independent
    ``read_iceberg`` — with row lineage — matching the native scan.
    The returned aggregate is computed FROM THE EXTERNAL READ.
    docs/08-acid-transactions.md:112-116; public Iceberg v3 spec
    "Row-level deletes"."""
    import glob as _glob
    import os as _os

    from ..iceberg_import import read_iceberg

    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    loc = _scratch()
    t = IceTable.create(
        spark, loc, orders.schema,
        properties={
            "format.spec-primary": "true",
            "format.spec-version": "3",
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(orders.repartition(4))
    before = {
        r.o_orderkey: r._row_id for r in t.toDF(row_lineage=True).collect()
    }
    t.delete(col("o_orderkey") < 100)
    t.delete(col("o_orderkey") < 200)  # overlaps: per-file DV merge
    live = t.live_files(content="all")
    if [f for f in live if f.content == "position-deletes"]:
        raise RuntimeError("v3 DML wrote position-delete content")
    if _glob.glob(_os.path.join(loc, "data", "deletes-*", "*.parquet")):
        raise RuntimeError("v3 DML wrote position-delete parquet")
    dvs = [f for f in live if f.content == "deletion-vectors"]
    if not dvs:
        raise RuntimeError("v3 DML DELETE produced no deletion vectors")
    per_file: dict[str, int] = {}
    for d in dvs:
        per_file[d.referenced_data_file] = per_file.get(d.referenced_data_file, 0) + 1
    if max(per_file.values()) != 1:
        raise RuntimeError("v3 one-DV-per-file rule violated")
    # equality deletes stay legal in v3, coexisting with the DVs
    t.set_properties(**{"write.delete.mor.strategy": "equality"})
    t.delete(col("o_custkey") == 7)
    if not [
        f
        for f in t.live_files(content="all")
        if f.content == "equality-deletes"
    ]:
        raise RuntimeError("v3 equality delete did not write an equality file")
    # DV deletes never rewrite data: every survivor keeps its _row_id
    after = {
        r.o_orderkey: r._row_id for r in t.toDF(row_lineage=True).collect()
    }
    if any(before[k] != rid for k, rid in after.items()):
        raise RuntimeError("_row_id changed across DV deletes")
    # independent spec reader parity — plain AND with row lineage
    mdir = _os.path.join(loc, "metadata")
    ext = read_iceberg(spark, mdir).select("o_orderkey", "o_custkey")
    native = t.toDF().select("o_orderkey", "o_custkey")
    if ext.exceptAll(native).count() or native.exceptAll(ext).count():
        raise RuntimeError("external v3 read diverges from native scan")
    ext_lin = {
        r.o_orderkey: r._row_id
        for r in read_iceberg(spark, mdir, row_lineage=True).collect()
    }
    if ext_lin != after:
        raise RuntimeError("external row lineage diverges from native")
    return (
        ext.groupBy((F.col("o_custkey") % 10).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").cast("bigint").alias("sum_key"),
        )
        .orderBy("bucket")
    )


@query(
    "ice67_sql_row_lineage",
    oracle="""
    SELECT c_custkey,
           CAST(c_acctbal AS DOUBLE)
             + CASE WHEN c_custkey < 500 THEN 10.0 ELSE 0.0 END AS acct,
           CAST(CASE WHEN c_custkey < 500 THEN 2 ELSE 1 END AS BIGINT) AS last_upd
    FROM customer ORDER BY c_custkey
    """,
)
def ice67_sql_row_lineage(spark: SparkSession, sf: str) -> DataFrame:
    """S13/§2.2 SQL surface over v3 row lineage (VERDICT r12 task 3):
    the docs' incremental pattern (docs/12-lakehouse-patterns.md:94-104)
    re-expressed over the RESERVED metadata columns THROUGH IceSQL — a
    SELECT that references ``_row_id`` / ``_last_updated_sequence_number``
    scans qualifying (spec-primary v3, non-shadowing) tables with row
    lineage enabled, no Python API required.  Pins: (1) ``_row_id`` is
    SQL-selectable and STABLE across a COW UPDATE (ids compared before
    vs after through SQL itself); (2)
    ``_last_updated_sequence_number`` serves the CDC watermark — the
    oracle recomputes it as INSERT=seq 1 / UPDATE=seq 2 per row."""
    from ..sql import IceSQL

    isql = IceSQL(spark, _scratch())
    load(spark, sf, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("acct")
    ).createOrReplaceTempView("cust_src")
    isql.sql(
        """
        CREATE ICEBERG TABLE db.cust (
            c_custkey BIGINT NOT NULL,
            acct      DOUBLE
        ) TBLPROPERTIES (
            'format.spec-primary'='true', 'format.spec-version'='3'
        )
        """
    )
    isql.sql("INSERT INTO db.cust SELECT * FROM cust_src")
    ids_before = {
        r.c_custkey: r.rid
        for r in isql.sql(
            "SELECT c_custkey, _row_id AS rid FROM cust"
        ).collect()
    }
    isql.sql("UPDATE db.cust SET acct = acct + 10 WHERE c_custkey < 500")
    ids_after = {
        r.c_custkey: r.rid
        for r in isql.sql(
            "SELECT c_custkey, _row_id AS rid FROM cust"
        ).collect()
    }
    if ids_before != ids_after:
        raise RuntimeError("_row_id not stable across COW UPDATE via SQL")
    return isql.sql(
        "SELECT c_custkey, acct, "
        "_last_updated_sequence_number AS last_upd "
        "FROM cust ORDER BY c_custkey"
    )
