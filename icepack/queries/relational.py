"""Relational operator battery (SURVEY.md §2.2-2.7).

Each entry is an idiomatic-Catalyst DataFrame (or SQL) program plus a
DuckDB oracle.  Conventions for oracle-hash stability:

- every computed column is aliased identically on both sides;
- float aggregates are ``ROUND``-ed on both sides (summation order may
  differ between engines in the low bits);
- ``SUM`` over integers is cast to BIGINT in DuckDB (it widens to
  HUGEINT by default, Spark stays at long);
- double→int conversions go through explicit ``floor`` (Spark casts
  truncate, DuckDB casts round — never rely on cast rounding);
- window orderings always include a unique tiebreak column.

Scale notes are inline: which side broadcasts, where the shuffle is,
and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import load, register_views
from . import query

# ---------------------------------------------------------------------------
# §2.2 scans / projections / filters / predicates
# ---------------------------------------------------------------------------


@query(
    "p1_pruned_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity > 45
    """,
)
def p1_pruned_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Projection + filter; Catalyst pushes both into the parquet scan
    (PushedFilters + 3-column ReadSchema — verified in tests/test_plans.py),
    so at 100 TB only matching row groups of 3 columns are read."""
    li = load(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


@query(
    "p3_time_range",
    oracle="""
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
    GROUP BY event_type
    """,
)
def p3_time_range(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-aligned range predicate (docs/09:104-127): with the
    icepack layer this range also prunes day(ts) manifests."""
    ev = load(spark, sf, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-20").cast("timestamp_ntz"))
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "p4_like",
    oracle="""
    SELECT p_brand, COUNT(*) AS n
    FROM part
    WHERE p_type LIKE '%AND%' OR p_name LIKE 'part-1%'
    GROUP BY p_brand
    """,
)
def p4_like(spark: SparkSession, sf: str) -> DataFrame:
    """Non-selective LIKE (the docs' documented anti-pattern: no
    min/max pruning possible; full scan, filter evaluated in codegen)."""
    p = load(spark, sf, "part")
    return (
        p.filter(F.col("p_type").like("%AND%") | F.col("p_name").like("part-1%"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
    )


@query(
    "p5_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def p5_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """VARIANT-style path extraction ``payload:k::INT``
    (docs/12-lakehouse-patterns.md:96-104) via get_json_object."""
    ev = load(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"))
    )


@query(
    "p6_null_handling",
    oracle="""
    SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
           COUNT(*) AS n,
           COUNT(c.c_custkey) AS n_matched
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
      ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def p6_null_handling(spark: SparkSession, sf: str) -> DataFrame:
    """NULL construction via left-join miss + coalesce/isnull counting
    (fixtures themselves have no NULLs)."""
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer").filter(F.col("c_acctbal") > 5000)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .groupBy(F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"))
        .agg(F.count("*").alias("n"), F.count("c_custkey").alias("n_matched"))
    )


@query(
    "p5_from_json_struct",
    oracle="""
    SELECT event_type,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def p5_from_json_struct(spark: SparkSession, sf: str) -> DataFrame:
    """Typed JSON parsing (from_json with an explicit schema → struct
    column) — the schema-on-read half of the VARIANT story, vs. the
    path-extraction half in p5/x14."""
    ev = load(spark, sf, "events")
    parsed = ev.withColumn("j", F.from_json("props", "k BIGINT"))
    return parsed.groupBy("event_type").agg(
        F.min("j.k").cast("bigint").alias("min_k"),
        F.max("j.k").cast("bigint").alias("max_k"),
    )


@query(
    "a3_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           (ABS(approx_quantile(l_extendedprice, 0.5)
                - quantile_cont(l_extendedprice, 0.5))
              <= 0.05 * quantile_cont(l_extendedprice, 0.5)) AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a3_approx_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-based quantiles (the 100 TB path for medians): engines'
    sketches differ, so the oracle-stable output is the tolerance check
    — approx within 5% of exact, in both engines."""
    li = load(spark, sf, "lineitem")
    approx = F.expr("approx_percentile(l_extendedprice, 0.5, 1000)")
    exact = F.expr("percentile(l_extendedprice, 0.5)")
    return li.groupBy("l_returnflag").agg(
        (F.abs(approx - exact) <= 0.05 * exact).alias("approx_ok")
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@query(
    "j1_inner_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def j1_inner_join(spark: SparkSession, sf: str) -> DataFrame:
    """Fact-fact equi-join on the natural key.  At 100 TB this is a
    shuffle join on l_orderkey/o_orderkey — both sides co-partition on
    the same key, AQE handles skew; bucketing both tables by orderkey
    would eliminate the shuffle entirely (see icepack clustering)."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@query(
    "j2_right_join",
    oracle="""
    SELECT n.n_name, COUNT(s.s_suppkey) AS n_suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def j2_right_join(spark: SparkSession, sf: str) -> DataFrame:
    """Right outer join (J2): every nation survives even with zero
    suppliers.  Catalyst plans it as the mirrored left-outer with the
    small side broadcast."""
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "o1_global_sort",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def o1_global_sort(spark: SparkSession, sf: str) -> DataFrame:
    """Global ORDER BY (O1): a range-partitioned sort (sampled range
    boundaries → per-partition sorts), NOT a single-partition funnel —
    the only globally-sorted output shape that scales.  The driver's
    value-hash is order-insensitive, so correctness rides on content;
    the plan shape is the point (RangePartitioning, no
    Exchange SinglePartition — pinned in tests/test_plans.py)."""
    o = load(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return o.select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price")
    ).orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))


@query(
    "j2_left_join",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def j2_left_join(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    return (
        c.join(li, c.c_custkey == li.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@query(
    "j2_full_outer",
    oracle="""
    SELECT COALESCE(c.k, e.k) AS k,
           COALESCE(c.n_orders, 0) AS n_orders,
           COALESCE(e.n_events, 0) AS n_events
    FROM (SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT user_id AS k, COUNT(*) AS n_events FROM events GROUP BY 1) e
      ON c.k = e.k
    """,
)
def j2_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    """Full-outer over partially-overlapping key domains (custkey 0..10N
    vs user_id 0..N)."""
    o = load(spark, sf, "orders").groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").alias("n_orders")
    )
    e = load(spark, sf, "events").groupBy(F.col("user_id").alias("k")).agg(
        F.count("*").alias("n_events")
    )
    return o.join(e, "k", "full_outer").select(
        F.col("k"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


@query(
    "j3_broadcast_star",
    oracle="""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def j3_broadcast_star(spark: SparkSession, sf: str) -> DataFrame:
    """Star-schema join: every dimension is explicitly broadcast, so the
    100 TB fact table is scanned exactly once with zero shuffle before
    the final (tiny) aggregation — verified BroadcastHashJoin in
    tests/test_plans.py."""
    li = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@query(
    "j4_semi_join",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1998-01-01'
    )
    GROUP BY c.c_mktsegment
    """,
)
def j4_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """EXISTS as left_semi: no row duplication, the orders side is
    reduced before the join (docs/10 orphan-detection uses the anti
    twin)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "j4_anti_join",
    oracle="""
    SELECT p.p_brand, COUNT(*) AS n_unsold
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_partkey = p.p_partkey
        AND l.l_shipdate < TIMESTAMP '1995-07-01'
    )
    GROUP BY p.p_brand
    """,
)
def j4_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp_ntz")
    )
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_unsold"))
    )


@query(
    "j5_range_join",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_parts,
           ROUND(AVG(p.p_retailprice), 2) AS avg_price
    FROM part p
    JOIN region r
      ON p.p_retailprice >= 900 + r.r_regionkey * 20
     AND p.p_retailprice <  920 + r.r_regionkey * 20
    GROUP BY r.r_name
    """,
)
def j5_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Theta (band) join: non-equi condition forces a nested-loop
    strategy; keeping the band table broadcast-small (5 rows) makes it
    BroadcastNestedLoopJoin — the only sane plan at 100 TB."""
    p = load(spark, sf, "part")
    r = load(spark, sf, "region")
    cond = (p.p_retailprice >= 900 + r.r_regionkey * 20) & (
        p.p_retailprice < 920 + r.r_regionkey * 20
    )
    return (
        p.join(F.broadcast(r), cond)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_parts"), F.round(F.avg("p_retailprice"), 2).alias("avg_price"))
    )


@query(
    "j5_interval_bin_join",
    oracle="""
    WITH e AS (
      SELECT event_id,
             TIMESTAMP '1995-01-01' + to_days(CAST(event_id % 2400 AS INT)) AS mts
      FROM events
    )
    SELECT CAST(date_trunc('month', e.mts) AS TIMESTAMP) AS m,
           COUNT(*) AS n_matches,
           COUNT(DISTINCT o.o_orderkey) AS n_orders
    FROM e JOIN orders o
      ON e.mts >= o.o_orderdate AND e.mts < o.o_orderdate + INTERVAL 7 DAY
    GROUP BY 1
    """,
)
def j5_interval_bin_join(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-interval join where BOTH sides are fact-sized — the
    case j5's broadcast nested loop cannot handle at 100 TB.  Because
    interval width is bounded (7 days), each interval overlaps at most
    2 week-bins: explode intervals into their bins, equi-join points on
    the bin, then apply the exact range as a residual filter.  The plan
    is a plain hash join on the bin key — shuffle-partitionable, AQE-
    skew-splittable — instead of an O(n·m) nested loop."""
    W = 7  # bin width = max interval width, in days
    ev = load(spark, sf, "events").select(
        "event_id",
        F.expr(
            "timestamp'1995-01-01' + make_interval(0,0,0,cast(event_id % 2400 as int),0,0,0)"
        ).alias("mts"),
    )
    pts = ev.withColumn(
        "pd", F.datediff(F.to_date("mts"), F.lit("1995-01-01").cast("date"))
    ).withColumn("bin", F.floor(F.col("pd") / W))
    o = load(spark, sf, "orders").withColumn(
        "ds", F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
    )
    iv = o.withColumn(
        "bin", F.explode(F.sequence(F.floor(F.col("ds") / W), F.floor((F.col("ds") + W - 1) / W)))
    )
    return (
        pts.join(iv, "bin")
        .filter((F.col("pd") >= F.col("ds")) & (F.col("pd") < F.col("ds") + W))
        .groupBy(F.date_trunc("month", "mts").cast("timestamp_ntz").alias("m"))
        .agg(
            F.count("*").alias("n_matches"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@query(
    "j7_asof_join",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id,
             TIMESTAMP '1995-01-01' + to_days(CAST(event_id % 2400 AS INT)) AS mts
      FROM events
    )
    SELECT e.event_id, e.user_id, MAX(o.o_orderdate) AS asof_date
    FROM e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.mts
    GROUP BY e.event_id, e.user_id
    """,
)
def j7_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (nearest prior order per event) via the scalable
    union+window pattern: one shuffle on the key, last(ignorenulls) over
    an ordered frame — no range-join row explosion, unlike the
    join-and-aggregate formulation the oracle uses.  Events are mapped
    into the orders' date domain to make the as-of nontrivial."""
    ev = load(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.expr(
            "timestampadd(DAY, CAST(event_id % 2400 AS INT), TIMESTAMP_NTZ '1995-01-01')"
        ).alias("mts"),
    )
    o = load(spark, sf, "orders")
    # union probes and quotes; quotes sort first on ties (kind 0 < 1)
    quotes = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderdate").alias("odate"),
    )
    probes = ev.select(
        F.col("user_id").alias("k"),
        F.col("mts").alias("t"),
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast("timestamp_ntz").alias("odate"),
    )
    w = (
        W.partitionBy("k")
        .orderBy("t", "kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = quotes.unionByName(probes).withColumn(
        "asof_date", F.last("odate", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("kind") == 1).select(
        "event_id", F.col("k").alias("user_id"), "asof_date"
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@query(
    "a1_groupby_count",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderstatus
    """,
)
def a1_groupby_count(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.countDistinct("o_custkey").alias("n_customers")
    )


@query(
    "a4_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a4_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 (the flagship): partial aggregation map-side reduces the
    100 TB scan to <10 groups per task before the single tiny shuffle."""
    li = load(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "a0_gold_daily",
    oracle="""
    SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS order_month,
           c.c_mktsegment,
           COUNT(*) AS n_items,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
    """,
)
def a0_gold_daily(spark: SparkSession, sf: str) -> DataFrame:
    """The gold-layer aggregate the reference builds its lakehouse
    around (docs/12-lakehouse-patterns.md:107-126), on TPC-H-ish
    fixtures: fact⋈fact⋈dim with a date-range filter, monthly rollup
    per segment.  Customer broadcasts; the lineitem⋈orders shuffle is
    the one unavoidable wide dependency."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = load(spark, sf, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"),
            "c_mktsegment",
        )
        .agg(
            F.count("*").alias("n_items"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@query(
    "a4_tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate  > TIMESTAMP '1997-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def a4_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 (shipping priority, adapted — fixtures carry no
    o_shippriority).  The segment filter reaches the customer scan;
    at 100 TB the filtered customer key-set still scales with SF so we
    leave the build-side choice to AQE rather than forcing a broadcast.
    Top-10 runs as TakeOrderedAndProject: per-partition heaps, no
    global sort."""
    c = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp_ntz")
    )
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "a4_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o.o_orderpriority
    """,
)
def a4_tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking, adapted: the fixtures carry
    no commit/receipt dates, so the EXISTS tests for a returned line).
    EXISTS compiles to a left-semi join — the probe side is the
    date-filtered quarter of orders, the build side ships only
    lineitem's key column after its pushed returnflag filter."""
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey"
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "a4_tpch_q5",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def a4_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume): the full 6-way star.  nation
    and region are fixed-cardinality (25/5 rows at any SF) so they are
    explicitly broadcast; the region filter then prunes supplier rows
    *before* the fact join, shrinking the only wide shuffle
    (lineitem⋈orders) probe side."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf, "lineitem")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    s = (
        load(spark, sf, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        # the composite supplier⋈nation⋈region side is dim-sized at any
        # SF, but join-size estimation loses that after two joins and
        # falls back to sort-merge, shuffling the enriched fact —
        # broadcast explicitly (measured 15-20% here, a full fact
        # exchange saved at scale)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "a4_tpch_q6",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def a4_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue): pure scan-filter-aggregate.  All
    three conjuncts push to the parquet reader; at 100 TB this is the
    canonical row-group-skipping query — zero shuffles beyond the
    single-row final agg."""
    li = load(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@query(
    "a4_tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def a4_tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations).  The two nation
    dims broadcast; the nation-pair disjunction is applied after both
    broadcasts but before the aggregate, so only qualifying rows reach
    the groupBy shuffle."""
    s = load(spark, sf, "supplier")
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "a4_tpch_q8",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    ) all_nations
    GROUP BY o_year
    """,
)
def a4_tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 (national market share, adapted to fixture domains):
    an 8-way join where every dimension filter (region, part type,
    date range) is applied BEFORE its join so the two fact shuffles
    see minimum rows; both nation aliases and region broadcast; the
    share is one conditional aggregation, not two scans."""
    p = load(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    c = load(spark, sf, "customer")
    s = load(spark, sf, "supplier")
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "a4_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def a4_tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 (customer distribution, adapted: no o_comment filter
    in the fixtures).  The double aggregation: per-customer order
    counts (left join keeps zero-order customers), then the histogram
    of those counts — the second groupBy's input is one row per
    customer, so the wide work is only the first join+agg."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "a4_tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def a4_tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 (returned items): quarter of orders ⋈ returned
    lineitems, revenue per customer, top-20.  Both fact-side filters
    (date range, returnflag) push down; nation broadcasts; top-20 is a
    TakeOrderedAndProject, never a full sort."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "a4_tpch_q14",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
                   / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def a4_tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 (promotion effect, adapted: fixture p_type is a plain
    category so the predicate is equality, not LIKE 'PROMO%').  part is
    a key-complete dim that AQE broadcast-converts below threshold;
    conditional aggregation computes both sums in ONE pass — no
    self-join, no second scan."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    p = load(spark, sf, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "a4_tpch_q18",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 350
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def a4_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers).  The literal SQL shape scans
    lineitem twice (HAVING subquery + outer re-aggregate); since one
    order = one output row, the per-order pre-aggregate IS the final
    total — so lineitem is scanned, shuffled, and aggregated exactly
    once, and the filtered survivors (selective by construction) drive
    the joins.  At 100 TB that halves the dominant fact I/O."""
    li = load(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 350)
    )
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("q"), 2).alias("total_qty"),
        )
    )


@query(
    "a4_tpch_q17",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def a4_tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue).  The correlated AVG
    subquery is decorrelated by hand into ONE per-part aggregate joined
    back — the aggregate and the probe share the l_partkey hash
    partitioning, and the brand filter shrinks the probe before the
    join.  Never evaluate a correlated subquery per row at 100 TB."""
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(F.col("p_brand") == "Brand#1")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_q, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "a4_tpch_q22",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1998-01-01')
    GROUP BY n.n_name
    """,
)
def a4_tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 (global-sales-opportunity, adapted: fixtures carry no
    c_phone so grouping is by nation, and every customer has SOME order
    so the lapse test is "no order since 1998").  The scalar average is
    computed once (tiny driver value), the NOT EXISTS is a left-anti
    join against orders' key column only — the anti side ships just
    o_custkey through its shuffle, and the rich customer columns never
    move twice."""
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("a")).first()["a"]
    )
    o_keys = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    return (
        c.filter(F.col("c_acctbal") > avg_bal)
        .join(o_keys, c.c_custkey == o_keys.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "a4_tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def a4_tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 (top supplier).  The revenue "view" is one partial+final
    hash aggregate over the quarter's lineitem slice; its output is
    supplier-cardinality (tiny next to the fact), so the scalar MAX and
    the equality probe are both broadcast joins against that aggregate —
    the 100 TB fact is scanned exactly once.  Revenue is rounded BEFORE
    the max-equality compare on both sides so float summation-order
    noise can't flip which supplier wins."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "a4_tpch_q9",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS profit
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def a4_tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 (product-type profit, adapted: fixtures carry no
    partsupp, so profit omits the ps_supplycost * l_quantity term and
    the name filter matches the fixture's color-word naming ('%red%' for TPC-H's '%green%')).  supplier,
    part and nation are key-complete dims — all three broadcast, so the
    only shuffle is lineitem⋈orders on l_orderkey, then the group-by
    re-shuffles the (nation, year) aggregate, which is tiny after
    partial aggregation."""
    li = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    p = load(spark, sf, "part").filter(F.col("p_name").like("%red%"))
    o = load(spark, sf, "orders")
    n = load(spark, sf, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("profit")
        )
    )


@query(
    "a4_tpch_q19",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1  AND 11 AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#3'  AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)
    """,
)
def a4_tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, adapted: fixtures carry no
    p_container / l_shipmode / l_shipinstruct, so the disjunction keeps
    the brand + quantity + size arms).  The OR-of-conjuncts references
    both sides, so it can't be a join key — but part broadcasts, the
    per-arm part predicates (brand, size) are pushed below the join,
    and the quantity range l_quantity BETWEEN 1 AND 30 (the union of
    the arms) is pushed into the lineitem scan, so the fact rows that
    enter the nested-loop residual are already range-pruned."""
    p = load(spark, sf, "part").filter(
        (
            (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
        )
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15))
    )
    li = load(spark, sf, "lineitem").filter(F.col("l_quantity").between(1, 30))
    arm = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(arm)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "a4_tpch_q2",
    oracle="""
    WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY l.l_partkey, l.l_suppkey),
    best AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost FROM cost GROUP BY l_partkey)
    SELECT p.p_partkey, p.p_name,
           ROUND(b.min_cost, 4) AS min_cost,
           MIN(c.l_suppkey) AS s_suppkey
    FROM part p
    JOIN best b ON b.l_partkey = p.p_partkey
    JOIN cost c ON c.l_partkey = p.p_partkey AND c.unit_cost = b.min_cost
    WHERE p.p_type = 'SMALL' AND p.p_size <= 10
    GROUP BY p.p_partkey, p.p_name, b.min_cost
    """,
)
def a4_tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier, adapted: the fixtures have no
    partsupp table, so lineitem stands in as the part↔supplier
    relation with unit cost = min(l_extendedprice / l_quantity); no
    s_address/comment columns to project).  The correlated MIN
    subquery decorrelates into one per-part aggregate joined back —
    both aggregates and the join share the l_partkey hash
    partitioning, so the whole decorrelation costs ONE exchange of the
    (partkey, suppkey) cost table.  region→nation→supplier reduce
    to a broadcast of the qualifying supplier keys; ties on min cost
    resolve to MIN(suppkey) deterministically (hash-stable)."""
    sup = (
        load(spark, sf, "supplier")
        .join(F.broadcast(load(spark, sf, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(load(spark, sf, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey")
    )
    cost = (
        load(spark, sf, "lineitem")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = load(spark, sf, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 10)
    )
    return (
        cost.join(
            best,
            (cost.l_partkey == F.col("b_partkey"))
            & (cost.unit_cost == F.col("min_cost")),
        )
        .join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name", "min_cost")
        .agg(F.min("l_suppkey").alias("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            F.round("min_cost", 4).alias("min_cost"),
            "s_suppkey",
        )
    )


@query(
    "a4_tpch_q11",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_1'
      GROUP BY l.l_partkey)
    SELECT l_partkey, ROUND(value, 2) AS value
    FROM val
    WHERE value > (SELECT SUM(value) * 0.002 FROM val)
    """,
)
def a4_tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 (important stock, adapted: no partsupp — per-part
    value = shipped revenue by NATION_1's suppliers).  The fraction
    threshold is a scalar over the SAME aggregate, computed once as a
    tiny driver value — never a per-row correlated subquery.  The two
    actions each run the scan+aggregate (separate jobs don't share
    shuffle files); at 100 TB you'd persist the per-part aggregate (it
    is output-sized, partkey-hashed) before both consumers — the same
    pattern q15/q22 use for their scalar legs."""
    nat_sup = (
        load(spark, sf, "supplier")
        .join(F.broadcast(load(spark, sf, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_1")
        .select("s_suppkey")
    )
    val = (
        load(spark, sf, "lineitem")
        .join(F.broadcast(nat_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    threshold = val.agg((F.sum("value") * 0.002).alias("t")).first()["t"]
    return val.filter(F.col("value") > threshold).select(
        "l_partkey", F.round("value", 2).alias("value")
    )


@query(
    "a4_tpch_q12",
    oracle="""
    SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                THEN 'LATE' ELSE 'ON TIME' END AS ship_bucket,
           CAST(COUNT(*) FILTER (o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
                AS BIGINT) AS high_line_count,
           CAST(COUNT(*) FILTER (o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def a4_tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / priority, adapted: no l_shipmode or
    commit/receipt dates — the bucket is ship latency vs order date).
    orders↔lineitem is the one real shuffle (both sides hashed on the
    order key); the priority classification is a conditional COUNT
    inside the same aggregate, so there is exactly one exchange after
    the join and the result is 2 rows."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.when(late, "LATE").otherwise("ON TIME").alias("ship_bucket"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "a4_tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 2, 3, 4, 5, 6, 7, 8)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def a4_tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 (supplier diversity per part attribute, adapted: no
    partsupp — lineitem is the relation; the complaint-comment
    exclusion becomes negative-balance suppliers).  The excluded
    supplier set is tiny → broadcast LEFT ANTI; part filters push to
    the broadcast side's scan; COUNT(DISTINCT suppkey) runs as the
    standard two-phase distinct aggregate on the (brand, type, size)
    hash partitioning."""
    bad = load(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = load(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(list(range(1, 9)))
    )
    return (
        load(spark, sf, "lineitem")
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "a4_tpch_q20",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
      GROUP BY l.l_suppkey)
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
    WHERE n.n_name = 'NATION_1'
      AND sh.qty > (SELECT AVG(qty) * 0.5 FROM shipped)
    """,
)
def a4_tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion, adapted: no partsupp /
    availqty — a NATION_1 supplier qualifies when its shipped quantity
    of 'blue%' parts exceeds half the average supplier's).  The part
    filter broadcasts into a LEFT SEMI on the fact scan; per-supplier
    totals are one map-combinable aggregate; the threshold is a scalar
    (driver value) and the supplier dimension broadcasts — the fact
    table crosses exactly one exchange."""
    blue = load(spark, sf, "part").filter(F.col("p_name").like("blue%")).select("p_partkey")
    shipped = (
        load(spark, sf, "lineitem")
        .join(F.broadcast(blue), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    threshold = shipped.agg((F.avg("qty") * 0.5).alias("t")).first()["t"]
    sup = (
        load(spark, sf, "supplier")
        .join(F.broadcast(load(spark, sf, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_1")
        .select("s_suppkey", "s_name")
    )
    return (
        shipped.filter(F.col("qty") > threshold)
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
    )


@query(
    "a4_tpch_q21",
    oracle="""
    WITH per AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY l.l_orderkey, l.l_suppkey),
    ann AS (
      SELECT *,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             SUM(late) OVER (PARTITION BY l_orderkey) AS n_late
      FROM per)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM ann a
    JOIN supplier s ON s.s_suppkey = a.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_1'
      AND a.late = 1 AND a.n_supp > 1 AND a.n_late = 1
    GROUP BY s.s_name
    """,
)
def a4_tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting, adapted: no
    receipt/commit dates — "late" is shipping >60 days after the order
    date; no o_orderstatus filter).  The classic EXISTS/NOT-EXISTS
    pair collapses into ONE window pass: per-(order, supplier) lateness
    aggregates on the order-key partitioning the join already
    established, and both order-level counts are windows over that
    same partitioning — so the plan is join → aggregate → window with
    NO additional exchange, instead of two more self-joins of the
    fact table (which at 100 TB would triple the widest shuffle)."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    per = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    w = W.partitionBy("l_orderkey")
    ann = per.withColumn("n_supp", F.count("*").over(w)).withColumn(
        "n_late", F.sum("late").over(w)
    )
    sup = (
        load(spark, sf, "supplier")
        .join(F.broadcast(load(spark, sf, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_1")
        .select("s_suppkey", "s_name")
    )
    return (
        ann.filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "a5_scalar_subquery",
    oracle="""
    SELECT COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    WHERE l_shipdate > (SELECT MAX(l_shipdate) - INTERVAL 90 DAY FROM lineitem)
    """,
)
def a5_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """High-water-mark incremental pattern (docs/12:94-104): scalar
    subquery over the same table — the core of bronze→silver
    incremental loads."""
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS sum_price
        FROM lineitem
        WHERE l_shipdate > (SELECT MAX(l_shipdate) - INTERVAL 90 DAY FROM lineitem)
        """
    )


@query(
    "a6_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a6_rollup(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_rf"),
        F.grouping("l_linestatus").cast("bigint").alias("g_ls"),
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "a6_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_st, GROUPING(o_orderpriority) AS g_pr,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a6_cube(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("bigint").alias("g_st"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_pr"),
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "a6_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def a6_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "a3_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           (ABS(approx_count_distinct(l_orderkey) - COUNT(DISTINCT l_orderkey))
             <= 0.1 * COUNT(DISTINCT l_orderkey)) AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a3_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL sketches differ across engines, so the oracle-stable output
    is the *tolerance check*: approx within 10% of exact.  At 100 TB
    approx_count_distinct replaces the expensive exact two-phase
    distinct with a fixed-size mergeable sketch."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (
            F.abs(F.approx_count_distinct("l_orderkey", 0.02) - F.countDistinct("l_orderkey"))
            <= 0.1 * F.countDistinct("l_orderkey")
        ).alias("approx_ok")
    )


@query(
    "a7_stat_aggs",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(quantile_cont(l_quantity, 0.5), 2) AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a7_stat_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregate family (stddev/variance/correlation/
    covariance/median) — engine-parity surface beyond plain SUM/AVG."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 2).alias("median_qty"),
    )


@query(
    "a8_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a8_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT (gold-layer reporting shape): explicit value list keeps it
    a single pass — no extra distinct-values job at 100 TB."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


# ---------------------------------------------------------------------------
# §2.5 window functions
# ---------------------------------------------------------------------------


@query(
    "w1_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice,
           CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def w1_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k per group: the rank window prunes to k rows per partition
    (Spark pushes a WindowGroupLimit at planning time), so only k rows
    per group survive the shuffle."""
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "w2_lag_gap",
    oracle="""
    SELECT c_mktsegment, ROUND(AVG(gap_days), 3) AS avg_gap_days, COUNT(*) AS n_gaps
    FROM (
      SELECT c.c_mktsegment,
             date_diff('day',
                       LAG(o.o_orderdate) OVER (PARTITION BY o.o_custkey
                                                ORDER BY o.o_orderdate, o.o_orderkey),
                       o.o_orderdate) AS gap_days
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE gap_days IS NOT NULL
    GROUP BY c_mktsegment
    """,
)
def w2_lag_gap(spark: SparkSession, sf: str) -> DataFrame:
    """lag() over a totally-ordered per-key frame (tiebreak on the
    unique orderkey keeps both engines deterministic)."""
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("gap_days", F.datediff("o_orderdate", F.lag("o_orderdate").over(w)))
        .filter(F.col("gap_days").isNotNull())
    )
    return gaps.groupBy("c_mktsegment").agg(
        F.round(F.avg("gap_days"), 3).alias("avg_gap_days"), F.count("*").alias("n_gaps")
    )


@query(
    "w3_running_sum",
    oracle="""
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND CURRENT ROW), 2) AS run_spend
    FROM orders
    """,
)
def w3_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("run_spend")
    )


@query(
    "w3_range_frame",
    oracle="""
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', TIMESTAMP '1990-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM orders
    """,
)
def w3_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE frame over a day offset: value-defined frames are
    deterministic even under order ties (the frame is a function of the
    value, not the row position)."""
    o = load(spark, sf, "orders")
    day_off = F.datediff("o_orderdate", F.lit("1990-01-01").cast("timestamp_ntz"))
    w = W.partitionBy("o_custkey").orderBy(day_off).rangeBetween(-30, 0)
    return o.select(
        "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d")
    )


@query(
    "w1_rank_family",
    oracle="""
    SELECT o_orderkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def w1_rank_family(spark: SparkSession, sf: str) -> DataFrame:
    """The full ranking family (rank/dense_rank/ntile/percent_rank/
    cume_dist) over a totally-ordered frame."""
    o = load(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
    )
    w = W.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "w5_value_windows",
    oracle="""
    SELECT o_orderkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price,
           ROUND(LAST_VALUE(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS last_price,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w5_value_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Value windows (first_value / last_value / nth_value): each
    customer's first, last, and second order price attached to every
    order row.  last/nth use an unbounded-following frame — the default
    frame would stop at CURRENT ROW and silently return the running
    last, a classic window-frame bug both engines agree on here.  The
    unique orderkey tiebreak keeps the frame total-ordered."""
    o = load(spark, sf, "orders")
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = wo.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.round(F.first("o_totalprice").over(wo), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(wfull), 2).alias("second_price"),
    )


@query(
    "a5_correlated_subquery",
    oracle="""
    SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS price
    FROM orders o
    WHERE o.o_totalprice > 2 * (
      SELECT AVG(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def a5_correlated_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated scalar subquery (orders beating 2× their customer's
    average) — Catalyst decorrelates it into an aggregate + join, which
    is exactly the plan you'd hand-write at 100 TB."""
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS price
        FROM orders o
        WHERE o.o_totalprice > 2 * (
          SELECT AVG(o2.o_totalprice) FROM orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / limits / set ops
# ---------------------------------------------------------------------------


@query(
    "o2_top_n",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def o2_top_n(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-N compiles to TakeOrderedAndProject: each task keeps
    its local top-10, the driver merges — no global sort at 100 TB."""
    o = load(spark, sf, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@query(
    "o3_union_all",
    oracle="""
    SELECT tier, o_orderstatus, COUNT(*) AS n FROM (
      SELECT 'hot' AS tier, o_orderstatus FROM orders
      WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      UNION ALL
      SELECT 'cold' AS tier, o_orderstatus FROM orders
      WHERE o_orderdate < TIMESTAMP '1999-01-01'
    ) GROUP BY tier, o_orderstatus
    """,
)
def o3_union_all(spark: SparkSession, sf: str) -> DataFrame:
    """Hot+cold hybrid view (docs/12:169-172) as unionByName."""
    o = load(spark, sf, "orders")
    cut = F.lit("1999-01-01").cast("timestamp_ntz")
    hot = o.filter(F.col("o_orderdate") >= cut).select(
        F.lit("hot").alias("tier"), "o_orderstatus"
    )
    cold = o.filter(F.col("o_orderdate") < cut).select(
        F.lit("cold").alias("tier"), "o_orderstatus"
    )
    return hot.unionByName(cold).groupBy("tier", "o_orderstatus").agg(F.count("*").alias("n"))


@query(
    "o4_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def o4_intersect(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    y95 = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    ).select(F.col("o_custkey").alias("custkey"))
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select(F.col("o_custkey").alias("custkey"))
    return y95.intersect(y96)


@query(
    "o4_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def o4_except(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    y95 = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    ).select(F.col("o_custkey").alias("custkey"))
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select(F.col("o_custkey").alias("custkey"))
    # subtract == SQL EXCEPT (distinct set semantics); exceptAll would be
    # the multiset variant and diverges whenever a key repeats on the left
    return y95.subtract(y96)


# ---------------------------------------------------------------------------
# §2.7 scalar functions
# ---------------------------------------------------------------------------


@query(
    "f1_date_trunc",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY 1
    """,
)
def f1_date_trunc(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"))
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


@query(
    "f2_date_parts",
    oracle="""
    SELECT CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
           CAST(dayofmonth(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2, 3, 4
    """,
)
def f2_date_parts(spark: SparkSession, sf: str) -> DataFrame:
    """The year/month/day/hour partition transforms (docs/07:44-52) as
    scalar extraction."""
    ev = load(spark, sf, "events")
    return ev.groupBy(
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("m"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
        F.hour("ts").cast("bigint").alias("h"),
    ).agg(F.count("*").alias("n"))


@query(
    "f3_date_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + to_days(30) AS due_ts,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k
    FROM orders
    WHERE o_orderdate + to_days(30) < TIMESTAMP '1996-01-01'
    """,
)
def f3_date_arith(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    due = F.expr("timestampadd(DAY, 30, o_orderdate)")
    return (
        o.withColumn("due_ts", due)
        .filter(F.col("due_ts") < F.lit("1996-01-01").cast("timestamp_ntz"))
        .select(
            "o_orderkey",
            "due_ts",
            F.datediff(F.lit("2000-01-01").cast("timestamp_ntz"), F.col("o_orderdate"))
            .cast("bigint")
            .alias("days_to_y2k"),
        )
    )


@query(
    "f4_casts",
    oracle="""
    SELECT CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           TRY_CAST(p_type AS INTEGER) IS NULL AS bad_cast_null,
           CAST(p_size AS VARCHAR) AS size_str,
           COUNT(*) AS n
    FROM part GROUP BY 1, 2, 3
    """,
)
def f4_casts(spark: SparkSession, sf: str) -> DataFrame:
    """Casts incl. try_cast; double→int goes through explicit floor
    (Spark cast truncates, DuckDB cast rounds — never rely on it)."""
    p = load(spark, sf, "part")
    return p.groupBy(
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.expr("try_cast(p_type AS int)").isNull().alias("bad_cast_null"),
        F.col("p_size").cast("string").alias("size_str"),
    ).agg(F.count("*").alias("n"))


@query(
    "f5_strings",
    oracle="""
    SELECT substr(p_name, 1, 6) AS name_prefix,
           upper(p_brand) AS brand_upper,
           CAST(length(p_type) AS BIGINT) AS type_len,
           starts_with(p_name, 'part-1') AS is_p1,
           COUNT(*) AS n
    FROM part GROUP BY 1, 2, 3, 4
    """,
)
def f5_strings(spark: SparkSession, sf: str) -> DataFrame:
    """String family incl. the truncate(W) transform (prefix
    grouping)."""
    p = load(spark, sf, "part")
    return p.groupBy(
        F.substring("p_name", 1, 6).alias("name_prefix"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_type").cast("bigint").alias("type_len"),
        F.col("p_name").startswith("part-1").alias("is_p1"),
    ).agg(F.count("*").alias("n"))


@query(
    "f6_bucket_mod",
    oracle="""
    SELECT o_custkey % 16 AS bucket, COUNT(*) AS n,
           COUNT(DISTINCT o_custkey) AS n_keys
    FROM orders GROUP BY 1
    """,
)
def f6_bucket_mod(spark: SparkSession, sf: str) -> DataFrame:
    """Portable bucket transform (modulo).  The icepack layer's real
    bucket(N) uses xxhash64 (engine-internal, tested via pytest) —
    xxhash64 isn't reproducible in DuckDB so the oracle checks the
    modulo variant."""
    o = load(spark, sf, "orders")
    return o.groupBy(F.pmod("o_custkey", F.lit(16)).alias("bucket")).agg(
        F.count("*").alias("n"), F.countDistinct("o_custkey").alias("n_keys")
    )


@query(
    "f8_explode_words",
    oracle="""
    SELECT lang, word, COUNT(*) AS n
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY lang, word
    HAVING COUNT(*) >= 5
    """,
)
def f8_explode_words(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return (
        d.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
    )


@query(
    "f9_math",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS net_revenue,
           ROUND(AVG(ABS(l_quantity - 25)), 4) AS avg_abs_dev,
           ROUND(SUM(sqrt(l_extendedprice)), 2) AS sum_sqrt,
           ROUND(SUM(pow(l_discount, 2)), 4) AS sum_disc_sq
    FROM lineitem GROUP BY l_returnflag
    """,
)
def f9_math(spark: SparkSession, sf: str) -> DataFrame:
    """NOTE: never ROUND inside a SUM for oracle-compared queries —
    per-row half-boundary rounding disagrees across engines (Spark
    rounds the shortest decimal repr, DuckDB the raw binary) and the
    disagreements accumulate; round once, after aggregation."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "net_revenue"
        ),
        F.round(F.avg(F.abs(F.col("l_quantity") - 25)), 4).alias("avg_abs_dev"),
        F.round(F.sum(F.sqrt("l_extendedprice")), 2).alias("sum_sqrt"),
        F.round(F.sum(F.pow("l_discount", F.lit(2))), 4).alias("sum_disc_sq"),
    )


# ---------------------------------------------------------------------------
# second-wave additions: ordered listagg, FILTER aggregation, ntile,
# date-spine gap fill, unpivot
# ---------------------------------------------------------------------------


@query(
    "a9_listagg",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def a9_listagg(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / STRING_AGG parity).
    ``collect_list`` order is partition-arrival nondeterministic in a
    distributed shuffle, so the list is ``sort_array``-ed before the
    join — the ONLY way an ordered listagg is reproducible at 100 TB
    (never rely on implicit row order surviving an exchange)."""
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


@query(
    "a10_conditional_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_disc,
           CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
           ROUND(SUM(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0.0 END), 2)
             AS taxed_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a10_conditional_agg(spark: SparkSession, sf: str) -> DataFrame:
    """FILTER-clause / conditional aggregation: N different filtered
    measures in ONE scan + one partial/final hash agg — the pattern
    that replaces N self-joined subqueries (each a full rescan at
    100 TB) with branch-free conditional sums inside codegen."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_disc"),
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        F.round(
            F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(0.0)),
            2,
        ).alias("taxed_price"),
    )


@query(
    "w4_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist()    OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def w4_ntile(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution windows (ntile / percent_rank / cume_dist): one
    range shuffle per partition key, all three functions share the
    single sorted window pass.  The ordering carries the unique
    c_custkey tiebreak so ranks are deterministic across engines."""
    c = load(spark, sf, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "f10_date_spine",
    oracle="""
    WITH spine AS (
      SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                         INTERVAL 1 DAY)) AS DATE) AS day
    ), daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS total_price
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <  TIMESTAMP '1995-04-01'
      GROUP BY 1
    )
    SELECT s.day, COALESCE(d.n_orders, 0) AS n_orders,
           COALESCE(d.total_price, 0.0) AS total_price
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
)
def f10_date_spine(spark: SparkSession, sf: str) -> DataFrame:
    """Date-spine gap fill (time-series reporting): generate the
    calendar with ``sequence``+``explode`` (a few hundred rows on the
    driver side of the plan — broadcast), left-join the day-grained
    aggregate onto it, zero-fill the holes.  The fact aggregation is
    the only shuffle; the spine never causes one."""
    o = load(spark, sf, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.expr("sequence(DATE '1995-01-01', DATE '1995-03-31', interval 1 day)")
        ).alias("day")
    )
    daily = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total_price", F.lit(0.0)).alias("total_price"),
    )


@query(
    "o6_unpivot",
    oracle="""
    WITH agg AS (
      SELECT c_mktsegment,
             ROUND(AVG(c_acctbal), 2) AS avg_bal,
             ROUND(MAX(c_acctbal), 2) AS max_bal,
             ROUND(MIN(c_acctbal), 2) AS min_bal
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, 'avg_bal' AS metric, avg_bal AS value FROM agg
    UNION ALL
    SELECT c_mktsegment, 'max_bal' AS metric, max_bal AS value FROM agg
    UNION ALL
    SELECT c_mktsegment, 'min_bal' AS metric, min_bal AS value FROM agg
    """,
)
def o6_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT (wide→long, the inverse of a8_pivot): computed on the
    post-aggregate relation so the melt is a zero-shuffle projection —
    unpivot BEFORE aggregating would triple the exchanged rows."""
    c = load(spark, sf, "customer")
    agg = c.groupBy("c_mktsegment").agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
    )
    return agg.unpivot(
        ids=["c_mktsegment"],
        values=["avg_bal", "max_bal", "min_bal"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "j8_salted_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice, o.o_totalprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def j8_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe salted shuffle join (docs/09:170-181 "join keys need
    good distribution"): the left side is salted into 8 sub-keys and
    the right side replicated across the salt domain, so a hot orderkey
    spreads over 8 reducers instead of funneling into one task.
    Row-equivalent to the plain inner join (the oracle proves it);
    reach for this when the right side is too big to broadcast and the
    skew appears after other operators, where AQE's skew split can't
    see it."""
    from ..skew import salted_shuffle_join

    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = load(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    return salted_shuffle_join(li, o, "l_orderkey", salt=8).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "o_totalprice"
    )


@query(
    "a11_salted_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def a11_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase salted aggregation for power-law keys: partials over
    (key, salt) spread a hot key across 16 tasks, then a tiny second
    aggregate combines the partials.  Result-identical to the plain
    groupBy (the oracle proves it) — the insurance policy for 100 TB
    group-bys whose hottest key would otherwise own one straggler
    task."""
    from ..skew import salted_agg

    ev = load(spark, sf, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        aggs=[F.count("*").alias("n"), F.sum("value").alias("v")],
        combines=[F.sum("n").alias("n"), F.sum("v").alias("v")],
    )
    return out.select("event_type", "n", F.round("v", 2).alias("sum_value"))


@query(
    "j9_null_safe_join",
    oracle="""
    WITH c AS (SELECT NULLIF(c_nationkey % 5, 0) AS k FROM customer),
         s AS (SELECT NULLIF(s_nationkey % 5, 0) AS k FROM supplier)
    SELECT c.k AS bucket, COUNT(*) AS n_pairs
    FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
    GROUP BY c.k
    """,
)
def j9_null_safe_join(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping.  EqualNullSafe is a
    legal hash-join key in Spark, so this stays a broadcast/shuffle
    HASH join — no nested-loop penalty and no COALESCE-to-sentinel hack
    (which would corrupt real sentinel values at 100 TB).  NULLs are
    injected deterministically via NULLIF so both engines build the
    identical key distribution."""
    c = load(spark, sf, "customer").select(
        F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("ck")
    )
    s = load(spark, sf, "supplier").select(
        F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("sk")
    )
    return (
        c.join(F.broadcast(s), c.ck.eqNullSafe(s.sk))
        .groupBy(F.col("ck").alias("bucket"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "o7_nulls_ordering",
    oracle="""
    SELECT o_orderkey, price FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN NULL
                  ELSE ROUND(o_totalprice, 2) END AS price
      FROM orders
    ) ORDER BY price DESC NULLS FIRST, o_orderkey
    LIMIT 500
    """,
)
def o7_nulls_ordering(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit NULLS FIRST placement under a descending top-N: the
    null-price rows (injected on a deterministic key pattern) must beat
    every real price into the limited output — engines default this
    differently (Spark DESC = NULLS LAST), so the modifier is load-
    bearing, not cosmetic.  Shape stays TakeOrderedAndProject: per-
    partition top-500 then a single merge of 500-row heads, never a
    global sort."""
    o = load(spark, sf, "orders")
    price = F.when(F.col("o_orderkey") % 97 == 0, F.lit(None)).otherwise(
        F.round("o_totalprice", 2)
    )
    return (
        o.select("o_orderkey", price.alias("price"))
        .orderBy(F.col("price").desc_nulls_first(), F.asc("o_orderkey"))
        .limit(500)
    )


@query(
    "a12_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.v_ts
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts >= c.c_ts
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT CAST(v.v_ts AS DATE) AS cohort_day,
           COUNT(*) AS n_view_users,
           COUNT(c.user_id) AS n_click_users,
           COUNT(p.user_id) AS n_purchase_users,
           ROUND(COUNT(p.user_id) / CAST(COUNT(*) AS DOUBLE), 4) AS conversion
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    GROUP BY 1
    """,
)
def a12_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): each later stage must
    happen at-or-after the user's earlier stage, cohorted by first-view
    day.  ONE shuffle: events group to their user, the per-user event
    list is scanned with higher-order array functions (filter /
    array_min) to walk the stage sequence in-place — versus the
    oracle's spelling of three self-joins, each a full shuffle of the
    fact table.  Per-task state is one user's events (the same bound
    any sessionizer assumes); a pathological single user is AQE
    skew-split territory, not a plan change."""
    ev = load(spark, sf, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    per_user = ev.groupBy("user_id").agg(
        F.collect_list(F.struct("ts", "event_type")).alias("es")
    )

    def stage_min(evtype, not_before):
        hits = F.filter(
            "es",
            lambda e: (e["event_type"] == evtype)
            & (e["ts"] >= not_before if not_before is not None else F.lit(True)),
        )
        return F.array_min(F.transform(hits, lambda e: e["ts"]))

    staged = (
        per_user.withColumn("v_ts", stage_min("view", None))
        .withColumn("c_ts", stage_min("click", F.col("v_ts")))
        .withColumn("p_ts", stage_min("purchase", F.col("c_ts")))
        .filter(F.col("v_ts").isNotNull())
    )
    return staged.groupBy(F.to_date("v_ts").alias("cohort_day")).agg(
        F.count("*").alias("n_view_users"),
        F.count("c_ts").alias("n_click_users"),
        F.count("p_ts").alias("n_purchase_users"),
        F.round(F.count("p_ts") / F.count("*"), 4).alias("conversion"),
    )


@query(
    "a13_skyline",
    oracle="""
    SELECT p.p_partkey, ROUND(p.p_retailprice, 2) AS price, p.p_size AS psize
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def a13_skyline(spark: SparkSession, sf: str) -> DataFrame:
    """Skyline / Pareto frontier (cheapest price at every size level —
    cf. 'Integration of Skyline Queries into Spark SQL', EDBT 2023):
    parts not dominated by any other part on (min price, max size).

    Two-phase distributed algorithm: phase 1 prunes each partition to a
    LOCAL skyline superset with a sort + linear running-max scan inside
    ``mapInPandas`` (skyline is distributive, so no skyline point is
    ever dropped locally); phase 2 resolves exactly with the dominance
    anti-join over the tiny survivor set.  The naive spelling — the
    oracle's NOT EXISTS — is an O(n²) self-join of the FULL table;
    here the quadratic step only ever sees survivors (≈ frontier-sized
    per partition), which is what makes the operator feasible at
    100 TB."""
    import pandas as pd

    pts = load(spark, sf, "part").select("p_partkey", "p_retailprice", "p_size")

    def local_prune(batches):
        for pdf in batches:
            pdf = pdf.sort_values(
                ["p_retailprice", "p_size"], ascending=[True, False], kind="mergesort"
            )
            best = None
            keep = []
            for size in pdf["p_size"]:
                k = best is None or size >= best
                keep.append(k)
                if best is None or size > best:
                    best = size
            yield pdf[pd.Series(keep, index=pdf.index)]

    cand = pts.mapInPandas(local_prune, schema=pts.schema)
    c, q = cand.alias("c"), cand.alias("q")
    dominated = (
        (F.col("q.p_retailprice") <= F.col("c.p_retailprice"))
        & (F.col("q.p_size") >= F.col("c.p_size"))
        & (
            (F.col("q.p_retailprice") < F.col("c.p_retailprice"))
            | (F.col("q.p_size") > F.col("c.p_size"))
        )
    )
    sky = c.join(q, dominated, "left_anti")
    return sky.select(
        "p_partkey",
        F.round("p_retailprice", 2).alias("price"),
        F.col("p_size").alias("psize"),
    )


@query(
    "a14_cohort_retention",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    first AS (SELECT user_id, MIN(d) AS cohort_day FROM ud GROUP BY 1)
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, ud.d) AS INTEGER) AS k,
           COUNT(*) AS n_users
    FROM ud JOIN first f ON ud.user_id = f.user_id
    WHERE date_diff('day', f.cohort_day, ud.d) <= 7
    GROUP BY 1, 2
    """,
)
def a14_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by first-active day,
    counted on each of the next 7 days they return.  ONE shuffle: the
    distinct user-day set groups to its user, and the per-user day
    array yields (cohort, k) pairs in-place with higher-order functions
    — versus the oracle's spelling of a groupBy plus a join back
    through the fact table (two wide exchanges of event-scale data).
    Per-task state is one user's distinct active days (bounded by the
    date range, not event volume), and the final (cohort_day, k) rollup
    aggregates partially map-side."""
    ev = load(spark, sf, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    per_user = ev.groupBy("user_id").agg(F.collect_set("d").alias("ds"))
    ks = per_user.select(
        F.array_min("ds").alias("cohort_day"),
        F.explode(
            F.expr("transform(ds, d -> datediff(d, array_min(ds)))")
        ).alias("k"),
    )
    return (
        ks.filter(F.col("k") <= 7)
        .groupBy("cohort_day", "k")
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "a15_sessionize_gap",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts,
             CASE WHEN date_diff('second',
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    ts) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM o
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS sess_start, MAX(ts) AS sess_end
    FROM s GROUP BY 1, 2
    """,
)
def a15_sessionize_gap(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity boundary) as the
    manual window composition: lag to detect gaps, running sum of
    boundaries to number sessions, then per-session rollup.  This is
    the portable spelling of what `session_window` (st3) does natively
    — kept separate because real pipelines need the explicit form the
    moment session identity must join back to rows.  One shuffle
    partitions events by user; both windows and the final groupBy reuse
    that partitioning (no second exchange), which is exactly how it
    holds at 100 TB: per-user state only, power-law users split by AQE
    skew handling at the aggregation."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf, "events").select("user_id", "event_id", "ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    s = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("sess_start"),
        F.max("ts").alias("sess_end"),
    )


@query(
    "a16_stickiness",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY 1),
    contrib AS (
      SELECT user_id,
             CAST(unnest(generate_series(CAST(d AS TIMESTAMP),
                                         CAST(d AS TIMESTAMP) + INTERVAL 6 DAY,
                                         INTERVAL 1 DAY)) AS DATE) AS win_day
      FROM ud
    ),
    wau AS (
      SELECT win_day AS d, COUNT(DISTINCT user_id) AS wau
      FROM contrib GROUP BY 1
    )
    SELECT dau.d, dau.dau, wau.wau,
           CAST(dau.dau * 1000000 AS BIGINT) // wau.wau AS stickiness_ppm
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def a16_stickiness(spark: SparkSession, sf: str) -> DataFrame:
    """DAU / trailing-7-day-WAU stickiness per day.  The exact rolling
    COUNT(DISTINCT) is computed contribution-style: each (user, day)
    row fans out to the ≤7 window days it supports, then one
    countDistinct per window day — an equi-shuffle on the day key with
    a fixed ×7 expansion, instead of a sliding self-join.  At 100 TB
    the same shape swaps countDistinct for HLL sketch merge
    (approx_count_distinct, a3) — per-day sketches union across the
    window at O(sketch) cost; the exact form here doubles as that
    path's oracle.  Ratio as integer ppm (exact in both engines)."""
    ev = load(spark, sf, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add("d", 6))).alias("win_day"),
    )
    wau = contrib.groupBy(F.col("win_day").alias("d")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, "d")
        .select(
            "d",
            "dau",
            "wau",
            F.expr("CAST(dau * 1000000 AS BIGINT) DIV wau").alias(
                "stickiness_ppm"
            ),
        )
    )


@query(
    "a17_exact_median",
    oracle="""
    SELECT c_mktsegment,
           ROUND(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
           ROUND(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer GROUP BY 1
    """,
)
def a17_exact_median(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT interpolated percentiles per group (both engines define
    quantile_cont/percentile as linear interpolation on the sorted
    values, so the results agree to rounding).  The exact form needs
    the group's values materialized — right for dimension-sized groups
    and reconciliation jobs; the streaming/100 TB path is the t-digest
    style sketch in a3_approx_percentile, whose error this exact twin
    bounds in tests."""
    c = load(spark, sf, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("median_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90_bal"),
        F.count("*").alias("n"),
    )


@query(
    "f11_calendar",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(isodow(o_orderdate) AS INT) AS dow_iso,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders WHERE o_orderkey % 97 = 0
    """,
)
def f11_calendar(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-function parity battery: quarter, ISO day-of-week, ISO
    week number, month end.  Dialect traps are normalized explicitly —
    Spark's dayofweek() is 1=Sunday while DuckDB's isodow is 1=Monday,
    so the Spark side uses weekday()+1 (0=Monday + 1 ≡ isodow); both
    engines' weekofyear are ISO weeks.  Pure per-row expressions —
    zero-shuffle scan pass with the filter pushed to parquet."""
    o = load(spark, sf, "orders").filter(F.col("o_orderkey") % 97 == 0)
    return o.select(
        F.to_date("o_orderdate").alias("d"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("dow_iso"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        F.last_day("o_orderdate").alias("month_end"),
    )


@query(
    "a18_gapfill_lerp",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               / (COUNT(*) * 100.0) AS v
      FROM events WHERE event_id % 7 = 0
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1
    ),
    spine AS (
      SELECT b.event_type,
             CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                         CAST(d1 AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds b
    ),
    joined AS (
      SELECT s.event_type, s.d, daily.v
      FROM spine s LEFT JOIN daily
        ON daily.event_type = s.event_type AND daily.d = s.d
    ),
    filled AS (
      SELECT event_type, d, v,
             last_value(v IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER w_prev AS pd,
             first_value(v IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER w_next AS nd
      FROM joined
      WINDOW
        w_prev AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, d,
           v IS NOT NULL AS observed,
           CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * date_diff('day', pd, d)
                       / CAST(date_diff('day', pd, nd) AS DOUBLE)
           END AS v_filled
    FROM filled
    """,
)
def a18_gapfill_lerp(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series gap fill with linear interpolation (the hypertable
    resampling primitive): sparse daily averages per key are densified
    onto a per-key calendar spine (sequence+explode — f10's pattern),
    then holes fill by interpolating between the nearest observed
    neighbors, found with frame-bounded last/first IGNORE NULLS
    windows.  Ends clamp to the nearest observation.

    One shuffle partitions by key; the spine join and both windows
    reuse it.  Per-key state is the key's date range — the operator's
    cost is O(days), independent of raw event volume, which is what a
    100 TB event table needs from its downsampling pass.  The fixture
    values are cent-granular, so the daily mean is an exact-integer
    ratio and the whole fill — lerp included — is bit-deterministic in
    both engines with no rounding anywhere."""
    ev = load(spark, sf, "events").filter(F.col("event_id") % 7 == 0)
    # exact arithmetic end to end: values are cent-granular, so the
    # daily mean is a ratio of exact integers and every downstream
    # double op (lerp included) is correctly rounded on identical
    # inputs in both engines — no cross-engine ROUND anywhere
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            / (F.count("*") * F.lit(100.0))
        ).alias("v")
    )
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "event_type",
            F.explode(F.sequence("d0", "d1")).alias("d"),
        )
    )
    j = spine.join(daily, ["event_type", "d"], "left")
    wp = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_d = F.when(F.col("v").isNotNull(), F.col("d"))
    f = (
        j.withColumn("pv", F.last("v", ignorenulls=True).over(wp))
        .withColumn("pd", F.last(obs_d, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wn))
        .withColumn("nd", F.first(obs_d, ignorenulls=True).over(wn))
    )
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * F.datediff(
        "d", "pd"
    ) / F.datediff("nd", "pd").cast("double")
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(lerp)
    )
    return f.select(
        "event_type",
        "d",
        F.col("v").isNotNull().alias("observed"),
        filled.alias("v_filled"),
    )


@query(
    "a19_copurchase",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)
def a19_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket co-occurrence (the support-counting kernel of
    association mining): part pairs appearing together in ≥3 orders.
    Pair generation is blocked PER ORDER — one groupBy collects the
    order's distinct parts (basket-sized arrays), pairs expand inside
    the row, and the only other exchange is the pair-count rollup.
    The oracle spells the same thing as a self-join; at 100 TB that
    self-join re-shuffles the full fact table twice, while the basket
    form shuffles it once and expansion stays O(basket²) per order —
    baskets are bounded (AQE skew-split is the backstop for a
    pathological mega-order)."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") > 1)
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(ps) - 1),"
                " i -> transform(slice(ps, i + 1, size(ps) - i),"
                " y -> struct(ps[i-1] AS part_a, y AS part_b))))"
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b")
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 3)
    )


@query(
    "a20_share_of_total",
    oracle="""
    WITH seg AS (
      SELECT date_trunc('month', o.o_orderdate) AS m, c.c_mktsegment,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT CAST(m AS TIMESTAMP) AS order_month, c_mktsegment, rev,
           ROUND(rev / SUM(rev) OVER (PARTITION BY m), 6) AS share
    FROM seg
    """,
)
def a20_share_of_total(spark: SparkSession, sf: str) -> DataFrame:
    """Ratio-to-report: each segment's share of its month's revenue via
    an unframed window SUM over the aggregate — the two-level rollup
    every BI layer asks for without a self-join back to the totals.
    The window partitions by the month key the aggregation just
    shuffled on, so it reuses that exchange (no extra wide op).
    Cross-engine determinism: the share divides the ROUNDED segment
    revenues; the window total's fold order is engine-internal, so the
    share rounds to 6 places (drift ~1e-16 can't reach the boundary)."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    seg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias(
                "order_month"
            ),
            "c_mktsegment",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("rev")
        )
    )
    w = W.partitionBy("order_month")
    return seg.select(
        "order_month",
        "c_mktsegment",
        "rev",
        F.round(F.col("rev") / F.sum("rev").over(w), 6).alias("share"),
    )


@query(
    "o8_histogram",
    oracle="""
    SELECT CAST((CAST(round(o_totalprice * 100) AS BIGINT) - 0)
                // 2500000 AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
)
def o8_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-width histogram (25k-wide price bins): binning is exact
    integer arithmetic on cent-granular values — `(cents // width)`
    can't disagree across engines the way float width_bucket edges
    can.  One map-side-combining aggregation on a derived integer key;
    the same shape computes any profiling histogram at 100 TB, where
    the cardinality of the groupBy is the bin count, not the row
    count."""
    o = load(spark, sf, "orders")
    return (
        o.withColumn(
            "bin",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT) DIV 2500000"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )
