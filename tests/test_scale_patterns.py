"""Scale-pattern helpers: incremental/changelog reads, salted
aggregation/joins for skew, bucketed co-located joins (SURVEY.md §4)."""

from pyspark.sql import functions as F

from icepack.catalog import Catalog
from icepack.expr import col
from icepack.io import load
from icepack.skew import salted_agg, salted_shuffle_join

from tests.conftest import SF_DIR, rows_sorted


# -- incremental reads -------------------------------------------------------


def test_changes_reads_only_new_files(spark, warehouse):
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o", orders.schema)
    s1 = t.append(orders.filter("o_orderkey % 3 = 0"))
    t.append(orders.filter("o_orderkey % 3 = 1"))
    s3 = t.append(orders.filter("o_orderkey % 3 = 2"))
    # delta since first commit = commits 2+3
    got = t.changes(since_snapshot_id=s1.snapshot_id)
    want = orders.filter("o_orderkey % 3 != 0")
    assert rows_sorted(got) == rows_sorted(want)
    # delta since latest = empty; full history = everything
    assert t.changes(since_snapshot_id=s3.snapshot_id).count() == 0
    assert t.changes().count() == orders.count()


def test_changes_with_predicate_prunes(spark, warehouse):
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o", orders.schema)
    s1 = t.append(orders.filter("o_orderkey < 750").coalesce(1))
    t.append(orders.filter("o_orderkey >= 750").coalesce(1))
    got = t.changes(since_snapshot_id=s1.snapshot_id, predicate=col("o_orderkey") >= 1000)
    assert rows_sorted(got) == rows_sorted(orders.filter("o_orderkey >= 1000"))


def test_diff_between_snapshots(spark, warehouse):
    """Row-level CDC: an UPDATE surfaces as delete+insert; untouched
    rows (their files cancel out) never appear."""
    from pyspark.sql import functions as F2

    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o", orders.schema, partition_by=[("o_orderdate", "year")])
    s1 = t.append(orders)
    t.update(col("o_orderstatus") == "F", {"o_totalprice": F.lit(0.0)})
    d = t.diff(s1.snapshot_id)
    n_f = orders.filter("o_orderstatus = 'F'").count()
    assert d.filter("_change_type = 'insert'").count() == n_f
    assert d.filter("_change_type = 'delete'").count() == n_f
    assert d.filter("_change_type = 'insert' AND o_totalprice != 0.0").count() == 0
    # appends diff as pure inserts
    s2 = t.meta.current_snapshot
    extra = orders.limit(7).withColumn("o_orderkey", F2.col("o_orderkey") + 9_000_000)
    t.append(extra)
    d2 = t.diff(s2.snapshot_id)
    assert d2.count() == 7
    assert {r["_change_type"] for r in d2.collect()} == {"insert"}


def test_connected_components(spark):
    """Min-label propagation over a crafted graph: a 5-chain (diameter
    stress), a triangle, and an isolated edge resolve to their
    component minimums."""
    from icepack.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),  # chain 1-5
         (10, 11), (11, 12), (10, 12),    # triangle
         (20, 21)],                        # pair
        "id_a long, id_b long",
    )
    got = {r["id"]: r["cluster"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_diameter_guard(spark):
    """Non-convergence within max_iter raises instead of returning
    wrong clusters."""
    import pytest

    from icepack.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError):
        connected_components(chain, max_iter=2)


# -- skew helpers ------------------------------------------------------------


def test_salted_agg_equals_plain(spark):
    ev = load(spark, SF_DIR, "events")
    plain = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v")
    )
    salted = salted_agg(
        ev,
        ["event_type"],
        aggs=[F.count("*").alias("n"), F.sum("value").alias("v")],
        combines=[F.sum("n").alias("n"), F.round(F.sum("v"), 2).alias("v")],
    )
    assert rows_sorted(plain) == rows_sorted(salted)


def test_salted_join_equals_plain(spark):
    # simulate skew: every lineitem of one hot order replicated
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus")
    o = o.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(o, "l_orderkey", "inner")
    salted = salted_shuffle_join(li, o, "l_orderkey", salt=4)
    assert sorted(plain.columns) == sorted(salted.columns)
    assert rows_sorted(plain.select(*sorted(plain.columns))) == rows_sorted(
        salted.select(*sorted(plain.columns))
    )


# -- bucketed co-located join ------------------------------------------------


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """bucketBy on both sides of the join key removes the Exchange
    under the SortMergeJoin — the zero-shuffle co-located join the
    survey prescribes for repeated 100 TB fact-fact joins."""
    li = load(spark, SF_DIR, "lineitem")
    o = load(spark, SF_DIR, "orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    (li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
       .option("path", str(tmp_path / "b_li")).saveAsTable("b_lineitem"))
    (o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
       .option("path", str(tmp_path / "b_o")).saveAsTable("b_orders"))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge join: broadcast would bypass bucketed reads
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        joined.count()  # finalize the adaptive plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan
        # and it's still correct
        want = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


# -- iterative algorithms (k-means IVF training, x20) ------------------------


def test_kmeans_ivf_invariants(spark):
    """Lloyd's k-means (x20): every vector lands in exactly one cluster
    (count conservation), the result is run-to-run deterministic, and
    total inertia is monotonically non-increasing across iterations."""
    import numpy as np

    from icepack.io import load
    from icepack.queries.llm import x20_kmeans_ivf

    e = load(spark, SF_DIR, "embeddings")
    out1 = rows_sorted(x20_kmeans_ivf(spark, SF_DIR))
    out2 = rows_sorted(x20_kmeans_ivf(spark, SF_DIR))
    assert out1 == out2  # deterministic seeds + fixed iterations
    # tuples keep DataFrame column order (cluster, n_vectors, avg_sqdist)
    assert sum(r[1] for r in out1) == e.count()

    # monotone inertia: recompute assignments per iteration count
    def inertia(iters):
        V = np.asarray(
            [r["embedding"] for r in e.orderBy("vec_id").collect()], dtype=np.float64
        )
        C = V[:4].copy()
        for _ in range(iters):
            d2 = (
                (V * V).sum(axis=1, keepdims=True) - 2.0 * (V @ C.T) + (C * C).sum(axis=1)
            )
            idx = d2.argmin(axis=1)
            total = d2[np.arange(len(idx)), idx].sum()
            for k in range(4):
                if (idx == k).any():
                    C[k] = V[idx == k].mean(axis=0)
        return total

    i1, i2, i3 = inertia(1), inertia(2), inertia(3)
    assert i1 >= i2 - 1e-9 and i2 >= i3 - 1e-9


def test_connected_components_long_chain_converges(spark):
    """Pointer jumping gives O(log diameter) convergence: a 200-node
    chain (diameter 200) resolves well inside the default 15 rounds —
    plain one-hop propagation would need 200."""
    from icepack.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    got = {r["id"]: r["cluster"] for r in connected_components(chain).collect()}
    assert len(got) == 201 and set(got.values()) == {0}


def test_connected_components_releases_dead_checkpoints(spark):
    """r11: CC frees each round's dead localCheckpoint blocks eagerly —
    peak block-manager storage stays O(n) instead of O(rounds·n) (the
    heap-pressure margin of the 300× ladder rung).  A 200-node chain
    forces multiple pointer-jumping rounds; after convergence at most
    a handful of stored RDDs may remain (the live labels + edges the
    result still reads), never one pair per round."""
    from icepack.dedup import connected_components

    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    cc = connected_components(edges)
    assert cc.select("cluster").distinct().count() == 1  # one chain
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 3, f"leaked checkpoint blocks: {after - before}"
