"""Persistent versioned views (Iceberg view spec — icepack/views.py).

Parity: docs/12-lakehouse-patterns.md:168-172 (CREATE VIEW over the
warehouse) persisted in the public Iceberg view-metadata shape, with
the version history first-class.
"""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from icepack.io import load
from icepack.sql import IceSQL
from icepack.views import IceView

from .conftest import SF_DIR, rows_sorted


@pytest.fixture()
def warehouse_sql(spark, tmp_path):
    wh = str(tmp_path / "wh")
    q = IceSQL(spark, wh)
    q.sql(
        "CREATE ICEBERG TABLE ot (o_orderkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE)"
    )
    q.catalog.load_table("ot").append(
        load(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
    )
    return q, wh


def test_view_metadata_shape(spark, tmp_path, warehouse_sql):
    q, wh = warehouse_sql
    q.sql(
        "CREATE ICEBERG VIEW sc AS SELECT o_orderstatus, COUNT(*) AS n"
        " FROM ot GROUP BY o_orderstatus"
    )
    mdir = os.path.join(wh, "__views__", "sc", "metadata")
    meta = json.load(open(os.path.join(mdir, "v1.metadata.json")))
    # the spec-required fields are present and consistent
    assert meta["format-version"] == 1
    assert meta["view-uuid"]
    assert meta["current-version-id"] == 1
    v = meta["versions"][0]
    assert v["representations"][0]["type"] == "sql"
    assert v["schema-id"] == 0
    assert meta["schemas"][0]["schema-id"] == 0
    assert [e["version-id"] for e in meta["version-log"]] == [1]


def test_view_replace_history_and_time_travel(spark, warehouse_sql):
    q, wh = warehouse_sql
    q.sql("CREATE ICEBERG VIEW sc AS SELECT COUNT(*) AS n FROM ot")
    q.sql(
        "CREATE OR REPLACE ICEBERG VIEW sc AS SELECT COUNT(*) AS n,"
        " ROUND(SUM(o_totalprice), 2) AS total FROM ot"
    )
    pv = q._persistent_view("sc")
    assert pv.meta["current-version-id"] == 2
    assert pv.toDF(version_id=1).columns == ["n"]
    assert pv.toDF().columns == ["n", "total"]
    # version-log is append-only and linear
    assert [e["version-id"] for e in pv.meta["version-log"]] == [1, 2]
    # DESCRIBE surfaces the history
    hist = q.sql("DESCRIBE ICEBERG VIEW sc").collect()
    assert [(r["version_id"], r["is_current"]) for r in hist] == [
        (1, False),
        (2, True),
    ]


def test_view_compat_refusal_and_force(spark, warehouse_sql):
    q, _wh = warehouse_sql
    q.sql("CREATE ICEBERG VIEW sc AS SELECT o_orderkey, o_totalprice FROM ot")
    with pytest.raises(ValueError, match="drop/retype"):
        q.sql("ALTER ICEBERG VIEW sc REPLACE AS SELECT o_orderkey FROM ot")
    # widening-compatible replace passes the check
    q.sql(
        "ALTER ICEBERG VIEW sc REPLACE AS SELECT o_orderkey, o_totalprice,"
        " o_orderstatus FROM ot"
    )
    pv = q._persistent_view("sc")
    assert pv.meta["current-version-id"] == 2
    # CREATE OR REPLACE is the explicit full-redefinition form
    q.sql("CREATE OR REPLACE ICEBERG VIEW sc AS SELECT o_orderkey FROM ot")
    assert q._persistent_view("sc").toDF().columns == ["o_orderkey"]


def test_view_cross_session_and_base_tracking(spark, warehouse_sql):
    q, wh = warehouse_sql
    q.sql(
        "CREATE ICEBERG VIEW sc AS SELECT o_orderstatus, COUNT(*) AS n"
        " FROM ot GROUP BY o_orderstatus"
    )
    q2 = IceSQL(spark, wh)  # fresh session, view resolved from disk
    before = q2.sql("SELECT SUM(n) AS t FROM sc").collect()[0][0]
    t = q2.catalog.load_table("ot")
    t.append(
        load(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(7)
    )
    after = q2.sql("SELECT SUM(n) AS t FROM sc").collect()[0][0]
    assert after == before + 7  # late-binding: tracks the base table
    # a replace in one session is visible to the other (refresh-on-use)
    q.sql("CREATE OR REPLACE ICEBERG VIEW sc AS SELECT COUNT(*) AS n FROM ot")
    assert q2.sql("SELECT * FROM sc").columns == ["n"]


def test_view_session_shadowing(spark, warehouse_sql):
    q, _wh = warehouse_sql
    q.sql("CREATE ICEBERG VIEW sc AS SELECT COUNT(*) AS n FROM ot")
    # a SESSION view with the same name shadows the persistent one
    q.sql("CREATE VIEW sc AS SELECT 42 AS n")
    assert q.sql("SELECT n FROM sc").collect()[0][0] == 42


def test_view_concurrent_replace_linearizes(spark, warehouse_sql):
    q, wh = warehouse_sql
    q.sql("CREATE ICEBERG VIEW sc AS SELECT COUNT(*) AS n FROM ot")
    loc = os.path.join(wh, "__views__", "sc")
    errs, done = [], []

    def worker(i):
        try:
            v = IceView.load(spark, loc)
            v.replace(
                f"SELECT COUNT(*) AS n, {i} AS gen FROM ot",
                allow_incompatible=True,
            )
            done.append(i)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs and len(done) == 4
    v = IceView.load(spark, loc)
    ids = [e["version-id"] for e in v.meta["version-log"]]
    assert ids == sorted(set(ids)) and len(ids) == 5  # linear, no collisions
    assert v.meta["current-version-id"] == max(ids)


def test_view_plain_session_api(spark, tmp_path):
    # the bare IceView API (no IceSQL): resolves via spark.sql over
    # registered temp views
    load(spark, SF_DIR, "orders").createOrReplaceTempView("orders_tv")
    v = IceView.create(
        spark,
        str(tmp_path / "pv"),
        "SELECT o_orderpriority, COUNT(*) AS n FROM orders_tv"
        " GROUP BY o_orderpriority",
    )
    expect = rows_sorted(
        load(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert rows_sorted(v.toDF()) == expect
    assert v.schema_for().fields[1].name == "n"

def test_view_stalled_commit_recovery(spark, tmp_path, warehouse_sql):
    # a writer that produced its metadata doc but died before moving
    # the hint must not deadlock later replacers — they finish the
    # commit (idempotent hint update) and rebase on top
    q, wh = warehouse_sql
    q.sql("CREATE ICEBERG VIEW sc AS SELECT COUNT(*) AS n FROM ot")
    loc = os.path.join(wh, "__views__", "sc")
    v = IceView.load(spark, loc)
    # simulate the stall: hand-write v2's doc, leave the hint at 1
    import copy

    stalled = copy.deepcopy(v.meta)
    stalled["versions"].append(
        {
            "version-id": 2,
            "timestamp-ms": 1,
            "schema-id": 0,
            "summary": {"engine-name": "icepack"},
            "representations": [
                {"type": "sql", "sql": "SELECT 1 AS n", "dialect": "spark"}
            ],
            "default-namespace": [],
        }
    )
    stalled["version-log"].append({"timestamp-ms": 1, "version-id": 2})
    stalled["current-version-id"] = 2
    with open(os.path.join(loc, "metadata", "v2.metadata.json"), "w") as fh:
        json.dump(stalled, fh)
    # a later replace succeeds (finishes the stalled commit, rebases)
    v2 = IceView.load(spark, loc)
    vid = v2.replace("SELECT COUNT(*) AS n, 7 AS gen FROM ot")
    assert vid == 3 and v2.meta["current-version-id"] == 3
    # the stalled version is part of history, not lost
    assert [e["version-id"] for e in v2.meta["version-log"]] == [1, 2, 3]


def test_view_multi_dialect_representations(spark, tmp_path):
    # the spec allows one SQL representation per dialect: store a
    # spark AND a duckdb spelling; each engine resolves its own and
    # the two legs agree on values
    import duckdb

    load(spark, SF_DIR, "orders").createOrReplaceTempView("orders_tv")
    spark_sql = (
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders_tv"
        " GROUP BY o_orderstatus"
    )
    duck_sql = (
        f"SELECT o_orderstatus, COUNT(*) AS n FROM"
        f" '{SF_DIR}/orders.parquet' GROUP BY o_orderstatus"
    )
    v = IceView.create(
        spark,
        str(tmp_path / "mdv"),
        spark_sql,
        extra_representations=[("duckdb", duck_sql)],
    )
    spark_rows = sorted(
        (r[0], r[1]) for r in v.toDF().collect()
    )
    duck_rows = sorted(duckdb.sql(v.sql_for(dialect="duckdb")).fetchall())
    assert duck_rows == spark_rows
    # dialect selection is exact: unknown dialect refuses
    with pytest.raises(ValueError, match="dialect"):
        v.sql_for(dialect="trino")
    # duplicate dialect refuses at definition time
    with pytest.raises(ValueError, match="duplicate"):
        IceView.create(
            spark,
            str(tmp_path / "dup"),
            spark_sql,
            extra_representations=[("spark", spark_sql)],
        )
    # representations survive replace cycles on the version they rode in
    v.replace(spark_sql + " HAVING COUNT(*) > 0", allow_incompatible=True)
    assert v.sql_for(version_id=1, dialect="duckdb") == duck_sql


def test_materialized_view_lifecycle(spark, warehouse_sql):
    q, wh = warehouse_sql
    q.sql(
        "CREATE MATERIALIZED ICEBERG VIEW mv AS SELECT o_orderstatus,"
        " COUNT(*) AS n FROM ot GROUP BY o_orderstatus"
    )
    r1 = {x[0]: x[1] for x in q.sql("SELECT * FROM mv").collect()}
    assert all(
        f["fresh"] for f in q.sql("DESCRIBE MATERIALIZED VIEW mv").collect()
    )
    # base moves: MV serves the MATERIALIZATION (stale by design) and
    # the staleness is first-class
    t = q.catalog.load_table("ot")
    t.append(
        load(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(10)
    )
    assert {x[0]: x[1] for x in q.sql("SELECT * FROM mv").collect()} == r1
    assert not all(
        f["fresh"] for f in q.sql("DESCRIBE MATERIALIZED VIEW mv").collect()
    )
    # explicit refresh catches up; the old backing table is kept ONE
    # generation (a concurrent reader may still be scanning it) and
    # reaped by the refresh after that
    old_storage = q._mv_doc("mv")["storage"]
    # a reader resolved BEFORE the refresh must still collect after it
    inflight = q.sql("SELECT * FROM mv")
    q.sql("REFRESH MATERIALIZED VIEW mv")
    r3 = {x[0]: x[1] for x in q.sql("SELECT * FROM mv").collect()}
    assert sum(r3.values()) == sum(r1.values()) + 10
    assert q._mv_doc("mv")["storage"] != old_storage
    assert os.path.exists(old_storage)  # one-generation lag
    assert {x[0]: x[1] for x in inflight.collect()} == r1
    gen1 = q._mv_doc("mv")["storage"]
    q.sql("REFRESH MATERIALIZED VIEW mv")
    assert not os.path.exists(old_storage)  # reaped at N+2
    assert os.path.exists(gen1)
    # a fresh session serves the materialization from disk
    q2 = IceSQL(spark, wh)
    assert {x[0]: x[1] for x in q2.sql("SELECT * FROM mv").collect()} == r3


def test_materialized_view_refresh_on_read(spark, warehouse_sql):
    q, wh = warehouse_sql
    q.sql("CREATE MATERIALIZED ICEBERG VIEW mv2 AS SELECT COUNT(*) AS n FROM ot")
    # opt into auto-refresh via the view property
    mdir = os.path.join(wh, "__views__", "mv2", "metadata")
    hint = open(os.path.join(mdir, "version-hint.text")).read().strip()
    p = os.path.join(mdir, f"v{hint}.metadata.json")
    doc = json.load(open(p))
    doc["properties"]["mv.refresh-on-read"] = "true"
    json.dump(doc, open(p, "w"))
    before = q.sql("SELECT n FROM mv2").collect()[0][0]
    q.catalog.load_table("ot").append(
        load(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(7)
    )
    assert q.sql("SELECT n FROM mv2").collect()[0][0] == before + 7


def test_materialized_view_replace_rematerializes(spark, warehouse_sql):
    q, _wh = warehouse_sql
    q.sql("CREATE MATERIALIZED ICEBERG VIEW mv3 AS SELECT COUNT(*) AS n FROM ot")
    q.sql(
        "CREATE OR REPLACE MATERIALIZED ICEBERG VIEW mv3 AS SELECT"
        " COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total FROM ot"
    )
    row = q.sql("SELECT * FROM mv3").collect()[0]
    assert row["total"] is not None
    # the view tree carries both definitions (versioned like any view)
    hist = q.sql("DESCRIBE ICEBERG VIEW mv3").collect()
    assert len(hist) == 2


def test_materialized_view_over_materialized_view(spark, warehouse_sql):
    # a downstream MV pins the UPSTREAM MV's backing table: refreshing
    # the upstream makes the downstream stale (not silently ignored)
    q, _wh = warehouse_sql
    q.sql("CREATE MATERIALIZED ICEBERG VIEW up AS SELECT COUNT(*) AS n FROM ot")
    q.sql("CREATE MATERIALIZED ICEBERG VIEW down AS SELECT n + 0 AS n FROM up")
    assert all(
        f["fresh"] for f in q.sql("DESCRIBE MATERIALIZED VIEW down").collect()
    )
    q.catalog.load_table("ot").append(
        load(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(3)
    )
    q.sql("REFRESH MATERIALIZED VIEW up")
    # upstream moved (new backing table) -> downstream pins are stale
    assert not all(
        f["fresh"] for f in q.sql("DESCRIBE MATERIALIZED VIEW down").collect()
    )
    q.sql("REFRESH MATERIALIZED VIEW down")
    assert q.sql("SELECT n FROM down").collect()[0][0] == q.sql(
        "SELECT n FROM up"
    ).collect()[0][0]


def test_mv_demotion_and_alter_rematerialize(spark, warehouse_sql):
    q, _wh = warehouse_sql
    q.sql("CREATE MATERIALIZED ICEBERG VIEW g AS SELECT COUNT(*) AS n FROM ot")
    storage = q._mv_doc("g")["storage"]
    # CREATE OR REPLACE with the PLAIN view form demotes the MV: the
    # stale materialization must not survive to answer the new
    # definition
    q.sql(
        "CREATE OR REPLACE ICEBERG VIEW g AS SELECT COUNT(*) AS n,"
        " 1 AS gen FROM ot"
    )
    assert not q._is_materialized("g")
    assert not os.path.exists(storage)
    assert q.sql("SELECT gen FROM g").collect()[0][0] == 1  # late-binding now

    # ALTER on an MV keeps it an MV and re-materializes immediately
    q.sql("CREATE MATERIALIZED ICEBERG VIEW h AS SELECT COUNT(*) AS n FROM ot")
    q.sql(
        "ALTER ICEBERG VIEW h REPLACE AS SELECT COUNT(*) AS n,"
        " ROUND(SUM(o_totalprice), 2) AS total FROM ot"
    )
    assert q._is_materialized("h")
    row = q.sql("SELECT * FROM h").collect()[0]
    assert row["total"] is not None  # the NEW definition's data
    assert all(
        f["fresh"] for f in q.sql("DESCRIBE MATERIALIZED VIEW h").collect()
    )
