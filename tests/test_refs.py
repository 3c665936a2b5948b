"""Refs: tags, branches, rollback, fast-forward (SURVEY.md §2 refs row;
docs/05-snapshots-time-travel.md:141-172)."""

import pytest
from pyspark.sql import functions as F

from icepack.catalog import Catalog
from icepack.io import load

from tests.conftest import SF_DIR, rows_sorted


def _table_with_two_snapshots(spark, warehouse):
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    second = orders.filter(F.col("o_orderkey") % 2 == 1)
    t = cat.create_table("db.orders", orders.schema)
    s1 = t.append(first)
    s2 = t.append(second)
    return t, orders, first, s1, s2


def test_tag_pins_snapshot(spark, warehouse):
    """A tag reads the tagged state forever, and expiry never collects
    a tagged snapshot's files (docs/05:143-148,178)."""
    t, orders, first, s1, s2 = _table_with_two_snapshots(spark, warehouse)
    t.create_tag("v1", s1.snapshot_id)
    assert rows_sorted(t.toDF(snapshot=t.as_of(ref="v1"))) == rows_sorted(first)
    # expire aggressively: everything older than now, keep only last
    t.expire_snapshots(older_than_ms=2**62, retain_last=1)
    t.refresh()
    assert rows_sorted(t.toDF(snapshot=t.as_of(ref="v1"))) == rows_sorted(first)
    assert rows_sorted(t.toDF()) == rows_sorted(orders)
    refs = {r["name"]: r for r in t.refs().collect()}
    assert refs["v1"]["type"] == "tag"


def test_branch_write_isolated_from_main(spark, warehouse):
    """Commits on a branch advance only the branch ref; main is
    untouched until fast_forward (docs/05:150-158,170-172)."""
    t, orders, first, s1, s2 = _table_with_two_snapshots(spark, warehouse)
    extra = load(spark, SF_DIR, "orders").limit(10).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    t.create_branch("audit")
    t.append(extra, branch="audit")
    # main unchanged
    assert t.toDF().count() == orders.count()
    # branch sees main's data + the branch-only append
    branch_df = t.toDF(snapshot=t.as_of(ref="audit"))
    assert branch_df.count() == orders.count() + 10
    # fast-forward main onto the branch head
    t.fast_forward("audit")
    assert t.toDF().count() == orders.count() + 10


def test_cherry_pick_single_branch_commit(spark, warehouse):
    """Cherry-pick applies exactly ONE branch commit's file delta onto
    main (docs/05:169-171): a branch with two appends picks only the
    first; main gains its rows and files, not the second's.  Refusals:
    re-picking (duplicate files), non-append snapshots."""
    t, orders, first, s1, s2 = _table_with_two_snapshots(spark, warehouse)
    ex1 = load(spark, SF_DIR, "orders").limit(10).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    ex2 = load(spark, SF_DIR, "orders").limit(5).withColumn(
        "o_orderkey", F.col("o_orderkey") + 20_000_000
    )
    t.create_branch("audit")
    b1 = t.append(ex1, branch="audit")
    t.append(ex2, branch="audit")
    n_files_before = len(t.live_files())
    picked = t.cherry_pick(b1.snapshot_id)
    assert picked.summary["cherry-picked-from"] == str(b1.snapshot_id)
    # main gained exactly the first branch commit's rows and files
    assert t.toDF().count() == orders.count() + 10
    b1_paths = {
        f.path
        for f in t.live_files(b1, content="all")
        if f.sequence_number == b1.sequence_number
    }
    assert {f.path for f in t.live_files()} == (
        {f.path for f in t.live_files(t.meta.snapshot_by_id(s2.snapshot_id))}
        | b1_paths
    )
    assert len(t.live_files()) == n_files_before + len(b1_paths)
    # re-pick refuses: files already live on main
    with pytest.raises(ValueError, match="already live"):
        t.cherry_pick(b1.snapshot_id)
    # non-append snapshots refuse
    from icepack.expr import col as icol

    d = t.delete(icol("o_orderkey") == -1)
    with pytest.raises(ValueError, match="append"):
        t.cherry_pick(d.snapshot_id)
    # branch itself is untouched (still both commits)
    assert t.toDF(snapshot=t.as_of(ref="audit")).count() == orders.count() + 15


def test_fast_forward_rejects_diverged_main(spark, warehouse):
    """After main advances past the branch point, fast-forward must
    refuse (a real merge is required)."""
    t, orders, first, s1, s2 = _table_with_two_snapshots(spark, warehouse)
    t.create_branch("audit", s1.snapshot_id)
    extra = load(spark, SF_DIR, "orders").limit(5)
    t.append(extra, branch="audit")
    with pytest.raises(ValueError, match="not an ancestor"):
        t.fast_forward("audit")


def test_rollback_restores_state_and_keeps_history(spark, warehouse):
    """rollback(s1) makes the table read as s1 via a NEW snapshot —
    the bad snapshot remains time-travelable (docs/05:160-168)."""
    t, orders, first, s1, s2 = _table_with_two_snapshots(spark, warehouse)
    n_before = len(t.meta.snapshots)
    rb = t.rollback(s1.snapshot_id)
    assert rows_sorted(t.toDF()) == rows_sorted(first)
    # history preserved: s2 still readable, rollback is a new snapshot
    assert len(t.meta.snapshots) == n_before + 1
    assert rows_sorted(t.toDF(snapshot=t.as_of(snapshot_id=s2.snapshot_id))) == rows_sorted(
        orders
    )
    assert rb.operation == "rollback"
    # a fresh load from disk agrees
    t2 = Catalog(spark, warehouse).load_table("db.orders")
    assert rows_sorted(t2.toDF()) == rows_sorted(first)


def test_tag_and_branch_survive_other_commits(spark, warehouse):
    """Refs ride along through unrelated commits (schema evolution,
    appends, expiry) — the copy_with path must never drop them."""
    t, orders, first, s1, s2 = _table_with_two_snapshots(spark, warehouse)
    t.create_tag("v1", s1.snapshot_id)
    t.create_branch("dev", s2.snapshot_id)
    t.add_column("note", "string")
    t.append(t.toDF().limit(1))
    t.rewrite_manifests()
    t.refresh()
    names = {r["name"] for r in t.refs().collect()}
    assert names == {"v1", "dev"}
    t.drop_ref("v1")
    assert {r["name"] for r in t.refs().collect()} == {"dev"}


def test_timestamp_travel_never_resolves_into_branches(spark, tmp_path):
    """AT(TIMESTAMP => now) must follow MAIN's ancestry only: WAP
    staging and open-transaction branch commits carry timestamps too,
    and resolving into them leaked unpublished rows (measured pre-fix:
    [1, 99]).  Branches are readable by NAME only; after publish the
    same rows arrive through main's chain."""
    import time as _time

    from pyspark.sql import Row

    from icepack.table import IceTable
    from icepack.txn import TxnTable

    df = spark.createDataFrame([Row(id=1, v=1.0)])
    t = IceTable.create(spark, str(tmp_path / "tt"), df.schema)
    t.append(df)

    tx = TxnTable.from_table(t, "__txn_probe")
    tx.append(spark.createDataFrame([Row(id=99, v=99.0)]))
    t.refresh()
    now = int(_time.time() * 1000) + 1000
    snap = t.as_of(timestamp_ms=now)
    assert sorted(r.id for r in t.toDF(snapshot=snap).collect()) == [1]

    t.create_branch("audit")
    t.append(spark.createDataFrame([Row(id=77, v=7.0)]), branch="audit")
    t.refresh()
    snap2 = t.as_of(timestamp_ms=int(_time.time() * 1000) + 1000)
    assert sorted(r.id for r in t.toDF(snapshot=snap2).collect()) == [1]
    # by NAME the branch is readable
    by_ref = t.as_of(ref="audit")
    assert sorted(r.id for r in t.toDF(snapshot=by_ref).collect()) == [1, 77]
    # publish, then timestamp travel sees it through main
    t.fast_forward("audit")
    snap3 = t.as_of(timestamp_ms=int(_time.time() * 1000) + 1000)
    assert sorted(r.id for r in t.toDF(snapshot=snap3).collect()) == [1, 77]
