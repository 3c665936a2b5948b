"""Crash-consistency sweeps (docs/08-acid-transactions.md): inject a
process death at EVERY metadata mutation of a commit/maintenance path
and verify the reopened table equals the pre- or post-state — never a
partial.  The multi-table COMMIT sweep additionally proves the
publish-intent machinery (txn.py): readers see none-or-all TABLES of
a decided transaction after recovery."""

import os

import pytest
from pyspark.sql import functions as F

from icepack.expr import col
from icepack.io import load
from icepack.sql import IceSQL
from icepack.storage import LocalStore
from icepack.table import IceTable
from icepack.txn import recover_transactions

from tests.conftest import SF_DIR, rows_sorted
from tests.faultstore import CrashingStore, SimulatedCrash


def _rows(spark, loc):
    t = IceTable.load(spark, loc, store=LocalStore())
    return rows_sorted(t.toDF())


# --------------------------------------------------- multi-table COMMIT


def _run_two_table_commit(spark, wh, fail_after):
    """BEGIN; write table a; write table b; COMMIT under a store that
    crashes at the k-th mutation.  Returns ("ok"|"crash", locations)."""
    isql = IceSQL(spark, wh)
    isql.sql("CREATE ICEBERG TABLE ta (id BIGINT, v STRING)")
    isql.sql("CREATE ICEBERG TABLE tb (id BIGINT, v STRING)")
    spark.createDataFrame([(1, "x")], "id bigint, v string").createOrReplaceTempView(
        "seed"
    )
    isql.sql("INSERT INTO ta SELECT * FROM seed")
    isql.sql("INSERT INTO tb SELECT * FROM seed")
    la = isql.catalog._loc("ta")
    lb = isql.catalog._loc("tb")
    crash = CrashingStore(LocalStore(), fail_after)
    isql.catalog.store = crash
    try:
        isql.sql("BEGIN")
        spark.createDataFrame(
            [(2, "txn")], "id bigint, v string"
        ).createOrReplaceTempView("seed2")
        isql.sql("INSERT INTO ta SELECT * FROM seed2")
        isql.sql("INSERT INTO tb SELECT * FROM seed2")
        isql.sql("COMMIT")
        return "ok", (la, lb)
    except SimulatedCrash:
        return "crash", (la, lb)


def test_multi_table_commit_none_or_all_under_crash_sweep(spark, tmp_path):
    """For every crash point inside COMMIT: after recovery, table a
    contains the transaction's row IFF table b does (none-or-all
    across tables — VERDICT r4 next-round #3)."""
    completed = False
    saw_rollback, saw_rollforward = False, False
    for k in range(0, 40):
        wh = str(tmp_path / f"wh{k}")
        outcome, (la, lb) = _run_two_table_commit(spark, wh, fail_after=k)
        if outcome == "ok":
            completed = True
        # crash recovery: a fresh process opening the warehouse
        recover_transactions(spark, wh, LocalStore())
        a_has = any(r[0] == 2 for r in _rows(spark, la))
        b_has = any(r[0] == 2 for r in _rows(spark, lb))
        assert a_has == b_has, (
            f"crash at mutation {k}: partial publish (ta={a_has}, tb={b_has})"
        )
        if outcome == "crash":
            saw_rollback |= not a_has
            saw_rollforward |= a_has
        if outcome == "ok":
            assert a_has and b_has
            break
    assert completed, "sweep never reached the no-crash budget"
    # both recovery regimes must have been exercised: crashes before the
    # intent roll BACK (nothing published), crashes after it roll FORWARD
    assert saw_rollback, "no crash point exercised the pre-intent rollback"
    assert saw_rollforward, "no crash point exercised intent roll-forward"


def test_commit_without_crash_publishes_and_clears_intent(spark, tmp_path):
    wh = str(tmp_path / "wh-ok")
    outcome, (la, lb) = _run_two_table_commit(spark, wh, fail_after=10_000)
    assert outcome == "ok"
    assert any(r[0] == 2 for r in _rows(spark, la))
    assert any(r[0] == 2 for r in _rows(spark, lb))
    assert not os.path.exists(os.path.join(wh, "_txn_intents")) or not os.listdir(
        os.path.join(wh, "_txn_intents")
    )
    # a later IceSQL open finds nothing to recover
    assert recover_transactions(spark, wh, LocalStore()) == []


# ------------------------------------------- single-table commit paths


def _sweep(spark, tmp_path, name, setup, op, max_k=60):
    """Generic sweep: build a table, snapshot its pre-state, run *op*
    under a store crashing at every k; the reopened table must equal
    pre- or post-state."""
    # reference run to capture the post-state
    loc_ref = str(tmp_path / f"{name}-ref")
    t = setup(loc_ref)
    pre = rows_sorted(t.toDF())
    op(t)
    post = rows_sorted(t.refresh().toDF())

    for k in range(0, max_k):
        loc = str(tmp_path / f"{name}-{k}")
        t = setup(loc)
        crash = CrashingStore(LocalStore(), fail_after=k)
        t.store = crash
        try:
            op(t)
            crashed = False
        except SimulatedCrash:
            crashed = True
        got = _rows(spark, loc)
        assert got in (pre, post), (
            f"{name}: crash at mutation {k} left a partial state "
            f"({len(got)} rows vs pre {len(pre)} / post {len(post)})"
        )
        # integrity: reopened table passes verification
        t2 = IceTable.load(spark, loc, store=LocalStore())
        findings = t2.verify()
        assert not findings, f"{name}: crash at {k} broke integrity: {findings}"
        if not crashed:
            assert got == post
            return
    pytest.fail(f"{name}: sweep never completed within {max_k} mutations")


@pytest.fixture()
def nation(spark):
    return load(spark, SF_DIR, "nation")


def test_crash_sweep_append(spark, tmp_path, nation):
    def setup(loc):
        t = IceTable.create(spark, loc, nation.schema)
        t.append(nation.filter(F.col("n_nationkey") < 10))
        return t

    _sweep(spark, tmp_path, "append", setup, lambda t: t.append(nation))


def test_crash_sweep_cow_delete(spark, tmp_path, nation):
    def setup(loc):
        t = IceTable.create(spark, loc, nation.schema)
        t.append(nation)
        return t

    _sweep(
        spark, tmp_path, "delete", setup, lambda t: t.delete(col("n_regionkey") == 1)
    )


def test_crash_sweep_compact(spark, tmp_path, nation):
    from icepack.maintenance import compact

    def setup(loc):
        t = IceTable.create(spark, loc, nation.schema)
        t.append(nation.filter(F.col("n_nationkey") % 2 == 0))
        t.append(nation.filter(F.col("n_nationkey") % 2 == 1))
        return t

    _sweep(spark, tmp_path, "compact", setup, lambda t: compact(t))


def test_crash_sweep_rewrite_manifests(spark, tmp_path, nation):
    from icepack.maintenance import rewrite_manifests

    def setup(loc):
        t = IceTable.create(spark, loc, nation.schema)
        t.append(nation.filter(F.col("n_nationkey") % 2 == 0))
        t.append(nation.filter(F.col("n_nationkey") % 2 == 1))
        return t

    _sweep(spark, tmp_path, "rewrite", setup, lambda t: rewrite_manifests(t))


def test_crash_sweep_expire_snapshots(spark, tmp_path, nation):
    from icepack.maintenance import expire_snapshots

    def setup(loc):
        t = IceTable.create(spark, loc, nation.schema)
        t.append(nation.filter(F.col("n_nationkey") < 10))
        t.append(nation.filter(F.col("n_nationkey") >= 10))
        return t

    _sweep(
        spark,
        tmp_path,
        "expire",
        setup,
        lambda t: expire_snapshots(t, older_than_ms=10**15, retain_last=1),
    )


def test_crash_sweep_mor_delete(spark, tmp_path, nation):
    def setup(loc):
        t = IceTable.create(
            spark, loc, nation.schema,
            properties={"write.delete.mode": "merge-on-read"},
        )
        t.append(nation)
        return t

    _sweep(
        spark, tmp_path, "mor-delete", setup,
        lambda t: t.delete(col("n_regionkey") == 1),
    )


def test_crash_sweep_mor_update(spark, tmp_path, nation):
    def setup(loc):
        t = IceTable.create(
            spark, loc, nation.schema,
            properties={"write.update.mode": "merge-on-read"},
        )
        t.append(nation)
        return t

    _sweep(
        spark, tmp_path, "mor-update", setup,
        lambda t: t.update(col("n_regionkey") == 1, {"n_name": F.upper(F.col("n_name"))}),
    )


def test_recovery_surfaces_diverged_decided_txn_loudly(spark, tmp_path):
    """If a concurrent writer advances a table past the staged branch
    AFTER the publish intent was written but BEFORE that table's
    fast-forward (the one window pre-validation can't close), recovery
    must raise PartialPublish — surfaced, never silently absorbed —
    and leave the intent on disk for the operator."""
    from icepack.txn import PartialPublish, write_publish_intent

    wh = str(tmp_path / "whx")
    isql = IceSQL(spark, wh)
    isql.sql("CREATE ICEBERG TABLE pa (id BIGINT)")
    isql.sql("CREATE ICEBERG TABLE pb (id BIGINT)")
    spark.createDataFrame([(1,)], "id bigint").createOrReplaceTempView("pseed")
    isql.sql("INSERT INTO pa SELECT * FROM pseed")
    isql.sql("INSERT INTO pb SELECT * FROM pseed")
    isql.sql("BEGIN")
    isql.sql("INSERT INTO pa SELECT * FROM pseed")
    isql.sql("INSERT INTO pb SELECT * FROM pseed")
    # decided: intent durably written; process dies before any apply
    handles = list(isql._txn.values())
    for h in handles:
        h.refresh()
    intent = write_publish_intent(LocalStore(), wh, "txncrash", handles)
    assert intent is not None
    isql._txn, isql._txn_id = None, None  # the "dead" process
    # concurrent writer advances pa past the transaction's base
    ta = IceTable.load(spark, os.path.join(wh, "pa"), store=LocalStore())
    ta.append(spark.createDataFrame([(99,)], "id bigint"))
    with pytest.raises(PartialPublish):
        recover_transactions(spark, wh, LocalStore())
    # the intent survives for inspection (not swallowed)
    assert os.path.exists(intent)


def test_multi_table_commit_with_mor_delete_none_or_all(spark, tmp_path):
    """Crash sweep where the transaction stages a MERGE-ON-READ DELETE
    on one table and an INSERT on the other: after recovery, either
    both effects are visible or neither — a published delete without
    its sibling insert (or vice versa) is a partial transaction."""
    for k in range(0, 40):
        wh = str(tmp_path / f"whm{k}")
        isql = IceSQL(spark, wh)
        isql.sql(
            "CREATE ICEBERG TABLE ma (id BIGINT) "
            "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')"
        )
        isql.sql("CREATE ICEBERG TABLE mb (id BIGINT)")
        spark.createDataFrame([(1,), (2,)], "id bigint").createOrReplaceTempView(
            "mseed"
        )
        isql.sql("INSERT INTO ma SELECT * FROM mseed")
        isql.sql("INSERT INTO mb SELECT * FROM mseed")
        la, lb = isql.catalog._loc("ma"), isql.catalog._loc("mb")
        isql.sql("BEGIN")
        isql.sql("DELETE FROM ma WHERE id = 2")  # MOR delete, staged
        isql.sql("INSERT INTO mb SELECT id + 10 FROM mseed")
        isql.catalog.store = CrashingStore(LocalStore(), fail_after=k)
        # route the COMMIT-time intent machinery through the crashing
        # store; per-table applies crash via their own handles? no —
        # handles hold LocalStore, so the crash window here is the
        # intent write/delete, which is exactly the decide point
        try:
            isql.sql("COMMIT")
            ok = True
        except SimulatedCrash:
            ok = False
        recover_transactions(spark, wh, LocalStore())
        a_deleted = all(r[0] != 2 for r in _rows(spark, la))
        b_inserted = any(r[0] == 11 for r in _rows(spark, lb))
        assert a_deleted == b_inserted, (
            f"crash at {k}: partial txn (delete={a_deleted}, insert={b_inserted})"
        )
        if ok:
            assert a_deleted and b_inserted
            return
    pytest.fail("sweep never completed")


def test_dedupe_table_atomic_under_crash_sweep(spark, tmp_path):
    """dedupe_table's delete lands as ONE merge snapshot: a crash at
    ANY metadata mutation leaves the reopened table at either the full
    pre-state (all rows, duplicates included) or the full post-state
    (duplicates gone) — never a partial delete."""
    from icepack.dedup import dedupe_table

    base = (
        load(spark, SF_DIR, "documents").select("doc_id", "text").limit(12)
    )
    dup = base.limit(4).withColumn("doc_id", F.col("doc_id") + F.lit(10_000))
    k = 0
    while True:
        loc = str(tmp_path / f"ded{k}")
        t = IceTable.create(
            spark, loc, base.schema, store=LocalStore()
        )
        t.append(base.unionByName(dup))
        before = rows_sorted(t.toDF())
        crash = CrashingStore(LocalStore(), k)
        t.store = crash
        try:
            dedupe_table(t)
            # no crash at this k: the sweep covered every mutation
            after = rows_sorted(IceTable.load(spark, loc, store=LocalStore()).toDF())
            assert len(after) == 12
            break
        except SimulatedCrash:
            got = rows_sorted(IceTable.load(spark, loc, store=LocalStore()).toDF())
            assert got == before or len(got) == 12, f"partial state at k={k}"
        k += 1
        assert k < 60, "sweep did not terminate"


def test_crash_sweep_write_deletion_vectors(spark, tmp_path, nation):
    # v3 DV consolidation is a replace commit: a crash at any metadata
    # mutation must leave either the tombstone state or the DV state,
    # never a partial (a half-applied consolidation would double- or
    # un-delete rows)
    from icepack.maintenance import write_deletion_vectors

    def setup(loc):
        t = IceTable.create(
            spark,
            loc,
            nation.schema,
            properties={
                "write.delete.mode": "merge-on-read",
                "write.delete.mor.strategy": "position",
            },
        )
        t.append(nation)
        t.delete(col("n_regionkey") == 2)
        t.delete(col("n_nationkey") < 3)
        return t

    _sweep(
        spark,
        tmp_path,
        "write-dv",
        setup,
        lambda t: write_deletion_vectors(t),
    )


def test_crash_sweep_rewrite_deletes_from_dv(spark, tmp_path, nation):
    # the reverse migration (DV -> parquet tombstones) under the same
    # sweep; includes the property flip it commits first
    from icepack.maintenance import (
        rewrite_position_deletes,
        write_deletion_vectors,
    )

    def setup(loc):
        t = IceTable.create(
            spark,
            loc,
            nation.schema,
            properties={
                "write.delete.mode": "merge-on-read",
                "write.delete.mor.strategy": "position",
            },
        )
        t.append(nation)
        t.delete(col("n_regionkey") == 2)
        write_deletion_vectors(t)
        return t

    _sweep(
        spark,
        tmp_path,
        "rewrite-from-dv",
        setup,
        lambda t: rewrite_position_deletes(t),
    )
