"""MOR feature-product audit (round-4, extending AUDIT_r03 §5): the
interactions between merge-on-read delete files and the features that
rewrite, re-spec, branch or expire the files those deletes reference.

Products probed:
- MOR × partition evolution × SCOPED compaction: a delete spanning two
  partitions, one partition compacted under an evolved spec — the
  rewritten partition folds its deletes physically, the untouched one
  must keep being filtered by the still-live delete file.
- MOR × re-insert × compaction/expire: a key deleted then re-inserted
  (sequence-correct visibility, table.py:693) must survive rewrite and
  history expiration.
- MOR × branch/WAP (multi-statement txn) × expire: delete files staged
  on a hidden txn branch are pinned by the ref through an aggressive
  expire, and publish stays none-or-all.

These run DML through the same code paths the driver queries use; each
assertion is an invariant a spec-correct engine must keep, not a quirk
of this implementation (docs/08-acid-transactions.md:112-116,167-187,
docs/07-partitioning.md:117-129, docs/05-snapshots-time-travel.md).
"""

from pyspark.sql import Row

from icepack.expr import col
from icepack.sql import IceSQL
from icepack.table import IceTable

from tests.conftest import rows_sorted

MOR = {"write.delete.mode": "merge-on-read"}


def _mk(spark, path, cats=("a", "b"), n=6, partitioned=True, props=MOR):
    rows = [Row(id=i, cat=cats[i % len(cats)], v=float(i)) for i in range(n)]
    df = spark.createDataFrame(rows)
    t = IceTable.create(
        spark,
        str(path),
        df.schema,
        partition_by=[("cat", "identity")] if partitioned else None,
        properties=props,
    )
    t.append(df)
    return t


def test_scoped_compact_folds_deletes_keeps_them_for_untouched_partitions(
    spark, tmp_path
):
    t = _mk(spark, tmp_path / "t")
    # delete spans BOTH partitions: id=2 lives in cat a, id=3 in cat b
    t.delete(col("id").isin(2, 3))
    assert len(t.live_files(content="equality-deletes")) == 1
    b_files_before = {f.path for f in t.live_files() if f.partition.get("cat") == "b"}

    t.compact(where=col("cat") == "a")

    # correctness first: both deleted rows stay invisible
    assert rows_sorted(t.toDF().select("id")) == [(0,), (1,), (4,), (5,)]
    # cat b files were not rewritten by the scoped run
    b_files_after = {f.path for f in t.live_files() if f.partition.get("cat") == "b"}
    assert b_files_after == b_files_before
    # the delete file stays live (cat b still needs it)...
    assert len(t.live_files(content="equality-deletes")) == 1
    # ...but cat a's rewritten files outrank it (sequence-correct):
    # nothing in cat a still carries id=2 physically
    a_rows = t.toDF().filter("cat = 'a'").count()
    assert a_rows == 2
    # full compaction retires the delete file
    t.compact()
    assert t.live_files(content="equality-deletes") == []
    assert rows_sorted(t.toDF().select("id")) == [(0,), (1,), (4,), (5,)]


def test_scoped_compact_after_partition_evolution_mixed_spec_files(spark, tmp_path):
    # born unpartitioned, MOR delete, THEN evolve to identity(cat):
    # old files carry no partition tuple, new files do — the scoped
    # compaction must still see old-spec files for a cat predicate
    # (unknown partition value -> keep) and the scan must stay correct
    t = _mk(spark, tmp_path / "t", partitioned=False)
    t.delete(col("id") == 2)  # in an unpartitioned (spec-0) file
    t.update_spec([("cat", "identity")])
    import pyspark.sql.functions as F

    extra = t.toDF().sparkSession.createDataFrame(
        [Row(id=10, cat="a", v=10.0), Row(id=11, cat="b", v=11.0)]
    )
    t.append(extra)  # spec-1 files with partition tuples
    expect = {0, 1, 3, 4, 5, 10, 11}

    def ids():
        return {r.id for r in t.toDF().select("id").collect()}

    assert ids() == expect

    t.compact(where=col("cat") == "a")
    assert ids() == expect
    # everything rewritten by the scoped run landed under the NEW spec
    rewritten = [f for f in t.live_files() if f.partition]
    assert rewritten, "scoped compact should produce current-spec files"
    t.compact()
    assert ids() == expect
    assert t.live_files(content="equality-deletes") == []


def test_reinserted_key_survives_compact_and_expire(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete(col("id") == 5)
    # re-insert the same key AFTER the delete: higher sequence number →
    # visible despite the still-live equality delete on id=5
    t.append(t.spark.createDataFrame([Row(id=5, cat="b", v=99.0)]))
    assert rows_sorted(t.toDF().filter("id = 5").select("v")) == [(99.0,)]

    t.compact()
    assert rows_sorted(t.toDF().filter("id = 5").select("v")) == [(99.0,)]
    t.expire_snapshots(older_than_ms=int(1e18), retain_last=1)
    assert rows_sorted(t.toDF().filter("id = 5").select("v")) == [(99.0,)]
    assert t.toDF().count() == 6


def test_txn_staged_mor_delete_pinned_through_expire(spark, tmp_path):
    eng = IceSQL(spark, str(tmp_path / "wh"))
    eng.sql(
        "CREATE ICEBERG TABLE acc (id INT, cat STRING, v DOUBLE) "
        "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')"
    )
    eng.sql("INSERT INTO acc VALUES (0,'a',0.0),(1,'b',1.0),(2,'a',2.0)")
    outside = IceSQL(spark, str(tmp_path / "wh"))

    eng.sql("BEGIN")
    eng.sql("INSERT INTO acc VALUES (10,'a',10.0)")
    eng.sql("DELETE FROM acc WHERE id = 1")  # MOR delete, staged on branch
    # the branch head (append + delete file) exists only via the ref;
    # an aggressive expire from another handle must keep it reachable
    t_out = outside.catalog.load_table("acc")
    t_out.expire_snapshots(older_than_ms=int(1e18), retain_last=1)
    # outside reader still sees ONLY the pre-txn state
    assert sorted(r.id for r in outside.sql("SELECT id FROM acc").collect()) == [0, 1, 2]

    eng.sql("COMMIT")
    assert sorted(r.id for r in outside.sql("SELECT id FROM acc").collect()) == [0, 2, 10]
    # delete file survived the mid-txn expire and still filters id=1
    t_final = outside.catalog.load_table("acc")
    assert len(t_final.live_files(content="equality-deletes")) == 1
    # post-publish maintenance retires it without changing results
    t_final.compact()
    t_final.expire_snapshots(older_than_ms=int(1e18), retain_last=1)
    assert sorted(r.id for r in outside.sql("SELECT id FROM acc").collect()) == [0, 2, 10]


def test_txn_rollback_discards_staged_delete_files(spark, tmp_path):
    eng = IceSQL(spark, str(tmp_path / "wh"))
    eng.sql(
        "CREATE ICEBERG TABLE acc (id INT, v DOUBLE) "
        "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')"
    )
    eng.sql("INSERT INTO acc VALUES (0, 0.0), (1, 1.0)")
    eng.sql("BEGIN")
    eng.sql("DELETE FROM acc WHERE id = 0")
    eng.sql("ROLLBACK")
    assert sorted(r.id for r in eng.sql("SELECT id FROM acc").collect()) == [0, 1]
    t = eng.catalog.load_table("acc")
    # staged snapshots are unreferenced after rollback; expire+orphan
    # sweep collects them and the live scan is untouched
    t.expire_snapshots(older_than_ms=int(1e18), retain_last=1)
    from icepack.maintenance import remove_orphan_files

    remove_orphan_files(t, older_than_ms=int(1e18))
    assert sorted(r.id for r in eng.sql("SELECT id FROM acc").collect()) == [0, 1]
    assert not any(n.startswith("__txn_") for n in t.meta.refs)


def test_randomized_dml_interleavings_match_model(spark, tmp_path):
    """Randomized append / delete / update / compact / reinsert
    interleavings (COW and MOR tables), checked after EVERY step
    against a plain-Python MULTISET model.  The hand-written audits
    (AUDIT_r03/r04) found their sequencing bugs one product at a time;
    this sweeps the interleaving space mechanically — deletes remove
    every matching row, updates hit every matching row, reinserts
    after a MOR delete must survive (sequence rule), compaction must
    never change visible rows."""
    import random

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from icepack.maintenance import compact

    rnd = random.Random(1234)
    for trial in range(4):
        loc = str(tmp_path / f"m{trial}")
        schema = spark.createDataFrame([Row(id=1, v=1.0)]).schema
        t = IceTable.create(
            spark, loc, schema,
            properties={"write.delete.mode": "merge-on-read"}
            if trial % 2
            else None,
        )
        model: list[tuple[int, float]] = []  # multiset of (id, v)
        next_id = 0
        for step in range(8):
            op = rnd.choice(["append", "delete", "update", "compact", "reinsert"])
            if op == "append":
                rows = [Row(id=next_id + i, v=float(next_id + i)) for i in range(4)]
                next_id += 4
                t.append(spark.createDataFrame(rows, schema))
                model += [(r.id, r.v) for r in rows]
            elif op == "delete" and model:
                k = rnd.choice(sorted({i for i, _ in model}))
                t.delete(col("id") == k)
                model = [(i, v) for i, v in model if i != k]
            elif op == "update" and model:
                k = rnd.choice(sorted({i for i, _ in model}))
                t.update(col("id") == k, {"v": F.col("v") + 100.0})
                model = [(i, v + 100.0 if i == k else v) for i, v in model]
            elif op == "compact":
                compact(t, target_file_size=32 * 1024 * 1024)
            elif op == "reinsert" and next_id:
                k = rnd.randrange(next_id)  # may duplicate a live id
                t.append(spark.createDataFrame([Row(id=k, v=-1.0)], schema))
                model.append((k, -1.0))
            got = sorted((r.id, r.v) for r in t.toDF().collect())
            assert got == sorted(model), (
                f"trial {trial} step {step} op {op}: {got} != {sorted(model)}"
            )
        # triangle at the trial's final state: the DuckDB render and
        # the spec-format export/read must agree with the model too —
        # three independent readers over whatever DML sequence the
        # trial produced (r5)
        import duckdb as _dd

        from icepack.iceberg_export import export_iceberg
        from icepack.iceberg_import import read_iceberg
        from icepack.interop import duckdb_snapshot_sql

        want = sorted(model)
        con = _dd.connect()
        ddb = sorted(
            (r[0], r[1]) for r in con.execute(duckdb_snapshot_sql(t)).fetchall()
        )
        assert ddb == want, f"trial {trial}: DuckDB render diverged"
        spec = read_iceberg(spark, export_iceberg(t))
        got_spec = sorted((r.id, r.v) for r in spec.collect())
        assert got_spec == want, f"trial {trial}: spec-format read diverged"


def test_randomized_dml_with_merge_expire_evolution_matches_model(spark, tmp_path):
    """Second randomized sweep widening the op mix: MERGE (matched
    update + unmatched insert), snapshot EXPIRY mid-sequence, and a
    column RENAME mid-sequence — against the same multiset model,
    with the three-reader triangle at the end of every trial.  MERGE
    must upsert exactly; expiry must never change visible rows; the
    rename must not detach MOR delete files or the model (r5)."""
    import random

    import duckdb as _dd
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from icepack.dml import source_col
    from icepack.iceberg_export import export_iceberg
    from icepack.iceberg_import import read_iceberg
    from icepack.interop import duckdb_snapshot_sql
    from icepack.maintenance import compact, expire_snapshots

    rnd = random.Random(777)
    for trial in range(3):
        loc = str(tmp_path / f"mm{trial}")
        schema = spark.createDataFrame([Row(id=1, v=1.0)]).schema
        t = IceTable.create(
            spark, loc, schema,
            properties={"write.delete.mode": "merge-on-read", "write.merge.mode": "merge-on-read"}
            if trial % 2
            else None,
        )
        vcol = "v"
        model: dict[int, float] = {}  # MERGE keys are unique: id -> v
        next_id = 0
        for step in range(10):
            op = rnd.choice(
                ["append", "merge", "delete", "compact", "expire", "rename"]
            )
            if op == "append":
                rows = [Row(id=next_id + i, v=float(next_id + i)) for i in range(3)]
                next_id += 3
                t.append(
                    spark.createDataFrame(rows, schema).withColumnRenamed("v", vcol)
                )
                for r in rows:
                    model[r.id] = r.v
            elif op == "merge":
                # half existing keys (update), half fresh (insert)
                ks = sorted(model)[:2]
                fresh = [next_id, next_id + 1]
                next_id += 2
                src_rows = [Row(id=k, v=float(k) + 1000.0) for k in ks + fresh]
                src = spark.createDataFrame(src_rows, schema).withColumnRenamed(
                    "v", vcol
                )
                t.merge(
                    src,
                    on=["id"],
                    when_matched_update={vcol: source_col(vcol)},
                    when_not_matched_insert=True,
                )
                for r in src_rows:
                    model[r.id] = r.v
            elif op == "delete" and model:
                k = rnd.choice(sorted(model))
                t.delete(col("id") == k)
                model.pop(k)
            elif op == "compact":
                compact(t, target_file_size=32 * 1024 * 1024)
            elif op == "expire":
                expire_snapshots(t, older_than_ms=10**15, retain_last=1)
            elif op == "rename" and vcol == "v":
                t.rename_column("v", "val")
                vcol = "val"
            got = sorted((r.id, r[vcol]) for r in t.toDF().collect())
            assert got == sorted(model.items()), (
                f"trial {trial} step {step} op {op}: {got} != {sorted(model.items())}"
            )
        # triangle on the final state
        want = sorted(model.items())
        con = _dd.connect()
        ddb = sorted(
            (r[0], r[1]) for r in con.execute(duckdb_snapshot_sql(t)).fetchall()
        )
        assert ddb == want, f"trial {trial}: DuckDB render diverged"
        spec = read_iceberg(spark, export_iceberg(t))
        got_spec = sorted((r.id, r[vcol]) for r in spec.collect())
        assert got_spec == want, f"trial {trial}: spec-format read diverged"
