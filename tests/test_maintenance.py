"""Maintenance: compaction, clustering, manifest rewrite, snapshot
expiry, orphan cleanup (docs/10-maintenance-operations.md,
docs/05-snapshots-time-travel.md:101-119)."""

import os
import time

from pyspark.sql import functions as F

from icepack.catalog import Catalog
from icepack.expr import col
from icepack.io import load

from tests.conftest import SF_DIR, rows_sorted


def _future_ms():
    return int(time.time() * 1000) + 60_000


def test_compact_preserves_and_shrinks(spark, warehouse):
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o", orders.schema)
    for i in range(6):  # many tiny commits → small-file problem
        t.append(orders.filter(F.col("o_orderkey") % 6 == i).repartition(4))
    assert len(t.live_files()) >= 20
    before = rows_sorted(t.toDF())
    snap = t.compact(target_file_size=64 * 1024 * 1024)
    assert snap.operation == "replace"
    assert len(t.live_files()) < 6
    assert rows_sorted(t.toDF()) == before


def test_cluster_by_tightens_bounds(spark, warehouse):
    """CLUSTER BY rewrite (docs/09:156-168): after range-clustering on
    o_orderkey a point predicate hits fewer files."""
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o", orders.schema)
    t.append(orders.repartition(8))  # random layout: every file spans full key range
    pred = col("o_orderkey") < 100
    _, before = t.plan_files(pred)
    assert before["files_scanned"] == before["files_total"]
    # tiny target so the ~50KB fixture still splits into several files
    t.compact(target_file_size=8 * 1024, cluster_by=["o_orderkey"])
    _, after = t.plan_files(pred)
    assert after["files_total"] > 1
    assert after["files_scanned"] < after["files_total"]
    assert rows_sorted(t.toDF(pred)) == rows_sorted(orders.filter("o_orderkey < 100"))


def _avg_norm_range(t, column):
    """Mean per-file (max-min)/domain of a column — 1.0 means every
    file spans the whole domain (no pruning power), small means tight."""
    files = [f for f in t.live_files() if column in f.stats]
    lo = min(f.stats[column]["min"] for f in files)
    hi = max(f.stats[column]["max"] for f in files)
    dom = (hi - lo) or 1
    return sum((f.stats[column]["max"] - f.stats[column]["min"]) / dom for f in files) / len(files)


def test_zorder_tightens_bounds_on_both_columns(spark, warehouse):
    """Z-order clustering: per-file bounds must be tight on BOTH
    cluster columns; linear clustering is tight only on the first."""
    cat = Catalog(spark, warehouse)
    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    lin = cat.create_table("db.lin", li.schema)
    lin.append(li.repartition(8))
    lin.compact(target_file_size=8 * 1024, cluster_by=["l_partkey", "l_suppkey"])
    zo = cat.create_table("db.zo", li.schema)
    zo.append(li.repartition(8))
    zo.compact(
        target_file_size=8 * 1024,
        cluster_by=["l_partkey", "l_suppkey"],
        cluster_strategy="zorder",
    )
    assert len(zo.live_files()) > 3
    assert rows_sorted(zo.toDF()) == rows_sorted(li)
    # linear: first column tight, second column useless (~full domain)
    assert _avg_norm_range(lin, "l_partkey") < 0.5
    assert _avg_norm_range(lin, "l_suppkey") > 0.8
    # zorder: BOTH columns substantially tighter than the full domain
    assert _avg_norm_range(zo, "l_partkey") < 0.7
    assert _avg_norm_range(zo, "l_suppkey") < 0.7


def test_rewrite_manifests(spark, warehouse):
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o", orders.schema)
    for i in range(5):
        t.append(orders.filter(F.col("o_orderkey") % 5 == i).coalesce(1))
    assert t.manifests().count() == 5
    before = rows_sorted(t.toDF())
    t.rewrite_manifests()
    assert t.manifests().count() == 1
    assert rows_sorted(t.toDF()) == before


def test_expire_snapshots(spark, warehouse):
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o", orders.schema)
    t.append(orders.filter("o_orderkey % 2 = 0"))
    t.append(orders.filter("o_orderkey % 2 = 1"))
    t.delete(col("o_orderstatus") == "F")  # rewrites files → old ones expire-able
    n_before = t.toDF().count()
    paths_before = set()
    for s in t.meta.snapshots:
        paths_before |= {f.path for f in t.live_files(s)}
    r = t.expire_snapshots(older_than_ms=_future_ms(), retain_last=1)
    assert r["expired"] == 2 and r["deleted_files"] > 0
    assert len(t.meta.snapshots) == 1
    assert t.toDF().count() == n_before  # current stays readable (docs/05:115-119)
    live = {f.path for f in t.live_files()}
    for p in paths_before - live:
        assert not os.path.exists(p)


def test_retention_property_default(spark, warehouse):
    """DATA_RETENTION_TIME_IN_DAYS=0 → everything but current expires."""
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table(
        "db.o", orders.schema, properties={"DATA_RETENTION_TIME_IN_DAYS": "0"}
    )
    t.append(orders.filter("o_orderkey % 2 = 0"))
    t.append(orders.filter("o_orderkey % 2 = 1"))
    time.sleep(0.05)
    r = t.expire_snapshots()
    assert r["expired"] == 1
    assert t.toDF().count() == orders.count()


def test_remove_orphans(spark, warehouse):
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o", orders.schema)
    t.append(orders)
    orphan_dir = os.path.join(t.location, "data", "stray")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "stray.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    found = t.remove_orphan_files(older_than_ms=_future_ms(), dry_run=True)
    assert found == [orphan] and os.path.exists(orphan)
    t.remove_orphan_files(older_than_ms=_future_ms())
    assert not os.path.exists(orphan)
    assert t.toDF().count() == orders.count()


def test_health_report(spark, warehouse):
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.o", orders.schema)
    t.append(orders.repartition(4))
    h = t.health()
    assert h["file_count"] == 4 and h["snapshot_count"] == 1
    assert h["needs_compaction"]  # tiny files


def test_scoped_compaction(spark, warehouse):
    """COMPACT ... WHERE (docs/03:192-195): only matching partitions
    rewrite; untouched files keep their paths; MOR delete files stay
    alive for the rest of the table and reads stay correct."""
    cat = Catalog(spark, warehouse)
    ev = load(spark, SF_DIR, "events")
    t = cat.create_table(
        "db.evs", ev.schema,
        partition_by=[("event_type", "identity")],
        properties={"write.delete.mode": "merge-on-read",
                    "write.delete.mor.strategy": "position"},
    )
    # several commits → several small files per partition
    for i in range(3):
        t.append(ev.filter(F.col("event_id") % 3 == i))
    t.delete(col("value") > 150.0)  # MOR: applies across all partitions
    want = rows_sorted(t.toDF())
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    target, rest = types[0], types[1:]
    untouched_before = {
        f.path for f in t.live_files() if f.partition.get("event_type") in rest
    }
    n_target_before = len(
        [f for f in t.live_files() if f.partition.get("event_type") == target]
    )
    t.compact(target_file_size=64 * 1024 * 1024, where=(col("event_type") == target))
    live = t.live_files()
    # target partition collapsed; everything else byte-identical
    assert len([f for f in live if f.partition.get("event_type") == target]) < n_target_before
    assert untouched_before <= {f.path for f in live}
    # delete files survive a scoped compaction (still needed elsewhere)
    assert len(t.live_files(content="position-deletes")) == 1
    assert rows_sorted(t.toDF()) == want
    # and a FULL compaction retires them
    t.compact()
    assert len(t.live_files(content="position-deletes")) == 0
    assert rows_sorted(t.toDF()) == want


def test_rewrite_position_deletes_consolidates(spark, warehouse):
    """rewrite_position_deletes (docs/10:112-123 delete-ratio health):
    N small position-delete files collapse into one, dead tombstones
    (targets no longer live) are dropped, and reads are unchanged."""
    cat = Catalog(spark, warehouse)
    ev = load(spark, SF_DIR, "events")
    t = cat.create_table(
        "db.evrw", ev.schema,
        properties={"write.delete.mode": "merge-on-read",
                    "write.delete.mor.strategy": "position"},
    )
    t.append(ev)
    t.delete(col("value") > 150.0)
    t.delete(col("event_type") == "click")
    t.delete(col("user_id") < 100)
    assert len(t.live_files(content="position-deletes")) == 3
    expected = rows_sorted(t.toDF())
    snap = t.rewrite_position_deletes()
    assert snap is not None
    assert len(t.live_files(content="position-deletes")) == 1
    assert rows_sorted(t.toDF()) == expected
    # idempotent: a single consolidated file is left alone
    assert t.rewrite_position_deletes() is None


def test_rewrite_manifests_is_a_real_commit(spark, tmp_path):
    """rewrite_manifests must take a fresh snapshot id and the next
    commit sequence number: a duplicate sequence number makes
    offset→snapshot resolution ambiguous for the streaming source, and
    a prev+1 snapshot id can collide with real ids.  Data sequence
    numbers of the entries must be preserved (MOR ordering)."""
    import pytest
    from pyspark.sql import Row

    from icepack.datasource import _StreamReader
    from icepack.maintenance import rewrite_manifests
    from icepack.table import IceTable

    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(6)])
    t = IceTable.create(spark, str(tmp_path / "rw"), df.schema)
    t.append(df.filter("id < 3"))
    t.append(df.filter("id >= 3"))
    entry_seqs = sorted(f.sequence_number for f in t.live_files())
    rewrite_manifests(t)
    t.refresh()
    seqs = [s.sequence_number for s in t.meta.snapshots]
    assert len(seqs) == len(set(seqs))  # commit seq is unique
    assert t.meta.current_snapshot.sequence_number == max(seqs)
    assert sorted(f.sequence_number for f in t.live_files()) == entry_seqs
    assert t.toDF().count() == 6

    # streaming source across the rewrite: refuse by default, deliver
    # the appends (and nothing else) under skip-overwrite-snapshots
    r = _StreamReader(None, str(tmp_path / "rw"), {})
    hi = r.latestOffset()
    with pytest.raises(ValueError, match="non-append"):
        r.partitions({"seq": 0}, hi)
    r2 = _StreamReader(
        None, str(tmp_path / "rw"), {"skip-overwrite-snapshots": "true"}
    )
    assert len(r2.partitions({"seq": 0}, hi)) == len(entry_seqs)


def test_verify_table_fsck(spark, tmp_path):
    """verify_table: clean table -> no findings; a drifted manifest
    summary (what phase-0 skipping trusts), a missing data file, and a
    wrong record count are each detected."""
    import json as _json
    import os as _os

    from pyspark.sql import Row

    from icepack.maintenance import verify_table
    from icepack.table import IceTable

    df = spark.createDataFrame([Row(id=i, cat="ab"[i % 2], v=float(i)) for i in range(8)])
    t = IceTable.create(
        spark, str(tmp_path / "fsck"), df.schema, partition_by=[("cat", "identity")]
    )
    t.append(df)
    t.append(df.filter("id < 2"))
    assert verify_table(t, check_data=True) == []

    # 1. summary drift: shrink the stored partition range
    mlist = _os.path.join(t._mdir, t.meta.current_snapshot.manifest_list)
    descs = _json.load(open(mlist))
    descs[0]["partition-summaries"]["cat"] = {"min": "zz", "max": "zz"}
    _json.dump(descs, open(mlist, "w"))
    t.refresh()
    findings = verify_table(t)
    assert any("summary drift" in f for f in findings)

    # 2. missing data file
    victim = t.live_files()[0].path
    _os.remove(victim)
    assert any("missing from storage" in f for f in verify_table(t))

    # 3. record-count drift (restore the file list first)
    t2 = IceTable.create(spark, str(tmp_path / "fsck2"), df.schema)
    t2.append(df)
    man = next(
        p
        for p in _os.listdir(t2._mdir)
        if p.startswith("manifest-") and p.endswith(".jsonl")
    )
    mp = _os.path.join(t2._mdir, man)
    lines = [_json.loads(x) for x in open(mp) if x.strip()]
    lines[0]["record-count"] = 999
    open(mp, "w").write("".join(_json.dumps(x) + "\n" for x in lines))
    t2.refresh()
    assert any("!= footer" in f for f in verify_table(t2, check_data=True))


def test_range_overlaps_sweep_matches_bruteforce():
    """The O(n log n) sweep-line overlap count must equal the exact
    pairwise definition on randomized inputs, incl. ties and NaN
    bounds (ADVICE r5 #5)."""
    import random

    from icepack.expr import _lt
    from icepack.maintenance import _range_overlaps

    rng = random.Random(42)

    def brute(bounds):
        out = []
        for i, (lo, hi) in enumerate(bounds):
            c = 0
            for j, (lo2, hi2) in enumerate(bounds):
                if i != j and not (_lt(hi, lo2) is True or _lt(hi2, lo) is True):
                    c += 1
            out.append(c)
        return out

    for trial in range(30):
        n = rng.randint(2, 40)
        if trial % 3 == 0:  # integer bounds with heavy ties
            bounds = [tuple(sorted((rng.randint(0, 8), rng.randint(0, 8)))) for _ in range(n)]
        elif trial % 3 == 1:  # floats with occasional NaN garbage stats
            bounds = []
            for _ in range(n):
                lo, hi = sorted((rng.random(), rng.random()))
                if rng.random() < 0.15:
                    lo = float("nan")
                bounds.append((lo, hi))
        else:  # ISO date strings (normalized to datetimes internally)
            bounds = [
                tuple(sorted((f"2024-01-{rng.randint(1, 28):02d}", f"2024-01-{rng.randint(1, 28):02d}")))
                for _ in range(n)
            ]
        assert sorted(_range_overlaps(bounds)) == sorted(brute(bounds)), (trial, bounds)


def test_rewrite_position_deletes_spaced_location(spark, tmp_path):
    """A native table at a SPACED location stores percent-encoded
    Spark URIs in its position tombstones ('file:/a/sp%20ace/...');
    the liveness semi-join must canonicalize, not string-strip —
    otherwise every tombstone is judged dangling and the rewrite
    RESURRECTS deleted rows."""
    from icepack.expr import col
    from icepack.maintenance import rewrite_position_deletes
    from icepack.table import IceTable

    loc = str(tmp_path / "sp ace tbl")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(12)], "id bigint, v double"
    )
    t = IceTable.create(
        spark,
        loc,
        df.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df.filter("id < 6"))
    t.append(df.filter("id >= 6"))
    t.delete(col("id") == 3)
    t.delete(col("id") == 8)
    want = sorted(r.id for r in t.toDF().collect())
    assert want == [0, 1, 2, 4, 5, 6, 7, 9, 10, 11]
    snap = rewrite_position_deletes(t)
    assert snap is not None
    got = sorted(r.id for r in t.toDF().collect())
    assert got == want, "rewrite dropped live tombstones (resurrection)"
    # consolidated to one delete file
    pos = [f for f in t.live_files(content="deletes")]
    assert len(pos) == 1


def test_optimize_runs_exactly_what_health_recommends(spark, tmp_path):
    from icepack.expr import col
    from icepack.maintenance import optimize, table_health
    from icepack.table import IceTable
    from pyspark.sql import functions as F

    df = spark.range(0, 400).withColumn("v", F.col("id") % 7)
    t = IceTable.create(
        spark,
        str(tmp_path / "opt"),
        df.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    # many tiny appends + MOR deletes: small files AND a delete ratio
    # past the 10% read-health bar
    for i in range(0, 400, 100):
        t.append(df.filter((F.col("id") >= i) & (F.col("id") < i + 100)))
    t.delete(col("v") == 3)
    h = table_health(t)
    assert h["needs_compaction"] or h["needs_delete_compaction"]
    expect = sorted(r["id"] for r in t.toDF().collect())
    # dry run plans but does not act
    plan = optimize(t, dry_run=True)
    assert "compact" in plan["actions"]
    assert [f for f in t.live_files(content="all") if f.content != "data"]
    # real run compacts: deletes folded and retired, data identical
    rep = optimize(t)
    assert "compact" in rep["actions"]
    assert not [f for f in t.live_files(content="all") if f.content != "data"]
    assert sorted(r["id"] for r in t.toDF().collect()) == expect
    assert not rep["health_after"]["needs_delete_compaction"]
    # healthy table: optimize is a no-op
    assert optimize(t)["actions"] == []


def test_optimize_sql_spelling(spark, tmp_path):
    from icepack.sql import IceSQL
    from pyspark.sql import functions as F

    q = IceSQL(spark, str(tmp_path / "wh"))
    q.sql("CREATE ICEBERG TABLE ot (id BIGINT, v BIGINT)")
    t = q.catalog.load_table("ot")
    df = spark.range(0, 200).select("id", (F.col("id") % 5).alias("v"))
    for i in range(0, 200, 50):
        t.append(df.filter((F.col("id") >= i) & (F.col("id") < i + 50)))
    row = q.sql("ALTER ICEBERG TABLE ot OPTIMIZE").collect()[0]
    import json as _json

    assert "compact" in _json.loads(row["actions"])
    t.refresh()
    assert t.toDF().count() == 200


def test_zorder_over_date_and_timestamp_columns(spark, tmp_path):
    """The docstring promises date/timestamp z-order — but DATE has no
    direct DOUBLE cast (ANSI refuses it), so _zvalue must normalize
    temporal columns through unix_date/unix_micros.  Pins the rewrite
    runs, rows survive, and per-file date bounds actually tighten."""
    import datetime as dt

    from pyspark.sql import Row

    from icepack.maintenance import compact
    from icepack.table import IceTable

    rows = [
        Row(
            id=i,
            d=dt.date(2024, 1, 1 + (i * 7) % 28),
            ts=dt.datetime(2024, 1, 1 + (i * 3) % 28, i % 24),
            v=float(i),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows)
    t = IceTable.create(spark, str(tmp_path / "z"), df.schema)
    t.append(df.repartition(8))
    want = rows_sorted(t.toDF())
    compact(
        t,
        target_file_size=2_000,
        cluster_by=["d", "ts"],
        cluster_strategy="zorder",
    )
    assert rows_sorted(t.toDF()) == want
    # z-ordered files are hyper-cubes: each file's date range must be a
    # strict subset of the table's
    spans = []
    for f in t.live_files():
        st = f.stats.get("d") or {}
        if st.get("min") and st.get("max"):
            spans.append((st["min"], st["max"]))
    assert len(spans) > 1
    full = (min(s[0] for s in spans), max(s[1] for s in spans))
    assert any(s != full for s in spans)


def test_dv_consolidation_distributed_planning(spark, tmp_path, monkeypatch):
    """r10: past the auto plan-mode thresholds write_deletion_vectors
    builds its spelling map and finds its tombstones through the
    DISTRIBUTED entries DataFrame — the driver never decodes manifest
    entries and never materializes the live data-file list.  Pinned:
    zero driver-side _read_mentries calls during consolidation on a
    ``read.plan-mode=distributed`` table, and the consolidated state is
    identical to the driver-mode run on a twin table."""
    from pyspark.sql import Row

    from icepack.maintenance import write_deletion_vectors
    from icepack.table import IceTable

    def build(loc, mode):
        df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(64)])
        t = IceTable.create(
            spark,
            loc,
            df.schema,
            properties={
                "write.delete.mode": "merge-on-read",
                "write.delete.mor.strategy": "position",
                "read.plan-mode": mode,
                "commit.hit-search.threshold": "1",
            },
        )
        t.append(df)
        t.delete(col("id") < 10)
        t.delete(col("id") > 55)
        return t

    td = build(str(tmp_path / "dist"), "distributed")
    calls = []
    at_commit = []
    orig = IceTable._read_mentries
    orig_commit = IceTable._commit_snapshot

    def counting(self, name):
        calls.append(name)
        return orig(self, name)

    def marking(self, *a, **k):
        at_commit.append(len(calls))
        return orig_commit(self, *a, **k)

    monkeypatch.setattr(IceTable, "_read_mentries", counting)
    monkeypatch.setattr(IceTable, "_commit_snapshot", marking)
    assert write_deletion_vectors(td) is not None
    monkeypatch.setattr(IceTable, "_read_mentries", orig)
    monkeypatch.setattr(IceTable, "_commit_snapshot", orig_commit)
    # the PLANNING (tombstone discovery + spelling map) is decode-free;
    # the commit decodes only the manifests holding the replaced
    # tombstones (the Spark-side hit search) — two delete manifests
    assert at_commit and at_commit[0] == 0, f"planning decoded {calls}"
    assert len(set(calls)) <= 2, f"driver decoded {sorted(set(calls))}"
    live = td.live_files(content="all")
    assert [f for f in live if f.content == "deletion-vectors"]
    assert not [f for f in live if f.content.endswith("-deletes")]

    tdr = build(str(tmp_path / "drv"), "driver")
    assert write_deletion_vectors(tdr) is not None
    want = sorted(r.id for r in tdr.toDF().collect())
    got = sorted(r.id for r in td.toDF().collect())
    assert got == want and len(got) == 64 - 10 - 8


def test_expire_reachability_distributed(spark, tmp_path, monkeypatch):
    """r10: past the manifest threshold expire-snapshot reachability is
    evaluated in Spark (distinct + left_anti over the entries
    DataFrames) and the driver collects only the doomed paths — zero
    driver-side manifest entry decodes.  The decision and the deleted
    set must match the driver walk on a twin table."""
    import os as _os

    from icepack.maintenance import compact, expire_snapshots
    from icepack.table import IceTable

    def build(loc):
        df = spark.range(40).selectExpr("id", "CAST(id AS DOUBLE) v")
        t = IceTable.create(spark, loc, df.schema)
        for lo in range(0, 40, 10):
            t.append(df.filter(f"id >= {lo} AND id < {lo + 10}"))
        compact(t)  # replace snapshot: pre-compaction files become unreachable-once-expired
        return t

    results = {}
    for lane, thresh in (("dist", 2), ("driver", 10_000)):
        t = build(str(tmp_path / lane))
        monkeypatch.setattr(IceTable, "AUTO_PLAN_MANIFEST_THRESHOLD", thresh)
        calls = []
        orig = IceTable._read_mentries

        def counting(self, name):
            calls.append(name)
            return orig(self, name)

        monkeypatch.setattr(IceTable, "_read_mentries", counting)
        rep = expire_snapshots(t, older_than_ms=2**62, retain_last=1)
        monkeypatch.setattr(IceTable, "_read_mentries", orig)
        if lane == "dist":
            assert calls == [], f"driver decoded {sorted(set(calls))}"
        assert rep["expired"] == 4
        live = {f.path for f in t.live_files()}
        assert all(_os.path.exists(p) for p in live)
        assert t.toDF().count() == 40
        results[lane] = rep["deleted_files"]
    assert results["dist"] == results["driver"] > 0


def test_orphan_sweep_distributed_reference_set(spark, tmp_path, monkeypatch):
    """r10: past the manifest threshold the orphan sweep anti-joins the
    candidate listing against the entries DataFrames in Spark — the
    referenced-path set never materializes driver-side and no manifest
    entries are decoded in driver Python.  Same sweep decision as the
    driver walk."""
    from icepack.maintenance import remove_orphan_files
    from icepack.table import IceTable

    def build(loc):
        df = spark.range(20).selectExpr("id", "CAST(id AS DOUBLE) v")
        t = IceTable.create(spark, loc, df.schema)
        t.append(df.filter("id < 10"))
        t.append(df.filter("id >= 10"))
        # plant two orphans old enough to sweep
        for i in range(2):
            p = os.path.join(loc, "data", f"orphan-{i}.parquet")
            spark.range(1).coalesce(1).write.mode("overwrite").parquet(p + ".d")
            import glob as g
            import shutil

            shutil.move(g.glob(p + ".d/*.parquet")[0], p)
            shutil.rmtree(p + ".d")
            os.utime(p, (0, 0))
        return t

    results = {}
    for lane, thresh in (("dist", 1), ("driver", 10_000)):
        t = build(str(tmp_path / lane))
        monkeypatch.setattr(IceTable, "AUTO_PLAN_MANIFEST_THRESHOLD", thresh)
        calls = []
        orig = IceTable._read_mentries

        def counting(self, name):
            calls.append(name)
            return orig(self, name)

        monkeypatch.setattr(IceTable, "_read_mentries", counting)
        got = remove_orphan_files(t, older_than_ms=1)
        monkeypatch.setattr(IceTable, "_read_mentries", orig)
        if lane == "dist":
            assert calls == [], f"driver decoded {sorted(set(calls))}"
        assert [os.path.basename(p) for p in got] == [
            "orphan-0.parquet",
            "orphan-1.parquet",
        ]
        assert t.toDF().count() == 20  # live data untouched
        results[lane] = len(got)
    assert results["dist"] == results["driver"] == 2


def test_rewrite_manifests_distributed(spark, tmp_path, monkeypatch):
    """r10: on a plan-mode=distributed table REWRITE MANIFESTS
    re-groups manifest lines in Spark and writes one manifest per
    output group executor-side — zero driver entry decodes, bounded
    manifest sizes, and BIT-FAITHFUL entries (partition values, stats,
    sequence numbers survive the round trip: raw JSONL lines ship, not
    the stringly pruning schema)."""
    from icepack.maintenance import rewrite_manifests
    from icepack.table import IceTable

    df = spark.range(40).selectExpr("id", "CAST(id % 4 AS INT) p", "CAST(id AS DOUBLE) v")
    t = IceTable.create(
        spark,
        str(tmp_path / "rw"),
        df.schema,
        partition_by=[("p", "identity")],
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
            "read.plan-mode": "distributed",
            "rewrite.manifests.target-entries": "4",
        },
    )
    for lo in range(0, 40, 10):
        t.append(df.filter(f"id >= {lo} AND id < {lo + 10}"))
    t.delete(col("id") < 5)  # MOR tombstone: sequence ordering must survive
    before = {
        f.path: (f.partition, f.stats, f.sequence_number, f.content)
        for f in t.live_files(content="all")
    }
    n_before = t.toDF().count()

    calls = []
    orig = IceTable._read_mentries

    def counting(self, name):
        calls.append(name)
        return orig(self, name)

    monkeypatch.setattr(IceTable, "_read_mentries", counting)
    rewrite_manifests(t)
    monkeypatch.setattr(IceTable, "_read_mentries", orig)
    assert calls == [], f"driver decoded {sorted(set(calls))}"
    after = {
        f.path: (f.partition, f.stats, f.sequence_number, f.content)
        for f in t.live_files(content="all")
    }
    assert after == before  # full entry fidelity
    mans = t.manifests().count()
    assert mans > 1  # bounded groups, not one coalesced manifest
    assert t.toDF().count() == n_before == 35


def test_fsck_check_data_distributed_fanout(spark, tmp_path, monkeypatch):
    """r10: past the file threshold fsck's check_data probes (footer
    re-harvest, DV blob decode) fan out as a Spark job and only the
    findings return — same findings as the driver loop, including a
    planted corrupt record count."""
    import json as _json

    from icepack.maintenance import verify_table
    from icepack.table import IceTable

    df = spark.range(40).selectExpr("id", "CAST(id AS DOUBLE) v")
    t = IceTable.create(spark, str(tmp_path / "t"), df.schema)
    for lo in range(0, 40, 10):
        t.append(df.filter(f"id >= {lo} AND id < {lo + 10}"))
    # corrupt one manifest's record-count claim
    man = t._read_mlist(t.meta.current_snapshot.manifest_list)[0]["manifest-path"]
    mp = os.path.join(t._mdir, man)
    lines = [ln for ln in open(mp).read().splitlines() if ln.strip()]
    d = _json.loads(lines[0])
    d["record-count"] += 7
    lines[0] = _json.dumps(d)
    open(mp, "w").write("\n".join(lines) + "\n")
    # driver lane first (threshold high), then the Spark fan-out
    results = {}
    for lane, thresh in (("driver", 10_000), ("dist", 1)):
        monkeypatch.setattr(IceTable, "AUTO_PLAN_FILE_THRESHOLD", thresh)
        got = [f for f in verify_table(t, check_data=True) if "footer" in f]
        results[lane] = sorted(got)
    assert results["driver"] == results["dist"]
    assert len(results["dist"]) == 1 and "!= footer" in results["dist"][0]


def test_fsck_dv_missing_offsets_is_finding_not_crash(spark, tmp_path):
    """ADVICE r10 (medium): a deletion-vector entry with null
    content_offset/content_size is corrupt metadata — fsck must REPORT
    it as a finding, not die in int(None) while queuing the blob
    probe."""
    import json as _json

    from icepack import maintenance as M
    from icepack.maintenance import verify_table
    from icepack.table import IceTable

    df = spark.range(200).selectExpr("id", "CAST(id % 7 AS DOUBLE) v")
    t = IceTable.create(
        spark,
        str(tmp_path / "dvt"),
        df.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    t.append(df)
    t.delete(col("v") == 3.0)
    assert M.write_deletion_vectors(t) is not None
    assert verify_table(t, check_data=True) == []
    # null out the DV entry's blob coordinates in its manifest
    corrupted = 0
    for man in os.listdir(t._mdir):
        if not (man.startswith("manifest-") and man.endswith(".jsonl")):
            continue
        mp = os.path.join(t._mdir, man)
        lines = [ln for ln in open(mp).read().splitlines() if ln.strip()]
        out = []
        for ln in lines:
            d = _json.loads(ln)
            if d.get("content") == "deletion-vectors" and d.get("status") != "deleted":
                d["content-offset"] = None
                d["content-size-in-bytes"] = None
                corrupted += 1
            out.append(_json.dumps(d))
        open(mp, "w").write("\n".join(out) + "\n")
    assert corrupted
    t.refresh()
    findings = verify_table(t, check_data=True)
    assert any("missing content_offset" in f for f in findings)


def test_expire_orphans_respect_plan_mode_driver(spark, tmp_path, monkeypatch):
    """ADVICE r10 (low): expire/orphan reachability must route through
    the property-aware plan-mode logic — read.plan-mode=driver pins the
    driver walk even past the (overridden) manifest threshold, and
    =distributed launches the Spark lane even below it."""
    import icepack.scanplan as sp
    from icepack import maintenance as M
    from icepack.table import IceTable

    def build(loc, mode):
        df = spark.range(30).selectExpr("id", "CAST(id AS DOUBLE) v")
        t = IceTable.create(
            spark,
            str(tmp_path / loc),
            df.schema,
            properties={
                "read.plan-mode": mode,
                "read.plan-mode.auto.manifest-threshold": "1",
            },
        )
        for lo in range(0, 30, 10):
            t.append(df.filter(f"id >= {lo} AND id < {lo + 10}"))
        return t

    # driver-pinned: the distributed entries path must never be touched
    # (compacted so reachability has real expired-only candidates)
    t = build("drv", "driver")
    t.compact()
    def boom(*a, **k):
        raise AssertionError("read.plan-mode=driver must not launch Spark reachability")
    monkeypatch.setattr(sp, "entries_df_for_manifests", boom)
    res = M.expire_snapshots(t, older_than_ms=_future_ms(), retain_last=1)
    assert res["expired"] >= 1
    M.remove_orphan_files(t, older_than_ms=_future_ms(), dry_run=True)
    monkeypatch.undo()

    # distributed-pinned: tiny table, threshold default — Spark lane runs
    # (compact first so expired snapshots hold manifests the kept one
    # doesn't — otherwise reachability short-circuits with no work)
    t2 = build("dist", "distributed")
    t2.compact()
    calls = []
    orig = sp.entries_df_for_manifests
    def counting(table, names):
        calls.append(list(names))
        return orig(table, names)
    monkeypatch.setattr(sp, "entries_df_for_manifests", counting)
    M.expire_snapshots(t2, older_than_ms=_future_ms(), retain_last=1)
    assert calls, "read.plan-mode=distributed must use the Spark lane"


def test_fsck_metadata_walk_distributed_matches_driver(spark, tmp_path):
    """VERDICT r10 item 5: past the plan-mode manifest threshold fsck's
    METADATA walk fans out as a Spark job (executors decode their own
    manifests, run the shared per-manifest checker, probe check_data in
    place, and the dangling-anchor cross-check is a left_anti join) —
    zero driver entry decodes, findings IDENTICAL to the driver loop on
    a table with four planted corruptions: summary drift, a missing
    data file, a wrong record count, and a dangling anchored delete."""
    import json as _json

    from icepack import maintenance as M
    from icepack.maintenance import verify_table
    from icepack.table import IceTable

    df = spark.range(120).selectExpr("id", "CAST(id % 6 AS DOUBLE) v")
    t = IceTable.create(
        spark, str(tmp_path / "t"), df.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    for lo in range(0, 120, 40):
        t.append(df.filter(f"id >= {lo} AND id < {lo + 40}"))
    t.delete(col("v") == 4.0)
    assert M.write_deletion_vectors(t) is not None
    assert verify_table(t, check_data=True) == []

    # plant: (1) summary drift, (2) record-count drift, (3) missing
    # file, (4) dangling DV anchor
    mlist = os.path.join(t._mdir, t.meta.current_snapshot.manifest_list)
    descs = _json.load(open(mlist))
    descs[0]["live-files"] = 999
    _json.dump(descs, open(mlist, "w"))
    mans = [
        p
        for p in os.listdir(t._mdir)
        if p.startswith("manifest-") and p.endswith(".jsonl")
    ]
    planted_rc = planted_anchor = False
    for man in mans:
        mp = os.path.join(t._mdir, man)
        lines = [_json.loads(x) for x in open(mp) if x.strip()]
        for d in lines:
            if not planted_rc and d.get("content") == "data":
                d["record-count"] = 77777
                planted_rc = True
            elif not planted_anchor and d.get("content") == "deletion-vectors":
                d["referenced-data-file"] = "/nowhere/ghost.parquet"
                planted_anchor = True
        open(mp, "w").write("".join(_json.dumps(x) + "\n" for x in lines))
    assert planted_rc and planted_anchor
    victim = [f for f in t.live_files() if f.record_count != 77777][0].path
    os.remove(victim)
    t.refresh()

    results = {}
    for lane, mode in (("driver", "driver"), ("dist", "distributed")):
        t.set_properties(**{"read.plan-mode": mode})
        calls = []
        orig = IceTable._read_mentries

        def counting(self, name):
            calls.append(name)
            return orig(self, name)

        IceTable._read_mentries = counting
        try:
            results[lane] = sorted(verify_table(t, check_data=True))
        finally:
            IceTable._read_mentries = orig
        if lane == "dist":
            assert calls == [], f"driver decoded {sorted(set(calls))}"
        else:
            assert calls
    assert results["driver"] == results["dist"]
    got = "\n".join(results["dist"])
    assert "summary drift" in got
    assert "missing from storage" in got
    assert "!= footer" in got
    assert "references no live data file" in got


def test_fsck_distributed_over_spec_avro_manifests(spark, tmp_path, monkeypatch):
    """r11 pin: the fsck Spark lane decodes SPEC-PRIMARY (Avro)
    manifests executor-side — clean v3 DV tree verifies with zero
    driver entry decodes, and a planted missing file still surfaces
    through the distributed walk."""
    from icepack import maintenance as M
    from icepack.maintenance import verify_table
    from icepack.table import IceTable

    df = spark.range(120).selectExpr("id", "CAST(id % 4 AS DOUBLE) v")
    t = IceTable.create(
        spark, str(tmp_path / "sp"), df.schema,
        properties={
            "format.spec-primary": "true",
            "format.spec-version": "3",
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
            "read.plan-mode": "distributed",
        },
    )
    t.append(df)
    # r13: v3 MOR DELETE commits the deletion vectors itself — nothing
    # left for the maintenance consolidation to do on a one-puffin tree
    t.delete(col("v") == 1.0)
    assert M.write_deletion_vectors(t) is None
    assert [
        f for f in t.live_files(content="all") if f.content == "deletion-vectors"
    ]
    calls = []
    orig = IceTable._read_mentries

    def counting(self, name):
        calls.append(name)
        return orig(self, name)

    monkeypatch.setattr(IceTable, "_read_mentries", counting)
    assert verify_table(t, check_data=True) == []
    assert calls == [], f"driver decoded {sorted(set(calls))}"
    monkeypatch.undo()
    victim = [f for f in t.live_files() if f.content == "data"][0].path
    os.remove(victim)
    t.refresh()
    assert any("missing from storage" in x for x in verify_table(t))


def test_fsck_decimal_bucket_drift(spark, warehouse):
    """ADVICE r11 (murmur3 minimal two's-complement): decimal unscaled
    values of exactly -(2^(8k-1)) hashed differently before r11 (ff80
    vs 80 for -1.28 at scale 2), so pre-upgrade bucket-partitioned
    files can sit under the OLD bucket and point predicates silently
    prune them.  verify_table(check_buckets=True) must recompute the
    bucket distributedly and flag exactly the drifted file; a clean
    table returns no findings and non-decimal tables short-circuit."""
    import json as _json
    import os
    from decimal import Decimal

    from pyspark.sql import types as T

    from icepack.maintenance import verify_decimal_buckets, verify_table
    from icepack.murmur3 import bucket as new_bucket
    from icepack.murmur3 import murmur3_x86_32
    from icepack.table import IceTable

    N = 8
    # the affected value: unscaled -128 → new minimal bytes 0x80,
    # old over-padded bytes 0xff80
    new_b = new_bucket(Decimal("-1.28"), N, "decimal(4,2)")
    old_b = (murmur3_x86_32(b"\xff\x80") & 0x7FFFFFFF) % N
    assert new_b != old_b  # the migration hazard is real for this N

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amt", T.DecimalType(4, 2)),
        ]
    )
    rows = [(1, Decimal("-1.28")), (2, Decimal("3.50")), (3, Decimal("-1.28"))]
    t = IceTable.create(
        spark,
        os.path.join(warehouse, "bucket_drift"),
        schema,
        partition_by=[("amt", f"mmh3bucket[{N}]")],
    )
    t.append(spark.createDataFrame(rows, schema))

    assert verify_decimal_buckets(t) == []
    assert verify_table(t, check_buckets=True) == []

    # simulate a pre-r11 layout: re-home the affected file under the
    # bucket the OLD encoding computed (tamper the manifest entry the
    # way an old writer would have written it)
    snap = t.meta.current_snapshot
    tampered = 0
    for m in t._read_mlist(snap.manifest_list):
        mpath = os.path.join(t._mdir, m["manifest-path"])
        lines = open(mpath).read().splitlines()
        out = []
        for ln in lines:
            d = _json.loads(ln)
            if d.get("partition", {}).get("amt_mmh3bucket") == new_b:
                d["partition"]["amt_mmh3bucket"] = old_b
                tampered += 1
            out.append(_json.dumps(d))
        open(mpath, "w").write("\n".join(out) + "\n")
    assert tampered >= 1

    findings = verify_decimal_buckets(t)
    assert len(findings) == tampered
    assert all("decimal-bucket drift" in f and "compact" in f for f in findings)
    # full fsck includes them (plus the summary-drift finding the
    # tamper legitimately triggers — the stored partition summary no
    # longer matches the entries either)
    full = verify_table(t, check_buckets=True)
    assert set(findings) <= set(full)

    # non-decimal bucketed tables never pay a scan
    t2 = IceTable.create(
        spark,
        os.path.join(warehouse, "bucket_drift_str"),
        T.StructType([T.StructField("s", T.StringType())]),
        partition_by=[("s", f"mmh3bucket[{N}]")],
    )
    t2.append(spark.createDataFrame([("a",), ("b",)], t2.meta.schema.to_struct()))
    assert verify_decimal_buckets(t2) == []
