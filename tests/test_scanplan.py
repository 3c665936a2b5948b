"""Distributed scan planning (icepack/scanplan.py): the Spark-side
pruning translation must agree with the driver-side evaluator.

Contract (module docstring): the distributed selection is a SUPERSET of
the driver planner's (it may only lose pruning, never rows), the final
rows are identical (the full filter re-applies on both paths), and for
a selective predicate it actually prunes.
"""

import datetime as dt

from pyspark.sql import Row

from icepack.expr import col
from pyspark.sql import functions as F
from icepack.scanplan import plan_entries_distributed, read_distributed
from icepack.table import IceTable

from tests.conftest import rows_sorted

PREDICATES = [
    None,
    col("id") < 4,
    col("id") >= 9,
    col("cat") == "a",
    col("cat") != "b",
    col("cat").isin("a", "c"),
    (col("id") > 2) & (col("cat") == "b"),
    (col("id") <= 1) | (col("id") >= 10),
    col("note").is_null(),
    col("note").is_not_null(),
    col("ts") >= "2024-01-03 00:00:00",
    (col("ts") < "2024-01-02 00:00:00") | (col("cat") == "c"),
]


def _mk(spark, path) -> IceTable:
    rows = [
        Row(
            id=i,
            cat="abc"[i % 3],
            v=float(i) * 1.5,
            ts=dt.datetime(2024, 1, 1 + i % 5),
            note=None if i % 4 == 0 else f"n{i}",
        )
        for i in range(12)
    ]
    df = spark.createDataFrame(rows)
    t = IceTable.create(
        spark,
        str(path),
        df.schema,
        partition_by=[("cat", "identity")],
        properties={"write.delete.mode": "merge-on-read"},
    )
    # three commits → several files per partition with varied bounds
    t.append(df.filter("id < 4"))
    t.append(df.filter("id >= 4 AND id < 8"))
    t.append(df.filter("id >= 8"))
    t.delete(col("id") == 5)  # live equality-delete file in the manifests
    return t


def test_distributed_planning_superset_and_identical_rows(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    total = len(t.live_files())
    pruned_somewhere = False
    for pred in PREDICATES:
        exact, _report = t.plan_files(pred)
        dist_data, dist_dels = plan_entries_distributed(t, pred)
        exact_paths = {f.path for f in exact}
        dist_paths = {f.path for f in dist_data}
        assert exact_paths <= dist_paths, f"lost files under {pred}"
        assert {d.path for d in dist_dels} == {
            d.path for d in t.live_files(content="all") if d.content != "data"
        }
        assert rows_sorted(read_distributed(t, pred)) == rows_sorted(t.toDF(pred)), (
            f"row mismatch under {pred}"
        )
        if pred is not None and len(dist_paths) < total:
            pruned_somewhere = True
    assert pruned_somewhere, "distributed planner never pruned anything"


def test_distributed_planning_prunes_selectively(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    total = len(t.live_files())
    data, _ = plan_entries_distributed(t, col("id") >= 9)
    assert 0 < len(data) < total
    # and the sequence-correct MOR view holds: id=5 stays deleted
    ids = {r.id for r in read_distributed(t, col("id") > 3).collect()}
    assert ids == {4, 6, 7, 8, 9, 10, 11}


def test_distributed_planning_survives_schema_rename(spark, tmp_path):
    """Entries carry schema-ids; after a rename the distributed-planned
    read must reconcile old files to the current schema exactly like
    toDF (ID-based column mapping)."""
    t = _mk(spark, tmp_path / "t")
    t.rename_column("v", "score")
    got = rows_sorted(read_distributed(t, col("id") < 3).select("id", "score"))
    want = rows_sorted(t.toDF(col("id") < 3).select("id", "score"))
    assert got == want and len(got) == 3


def test_plan_mode_property_switches_todf(spark, tmp_path):
    """``read.plan-mode = 'distributed'`` flips toDF's planner; rows
    and MOR semantics are unchanged and the scan log records which
    planner ran."""
    t = _mk(spark, tmp_path / "t")
    want = rows_sorted(t.toDF(col("cat") == "a"))
    t.set_properties(**{"read.plan-mode": "distributed"})
    got = rows_sorted(t.toDF(col("cat") == "a"))
    assert got == want
    assert t._scan_log[-1].get("planner") == "distributed"


def test_distributed_tuple_prune_numeric_spelled_strings(spark, tmp_path):
    """r9 ADVICE (high): a STRING identity-partition value that spells
    a number ("1.50") is stored numerically by the directory decode
    (float 1.5, re-spelled "1.5" in the manifest JSON); the distributed
    tuple compare against the literal "1.50" must treat that as
    UNKNOWN and keep the file — not string-compare and prune it."""
    from pyspark.sql import Row

    rows = [Row(id=i, c=v) for i, v in enumerate(["1.50", "1.50", "abc", "2.25"])]
    df = spark.createDataFrame(rows)
    t = IceTable.create(
        spark, str(tmp_path / "t"), df.schema, partition_by=[("c", "identity")]
    )
    t.append(df)
    for pred in [
        col("c") == "1.50",
        col("c") >= "1.50",
        col("c").isin("1.50", "9.99"),
        col("c") != "abc",
    ]:
        want = rows_sorted(t.toDF(pred))
        data, _ = plan_entries_distributed(t, pred)
        driver_files, _rep = t.plan_files(pred)
        assert {f.path for f in driver_files} <= {f.path for f in data}, pred
        assert rows_sorted(read_distributed(t, pred)) == want, pred
    # non-numeric string equality still prunes the numeric-tuple files
    data, _ = plan_entries_distributed(t, col("c") == "abc")
    assert len(data) < len(t.live_files())


def test_distributed_planning_composes_with_storage_seam(spark, tmp_path):
    """Distributed planning must work when the metadata lives in a
    non-POSIX store (seam proof: InMemoryStore) — the manifests are no
    longer files Spark can open, so the planner ships their JSONL
    through the store instead of handing paths to spark.read.json."""
    from icepack.storage import InMemoryStore

    mem = InMemoryStore()
    rows = [Row(id=i, cat="ab"[i % 2], v=float(i)) for i in range(8)]
    df = spark.createDataFrame(rows)
    t = IceTable.create(spark, str(tmp_path / "m"), df.schema, store=mem)
    t.append(df.filter("id < 4"))
    t.append(df.filter("id >= 4"))

    pred = col("id") >= 4
    files, deletes = plan_entries_distributed(t, pred)
    assert deletes == []
    driver_files, _ = t.plan_files(pred)
    assert {f.path for f in driver_files} <= {f.path for f in files}
    assert rows_sorted(read_distributed(t, pred)) == rows_sorted(
        t.toDF().filter("id >= 4")
    )


def test_translation_superset_on_random_trees(spark):
    """Random predicate trees over random (null-bearing) stats rows:
    the Spark translation may only ever LOSE pruning relative to the
    Python evaluator — never drop a file it would keep.  The fixed
    PREDICATES battery covers the curated cases; this sweeps the
    combinator space (And/Or/In/IsNull nesting) the battery can't."""
    import random

    from pyspark.sql import functions as F

    from icepack.expr import And, Cmp, In, IsNull, NotNull, Or
    from icepack.scanplan import ENTRY_SCHEMA, may_match_column

    rnd = random.Random(7)

    def rand_pred(depth=0):
        r = rnd.random()
        if depth < 2 and r < 0.35:
            node = And if r < 0.175 else Or
            return node(rand_pred(depth + 1), rand_pred(depth + 1))
        r = rnd.random()
        if r < 0.15:
            return IsNull("x")
        if r < 0.3:
            return NotNull("x")
        if r < 0.5:
            return In("x", [rnd.randint(-12, 12) for _ in range(rnd.randint(1, 3))])
        return Cmp("x", rnd.choice(["<", "<=", ">", ">=", "=", "!="]), rnd.randint(-12, 12))

    def rand_entry(i):
        rc = rnd.randint(1, 10)
        if rnd.random() < 0.15:  # stats-less column
            st = {"x": {"min": None, "max": None, "nulls": None}}
        else:
            lo, hi = sorted(rnd.randint(-10, 10) for _ in range(2))
            nulls = rnd.choice([0, 0, rnd.randint(0, rc), None])
            st = {"x": {"min": str(lo), "max": str(hi), "nulls": nulls}}
        return {
            "path": f"f{i}", "status": "added", "spec-id": 0, "schema-id": 0,
            "record-count": rc, "file-size-bytes": 1, "sequence-number": 1,
            "content": "data", "equality-columns": [], "partition": {},
            "stats": st,
        }

    import json as _json

    for trial in range(12):
        pred = rand_pred()
        entries = [rand_entry(i) for i in range(40)]
        df = spark.read.json(
            spark.sparkContext.parallelize([_json.dumps(e) for e in entries]),
            schema=ENTRY_SCHEMA,
        )
        kept_spark = {
            r.path
            for r in df.filter(
                may_match_column(pred, F.col("stats"), F.col("record-count"))
            ).collect()
        }
        def _st(e):
            s = e["stats"]["x"]
            if s["min"] is None and s["nulls"] is None:
                return {}
            return {"x": {"min": None if s["min"] is None else int(s["min"]),
                          "max": None if s["max"] is None else int(s["max"]),
                          "nulls": s["nulls"]}}
        kept_py = {
            e["path"]
            for e in entries
            if pred.may_match_file(_st(e), e["record-count"])
        }
        assert kept_py <= kept_spark, (
            f"trial {trial}: python kept {sorted(kept_py - kept_spark)} "
            f"that spark dropped for {pred}"
        )


def test_distributed_pruning_exact_beyond_double_precision(spark, tmp_path):
    """int64 stats past 2^53: a double-rounded comparison would prune
    files the exact planner keeps (hash-derived ids live up there).
    The translation must compare int literals as longs, exactly."""
    base = 1 << 53  # 9007199254740992: doubles can't tell base+1 from base
    rows = [Row(id=base + i, v=float(i)) for i in range(4)]
    df = spark.createDataFrame(rows)
    t = IceTable.create(spark, str(tmp_path / "big"), df.schema)
    for r in rows:  # one file per value -> per-file exact bounds
        t.append(spark.createDataFrame([r], df.schema))
    pred = col("id") > base + 1
    files, _ = plan_entries_distributed(t, pred)
    driver_files, _ = t.plan_files(pred)
    assert {f.path for f in driver_files} <= {f.path for f in files}
    assert rows_sorted(read_distributed(t, pred)) == rows_sorted(
        t.toDF().filter(f"id > {base + 1}")
    )
    assert read_distributed(t, pred).count() == 2


def test_auto_plan_mode_defaults_distributed_past_thresholds(spark, tmp_path):
    """read.plan-mode defaults to 'auto': a many-manifest table flips
    to the distributed planner WITHOUT opt-in (the O(entries) driver
    walk is the 100 TB bottleneck posture), small tables keep the
    cheaper driver plan, thresholds and mode are property-overridable,
    and rows are identical either way."""
    t = _mk(spark, tmp_path / "t")
    # small table, default thresholds: driver planner
    want = rows_sorted(t.toDF(col("cat") == "a"))
    assert t._scan_log[-1].get("planner") != "distributed"
    # shrink the manifest threshold under this table's manifest count:
    # auto now plans distributed, rows identical
    t.set_properties(**{"read.plan-mode.auto.manifest-threshold": "2"})
    assert rows_sorted(t.toDF(col("cat") == "a")) == want
    assert t._scan_log[-1].get("planner") == "distributed"
    # file-count threshold path (manifest threshold back out of reach)
    t.set_properties(
        **{
            "read.plan-mode.auto.manifest-threshold": "10000",
            "read.plan-mode.auto.file-threshold": "3",
        }
    )
    assert rows_sorted(t.toDF(col("cat") == "a")) == want
    assert t._scan_log[-1].get("planner") == "distributed"
    # explicit driver mode always wins over auto thresholds
    t.set_properties(**{"read.plan-mode": "driver"})
    assert rows_sorted(t.toDF(col("cat") == "a")) == want
    assert t._scan_log[-1].get("planner") != "distributed"


def test_dml_plans_distributed_past_thresholds(spark, tmp_path):
    """plan_files itself delegates predicated plans to the distributed
    planner past the auto thresholds, so DML hit-file search (DELETE /
    UPDATE / MERGE) escapes the driver walk too.  The distributed
    selection is a pinned superset — extra hit files mean extra
    rewrites, never wrong rows — pinned here end-to-end through a COW
    delete and an update."""
    t = _mk(spark, tmp_path / "t")
    t.set_properties(
        **{
            "write.delete.mode": "copy-on-write",
            "read.plan-mode.auto.manifest-threshold": "2",
        }
    )
    files, rep = t.plan_files(col("id") >= 9)
    assert rep.get("planner") == "distributed"
    assert 0 < rep["files_scanned"] <= rep["files_total"]
    t.delete(col("id") >= 9)
    t.update(col("id") == 2, {"v": F.lit(0.0)})
    got = rows_sorted(t.toDF().select("id", "v"))
    want = sorted(
        [(i, 0.0 if i == 2 else float(i) * 1.5) for i in range(9) if i != 5],
        key=lambda x: tuple(map(repr, x)),
    )
    assert got == want


def test_distributed_planning_int_literal_over_double_stats(spark, tmp_path):
    """Int literal over a double column: the stat strings ("1.5") must
    try_cast to NULL (keep the file) — under Spark 4's default ANSI
    mode a plain cast THROWS and failed the whole scan the moment auto
    plan-mode made distributed planning a default (found by ice60)."""
    t = _mk(spark, tmp_path / "t")
    want = rows_sorted(t.toDF(col("v") > 3))
    t.set_properties(**{"read.plan-mode": "distributed"})
    assert rows_sorted(t.toDF(col("v") > 3)) == want  # v is double
    assert t._scan_log[-1].get("planner") == "distributed"


def test_bucket_tuple_pruning_distributed(spark, tmp_path):
    """r9: the distributed planner runs phase-1 partition-TUPLE pruning
    too.  On a bucket(16) spec an equality predicate on the bucketed
    key is unprunable by min/max stats whenever a file's value range
    covers the literal (files in one bucket span the full source
    range) — the tuple check is the PRIMARY pruning dimension
    (docs/07-partitioning.md:51, docs/09-query-performance.md:19-31).
    Data is appended in strided batches so every bucket file has wide
    min/max; the distributed selection must MATCH the driver planner's
    (tuple + stats), not merely the stats-only superset, while auto
    plan-mode picks the distributed planner."""
    rows = [Row(id=i, v=float(i)) for i in range(64)]
    df = spark.createDataFrame(rows)
    t = IceTable.create(
        spark,
        str(tmp_path / "b"),
        df.schema,
        partition_by=[("id", "bucket[16]")],
        properties={"read.plan-mode.auto.manifest-threshold": "2"},
    )
    # strided appends: each bucket's file covers ids across 0..63,
    # defeating min/max pruning for any single-id equality
    for k in range(4):
        t.append(df.filter(f"id % 4 = {k}"))
    total = len(t.live_files())
    pruned = False
    for probe in (0, 7, 13, 42, 63):
        pred = col("id") == probe
        dist, _dels = plan_entries_distributed(t, pred)
        exact, rep = t.plan_files(pred)
        assert rep.get("planner") == "distributed"  # auto flipped
        # driver-mode twin: tuple+stats walk
        t.set_properties(**{"read.plan-mode": "driver"})
        drv, drep = t.plan_files(pred)
        t.set_properties(**{"read.plan-mode": "auto"})
        assert drep.get("planner") != "distributed"
        assert {f.path for f in dist} == {f.path for f in drv}, (
            f"bucket-tuple pruning diverged from driver planner for id={probe}"
        )
        if len(dist) < total:
            pruned = True
        got = {r.id for r in read_distributed(t, pred).collect()}
        assert got == {probe}
    assert pruned, "bucket spec never pruned a file"


def test_partition_match_column_superset_random(spark):
    """Random PROJECTED predicates over random partition tuples: the
    Spark tuple translation (partition_match_column) may only ever
    LOSE pruning relative to expr.partition_tuple_matches — never drop
    an entry the Python evaluator keeps."""
    import json as _json
    import random

    from icepack.expr import And, Cmp, In, Or, partition_tuple_matches
    from icepack.scanplan import ENTRY_SCHEMA, partition_match_column

    rnd = random.Random(11)

    def rand_lit():
        r = rnd.random()
        if r < 0.4:
            return rnd.randint(0, 8)
        if r < 0.65:
            return round(rnd.uniform(0, 8), 2)
        if r < 0.8:
            # numeric-spelled STRING literal ("1.50") — the r9 ADVICE
            # spelling collision: the stored tuple for that data value
            # is float 1.5, so a raw string compare would lose the file
            return f"{rnd.uniform(0, 8):.2f}"
        return f"2024-01-0{rnd.randint(1, 8)}"

    def rand_pred(depth=0):
        r = rnd.random()
        if depth < 2 and r < 0.3:
            node = And if r < 0.15 else Or
            return node(rand_pred(depth + 1), rand_pred(depth + 1))
        if rnd.random() < 0.3:
            return In("p", [rand_lit() for _ in range(rnd.randint(1, 3))])
        return Cmp("p", rnd.choice(["<", "<=", ">", ">=", "=", "!="]), rand_lit())

    def rand_entry(i):
        part = {}
        if rnd.random() < 0.8:
            part["p"] = rnd.choice(
                [
                    rnd.randint(0, 8),
                    round(rnd.uniform(0, 8), 2),
                    None,
                    f"s{rnd.randint(0, 3)}",
                    f"2024-01-0{rnd.randint(1, 8)}",
                    # what _decode_like stores for string data "1.50":
                    # the float — numeric re-spelling collision fodder
                    float(f"{rnd.uniform(0, 8):.2f}"),
                ]
            )
        if rnd.random() < 0.3:
            part["q"] = rnd.randint(0, 3)
        return {
            "path": f"f{i}", "status": "added", "spec-id": 0, "schema-id": 0,
            "record-count": 3, "file-size-bytes": 1, "sequence-number": 1,
            "content": "data", "equality-columns": [], "partition": part,
            "stats": {},
        }

    for trial in range(12):
        pred = rand_pred()
        entries = [rand_entry(i) for i in range(40)]
        df = spark.read.json(
            spark.sparkContext.parallelize([_json.dumps(e) for e in entries]),
            schema=ENTRY_SCHEMA,
        )
        guarded = F.coalesce(
            partition_match_column(pred, F.col("partition")), F.lit(True)
        )
        kept_spark = {r.path for r in df.filter(guarded).collect()}
        kept_py = {
            e["path"]
            for e in entries
            if not e["partition"] or partition_tuple_matches(pred, e["partition"])
        }
        assert kept_py <= kept_spark, (
            f"trial {trial}: python kept {sorted(kept_py - kept_spark)} "
            f"that spark dropped for {pred}"
        )


def test_large_in_collapses_to_range(spark, tmp_path):
    """An In past IN_EXPAND_MAX literals (a MERGE prune predicate can
    carry 100k per key) must not expand into a per-value OR chain —
    that builds a multi-million-node Catalyst expression (driver OOM /
    analysis stall).  It collapses to a min/max RANGE check: the
    translated expression stays small, still prunes below-range files,
    and rows are identical."""
    from icepack.expr import In
    from icepack.scanplan import IN_EXPAND_MAX, may_match_column

    t = _mk(spark, tmp_path / "t")
    values = list(range(9, 9 + IN_EXPAND_MAX * 5))
    expr_str = str(
        may_match_column(In("id", values), F.col("stats"), F.col("record-count"))
    )
    # collapsed: two range comparisons (~hundreds of chars), not
    # IN_EXPAND_MAX*5 equality subtrees (~100 chars each)
    assert len(expr_str) < 5_000
    pred = col("id").isin(*values)
    dist, _ = plan_entries_distributed(t, pred)
    drv, _ = t.plan_files(pred)
    total = len(t.live_files())
    assert {f.path for f in drv} <= {f.path for f in dist}
    assert len(dist) < total  # range [9, ...] prunes the low files
    assert rows_sorted(read_distributed(t, pred)) == rows_sorted(t.toDF(pred))


def test_spec_primary_distributed_decode_stays_off_driver(spark, tmp_path, monkeypatch):
    """format.spec-primary=true: distributed planning must decode the
    Avro manifests EXECUTOR-side (mapInPandas over manifest paths with
    the pure-Python avroenc reader) — a 100 TB spec-primary table must
    not pay O(entries) driver work in exactly the mode built to avoid
    it.  Pinned by counting driver-side manifest decodes: zero during
    plan_entries_distributed; rows identical to the driver planner."""
    rows = [Row(id=i, cat="ab"[i % 2], v=float(i)) for i in range(10)]
    df = spark.createDataFrame(rows)
    t = IceTable.create(
        spark,
        str(tmp_path / "sp"),
        df.schema,
        properties={"format.spec-primary": "true"},
    )
    t.append(df.filter("id < 5"))
    t.append(df.filter("id >= 5"))
    want = rows_sorted(t.toDF(col("id") >= 4))

    calls = []
    orig = IceTable._read_mentries

    def counting(self, name):
        calls.append(name)
        return orig(self, name)

    monkeypatch.setattr(IceTable, "_read_mentries", counting)
    files, dels = plan_entries_distributed(t, col("id") >= 4)
    assert calls == [], "spec-primary manifests decoded driver-side"
    monkeypatch.setattr(IceTable, "_read_mentries", orig)
    assert rows_sorted(read_distributed(t, col("id") >= 4)) == want
    drv, _ = t.plan_files(col("id") >= 4)
    assert {f.path for f in drv} <= {f.path for f in files}


def test_distributed_plan_prunes_anchored_deletes(spark, tmp_path):
    """r9: v3 deletion-vector entries are one-per-deleted-data-file, so
    a distributed plan that collects EVERY delete entry is O(table)
    driver memory.  DV entries referencing pruned-away data files are
    dropped Spark-side (they cannot mask rows of files the scan never
    reads); un-anchored deletes (equality / multi-file pos parquet)
    are always kept.  Rows stay identical to the driver-planned scan."""
    from icepack import maintenance as M

    rows = [Row(id=i, grp=i // 10, v=float(i)) for i in range(40)]
    df = spark.createDataFrame(rows)
    t = IceTable.create(
        spark,
        str(tmp_path / "dv"),
        df.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.mor.strategy": "position",
        },
    )
    for g in range(4):  # one file per grp decade -> per-file DVs
        t.append(df.filter(f"grp = {g}").coalesce(1))
    # position-delete a row in EVERY file, then fold to DVs
    t.delete(col("id").isin(3, 13, 23, 33))
    assert M.write_deletion_vectors(t) is not None
    all_deletes = [
        f for f in t.live_files(content="all") if f.content != "data"
    ]
    dvs = [f for f in all_deletes if f.content == "deletion-vectors"]
    assert len(dvs) == 4  # one per data file

    pred = col("grp") == 2
    files, dels = plan_entries_distributed(t, pred)
    surviving = {f.path for f in files}
    kept_dvs = [d for d in dels if d.content == "deletion-vectors"]
    # only DVs anchored to surviving files travel to the driver
    assert 0 < len(kept_dvs) < len(dvs)
    assert {d.referenced_data_file for d in kept_dvs} <= surviving
    want = rows_sorted(t.toDF(pred))  # driver-planned twin
    assert rows_sorted(read_distributed(t, pred)) == want
    # the masked row is really masked on the distributed path
    ids = {r.id for r in read_distributed(t, pred).collect()}
    assert ids == {20, 21, 22, 24, 25, 26, 27, 28, 29}
