"""Manifest-list phase-0 pruning (icepack/expr.manifest_may_match):
whole manifests are skipped from their partition-range SUMMARIES
without being opened, for both the driver planner (table.plan_files)
and the distributed one (scanplan).  Failure mode is silent row loss,
so every skip-safety veto is pinned: unpartitioned (pre-evolution)
entries, delete-content files, unknown summary layouts.
"""

import pytest
from pyspark.sql import Row

from icepack.expr import col, manifest_may_match
from icepack.table import IceTable

from tests.conftest import rows_sorted


def _mk(spark, path) -> IceTable:
    schema = spark.createDataFrame([Row(id=1, cat="a", v=1.0)]).schema
    t = IceTable.create(
        spark, str(path), schema, partition_by=[("cat", "identity")]
    )
    # three commits -> three manifests, each a single partition value
    for c in ("a", "b", "c"):
        t.append(
            spark.createDataFrame([Row(id=i, cat=c, v=float(i)) for i in range(4)])
        )
    return t


def test_manifest_skip_prunes_and_keeps_rows(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    files, rep = t.plan_files(col("cat") == "c")
    assert rep["manifests_skipped"] == 2  # the a- and b-manifests never opened
    assert {f.partition["cat"] for f in files} == {"c"}
    assert rows_sorted(t.toDF(col("cat") == "c")) == rows_sorted(
        t.toDF().filter("cat = 'c'")
    )
    # skipped manifests still feed the totals from their summary counts
    assert rep["partitions_total"] == 3
    assert rep["files_total"] > rep["files_scanned"] > 0


def test_manifest_skip_range_predicates(spark, tmp_path):
    t = _mk(spark, tmp_path / "r")
    for pred, want in [
        (col("cat") >= "c", {"c"}),
        (col("cat") <= "a", {"a"}),
        (col("cat").isin("a", "c"), {"a", "c"}),
        ((col("cat") == "a") | (col("cat") == "b"), {"a", "b"}),
    ]:
        files, rep = t.plan_files(pred)
        assert {f.partition["cat"] for f in files} == want
        assert rep.get("manifests_skipped", 0) == 3 - len(want)


def test_manifest_skip_respects_partition_evolution(spark, tmp_path):
    """Old-spec manifests hold files the ranges can't describe (no
    partition tuple) — they must never be skipped, whatever the
    predicate says about the NEW partition column's ranges."""
    df = spark.createDataFrame(
        [Row(id=i, cat="ab"[i % 2], v=float(i)) for i in range(6)]
    )
    t = IceTable.create(spark, str(tmp_path / "e"), df.schema)
    t.append(df)  # unpartitioned manifest (old spec)
    t.update_spec([("cat", "identity")])
    t.append(
        spark.createDataFrame([Row(id=10, cat="z", v=10.0)])
    )  # new-spec manifest, range z..z
    files, rep = t.plan_files(col("cat") == "a")
    # the new-spec z-manifest skips; the old unpartitioned one cannot
    assert rep.get("manifests_skipped", 0) == 1
    assert rows_sorted(t.toDF(col("cat") == "a")) == rows_sorted(
        t.toDF().filter("cat = 'a'")
    )


def test_manifest_skip_never_drops_delete_files_distributed(spark, tmp_path):
    """MOR interaction: the distributed planner derives its DELETE list
    from the same manifest set, so a manifest holding delete files must
    veto the skip even when its (data) ranges exclude the predicate."""
    from icepack.scanplan import plan_entries_distributed, read_distributed

    schema = spark.createDataFrame([Row(id=1, cat="a", v=1.0)]).schema
    t = IceTable.create(
        spark,
        str(tmp_path / "m"),
        schema,
        partition_by=[("cat", "identity")],
        properties={"write.delete.mode": "merge-on-read"},
    )
    for c in ("a", "b"):
        t.append(
            spark.createDataFrame([Row(id=i, cat=c, v=float(i)) for i in range(4)])
        )
    t.delete(col("id") == 2)  # equality-delete file (spans both cats)
    files, deletes = plan_entries_distributed(t, col("cat") == "b")
    assert deletes  # the delete file survived phase-0
    assert rows_sorted(read_distributed(t, col("cat") == "b")) == rows_sorted(
        t.toDF().filter("cat = 'b' AND id <> 2")
    )


def test_manifest_skip_all_skipped_is_empty_not_crash(spark, tmp_path):
    from icepack.scanplan import read_distributed

    t = _mk(spark, tmp_path / "z")
    files, rep = t.plan_files(col("cat") == "zzz")
    assert files == [] and rep["manifests_skipped"] == 3
    assert read_distributed(t, col("cat") == "zzz").count() == 0


def test_manifest_may_match_vetoes():
    proj = lambda sid: col("cat") == "zzz"  # noqa: E731 — never matches a..c
    base = {
        "partition-summaries": {"cat": {"min": "a", "max": "c"}},
        "spec-ids": [0],
        "unpartitioned-files": 0,
        "null-partition-values": 0,
        "delete-content-files": 0,
    }
    assert manifest_may_match(base, proj) is False  # skippable
    for veto in (
        {"unpartitioned-files": 1},
        {"null-partition-values": 1},
        {"delete-content-files": 1},
        {"spec-ids": []},
        {"partition-summaries": {}},
    ):
        assert manifest_may_match({**base, **veto}, proj) is True
    # pre-upgrade layout: keys absent entirely -> keep
    assert (
        manifest_may_match(
            {"partition-summaries": {"cat": {"min": "a", "max": "c"}}}, proj
        )
        is True
    )


def test_manifest_skip_day_transform_ranges(spark, tmp_path):
    """Hidden partitioning: day-transform partition values serialize as
    ISO strings in the summaries; projected range predicates must
    compare them correctly (same _cmp_norm path the per-entry check
    uses) — and never lose rows."""
    import datetime as dt

    rows = [
        Row(id=i, ts=dt.datetime(2024, m, 1 + i), v=float(i))
        for m in (1, 2, 3)
        for i in range(3)
    ]
    schema = spark.createDataFrame(rows).schema
    t = IceTable.create(
        spark, str(tmp_path / "d"), schema, partition_by=[("ts", "day")]
    )
    for m in (1, 2, 3):  # one manifest per month
        t.append(
            spark.createDataFrame([r for r in rows if r.ts.month == m], schema)
        )
    files, rep = t.plan_files(col("ts") >= dt.datetime(2024, 3, 1))
    assert rep.get("manifests_skipped", 0) == 2  # jan + feb never opened
    assert rows_sorted(t.toDF(col("ts") >= dt.datetime(2024, 3, 1))) == rows_sorted(
        t.toDF().filter("ts >= timestamp'2024-03-01'")
    )


# -- pure-Python property: the skip may only ever LOSE pruning ----------


from hypothesis import given, settings
from hypothesis import strategies as st

from icepack.expr import Cmp, In, partition_tuple_matches
from icepack.manifest import DataFile, manifest_summary

_vals = st.one_of(st.integers(-9, 9), st.sampled_from(list("abcxyz")), st.none())
_lits = st.one_of(st.integers(-12, 12), st.sampled_from(list("abcxyz")))
_preds = st.one_of(
    st.tuples(st.sampled_from(["<", "<=", ">", ">=", "=", "!="]), _lits).map(
        lambda t: Cmp("p", t[0], t[1])
    ),
    st.lists(_lits, min_size=1, max_size=3).map(lambda vs: In("p", vs)),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_vals, min_size=1, max_size=8), _preds)
def test_manifest_skip_is_conservative(vals, pred):
    """If the summary says SKIP, no entry in the manifest could have
    matched the projected predicate — over arbitrary (mixed-type,
    null-bearing) identity partition values.  Mixed-type ranges merge
    to unknown and null values veto, so skip implies provable
    disjointness."""
    entries = [
        DataFile(
            path=f"f{i}",
            status="added",
            partition={"p": v},
            spec_id=0,
            schema_id=0,
            record_count=1,
            file_size_bytes=1,
        )
        for i, v in enumerate(vals)
    ]
    desc = manifest_summary(entries)
    if manifest_may_match(desc, lambda sid: pred):
        return  # kept: nothing to prove
    for e in entries:
        assert not partition_tuple_matches(pred, e.partition), (
            f"manifest skipped but entry {e.partition} matches {pred}"
        )


def test_harvest_unknown_is_sticky_across_row_groups(tmp_path):
    """A stats-less row group (all-NaN doubles: has_min_max=False) must
    leave the FILE range unknown even when later row groups have
    bounds.  Pre-fix the range narrowed to the known row groups', so
    `x BETWEEN 1 AND 2` would all_match the file and a metadata-only
    COW DELETE dropped the NaN rows that don't match."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from icepack.expr import col as ecol
    from icepack.manifest import harvest_stats

    p = str(tmp_path / "f.parquet")
    w = pq.ParquetWriter(p, pa.schema([("x", pa.float64())]))
    w.write_batch(pa.RecordBatch.from_pylist([{"x": float("nan")}] * 2))
    w.write_batch(pa.RecordBatch.from_pylist([{"x": 1.0}, {"x": 2.0}]))
    w.close()
    n, _, stats = harvest_stats(p)
    assert n == 4
    assert stats["x"]["min"] is None and stats["x"]["max"] is None
    pred = (ecol("x") >= 1.0) & (ecol("x") <= 2.0)
    assert pred.may_match_file(stats, n) is True  # unknown: keep
    assert pred.all_match_file(stats, n) is False  # never provably-all


def test_cow_delete_never_drops_nan_rows(spark, tmp_path):
    """Parquet bounds EXCLUDE NaN, so a [NaN, 99.0] file harvests
    99.0..99.0 and `v = 99.0` used to all-match it — the metadata-only
    COW DELETE fast path then dropped the whole file, deleting the NaN
    row that matches nothing.  Float bounds must never prove all-match."""
    import math

    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(id=1, v=float("nan")), Row(id=2, v=99.0)]
    ).coalesce(1)
    t = IceTable.create(spark, str(tmp_path / "nan"), df.schema)
    t.append(df)
    t.delete(col("v") == 99.0)
    rows = t.toDF().collect()
    assert len(rows) == 1 and rows[0].id == 1 and math.isnan(rows[0].v)


def test_bucket_pruning_hashes_under_the_column_type(spark, tmp_path):
    """Spark's xxhash64 hashes int32 and int64 differently (bucket[8]
    of 7: int→7, long→1), so the projection must hash the literal
    under the COLUMN's declared type.  Pre-fix, an equality scan on a
    bucket-partitioned INT column pruned the wrong bucket and silently
    returned nothing."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("v", T.DoubleType())]
    )
    df = spark.createDataFrame([(i, float(i)) for i in range(20)], schema)
    t = IceTable.create(
        spark, str(tmp_path / "b"), schema, partition_by=[("id", "bucket[8]")]
    )
    t.append(df)
    for k in (0, 7, 13):
        got = [r.id for r in t.toDF(col("id") == k).collect()]
        assert got == [k], f"id=={k} pruned away: {got}"
    got = sorted(r.id for r in t.toDF(col("id").isin(3, 11)).collect())
    assert got == [3, 11]


def test_randomized_end_to_end_pruning_equivalence(spark, tmp_path):
    """Randomized net over the WHOLE pruning stack (phase 0 manifest
    skip → partition tuples → file stats → re-filter): for random
    transforms, data and predicates, the pruned scan must return
    exactly the rows of an unpruned full-scan filter."""
    import datetime as dt
    import random

    from pyspark.sql import Row

    rnd = random.Random(42)
    transforms = [
        ("id", "bucket[4]"),
        ("id", "identity"),
        ("cat", "truncate[1]"),
        ("ts", "day"),
        ("ts", "month"),
    ]
    for trial in range(5):
        src, tr = transforms[trial]
        rows = [
            Row(
                id=rnd.randint(0, 30),
                cat=rnd.choice(["apple", "banana", "cherry", None]),
                ts=dt.datetime(2024, rnd.randint(1, 4), rnd.randint(1, 28)),
                v=rnd.random(),
            )
            for _ in range(60)
        ]
        schema = spark.createDataFrame(rows).schema
        t = IceTable.create(
            spark,
            str(tmp_path / f"r{trial}"),
            schema,
            partition_by=[(src, tr)],
        )
        for lo in (0, 20, 40):  # three commits -> three manifests
            t.append(spark.createDataFrame(rows[lo : lo + 20], schema))
        preds = [
            (col("id") == rnd.randint(0, 30), "id = {0}".format),
            (col("id") >= 15, lambda _: "id >= 15"),
            (col("cat") == "banana", lambda _: "cat = 'banana'"),
            (col("cat").isin("apple", "cherry"), lambda _: "cat IN ('apple','cherry')"),
            (col("ts") >= dt.datetime(2024, 3, 1), lambda _: "ts >= timestamp'2024-03-01'"),
        ]
        for pred, _ in preds:
            want = rows_sorted(t.toDF().filter(pred.to_column()))
            got = rows_sorted(t.toDF(pred))
            assert got == want, f"trial {trial} ({src},{tr}): {pred}"


def test_legacy_prefix_truncate_values_never_prune_wrong(spark, tmp_path):
    """ADVICE r6 (medium): integral truncate switched from string-prefix
    to spec arithmetic (v - v mod W).  A table written under the OLD
    semantics stores prefix-STRING partition values ('12' for 1234);
    projections now produce arithmetic ints.  The comparators must treat
    the type mismatch as unknown (keep), so legacy tables lose pruning
    but never rows.  Simulated by rewriting a fresh table's manifests +
    manifest-list summaries into the legacy string form."""
    import datetime as dt
    import glob
    import json
    import os

    loc = str(tmp_path / "legacy_trunc")
    rows = [(i, f"n{i}") for i in list(range(10, 15)) + list(range(1200, 1205))]
    df = spark.createDataFrame(rows, "id bigint, name string")
    t = IceTable.create(spark, loc, df.schema, partition_by=[("id", "truncate[2]")])
    # two commits -> two files/manifests with distinct prefixes
    t.append(df.filter("id < 100"))
    t.append(df.filter("id >= 100"))
    mdir = os.path.join(loc, "metadata")
    pf_name = t.meta.spec.fields[0].name
    for mpath in glob.glob(os.path.join(mdir, "manifest-*.jsonl")):
        out = []
        for line in open(mpath):
            e = json.loads(line)
            v = e["partition"].get(pf_name)
            if v is not None:
                # legacy form: first W chars of str(value) — W=2
                e["partition"][pf_name] = str(v)[:2] if str(v)[:2] != str(v) else str(v)
            out.append(json.dumps(e))
        open(mpath, "w").write("\n".join(out) + "\n")
    for lpath in glob.glob(os.path.join(mdir, "snap-*.manifest-list.json")):
        descs = json.load(open(lpath))
        for d in descs:
            s = (d.get("partition-summaries") or {}).get(pf_name)
            if s:
                s["min"] = str(s["min"])[:2] if s["min"] is not None else None
                s["max"] = str(s["max"])[:2] if s["max"] is not None else None
        json.dump(descs, open(lpath, "w"))
    t2 = IceTable.load(spark, loc)
    for pred in (
        col("id") == 1203,
        col("id") >= 1200,
        col("id") <= 14,
        col("id").isin(12, 1201),
    ):
        want = rows_sorted(t2.toDF().filter(pred.to_column()))
        got = rows_sorted(t2.toDF(pred))
        assert got == want and got, f"legacy truncate lost rows for {pred}"
    # the selected set still contains the matching row's file (column
    # stats may legitimately prune others; the legacy PARTITION tuples
    # themselves are unprunable type-mismatches)
    hit, report = t2.plan_files(col("id") == 1203)
    assert sum(f.record_count for f in hit) >= 1
    from icepack.expr import Cmp, partition_tuple_matches

    assert partition_tuple_matches(Cmp(pf_name, "=", 1202), {pf_name: "12"})
