"""Unit tests for the pruning expression language (icepack/expr.py):
three-valued stats evaluation and partition projection."""

import datetime as dt

from icepack.expr import AlwaysTrue, In, col, partition_tuple_matches, project_to_partition
from icepack.metadata import IceSchema, NestedField, PartitionField, PartitionSpec

REC = 100


def stats(lo, hi, nulls=0):
    return {"x": {"min": lo, "max": hi, "nulls": nulls}}


def test_cmp_pruning():
    e = col("x") > 10
    assert e.may_match_file(stats(0, 5), REC) is False
    assert e.may_match_file(stats(0, 15), REC) is True
    assert (col("x") < 0).may_match_file(stats(0, 5), REC) is False
    assert (col("x") == 7).may_match_file(stats(0, 5), REC) is False
    assert (col("x") == 3).may_match_file(stats(0, 5), REC) is True
    assert (col("x") != 3).may_match_file(stats(3, 3), REC) is False
    assert (col("x") != 3).may_match_file(stats(3, 4), REC) is True


def test_missing_stats_keep():
    e = col("x") > 10
    assert e.may_match_file({}, REC) is True
    assert e.may_match_file({"x": {"min": None, "max": None, "nulls": None}}, REC) is True
    assert e.may_match_file({"y": {"min": 0, "max": 1, "nulls": 0}}, REC) is True


def test_null_pruning():
    assert col("x").is_null().may_match_file(stats(0, 5, nulls=0), REC) is False
    assert col("x").is_null().may_match_file(stats(0, 5, nulls=1), REC) is True
    assert col("x").is_not_null().may_match_file(stats(0, 5, nulls=REC), REC) is False
    # all-null file can't match a comparison
    assert (col("x") > 1).may_match_file(stats(0, 5, nulls=REC), REC) is False


def test_and_or_not():
    e = (col("x") > 10) & (col("x") < 20)
    assert e.may_match_file(stats(0, 5), REC) is False
    assert e.may_match_file(stats(12, 15), REC) is True
    e2 = (col("x") > 10) | (col("x") < -5)
    assert e2.may_match_file(stats(-10, -7), REC) is True
    neg = ~(col("x") > 10)  # rewrites to x <= 10
    assert neg.may_match_file(stats(20, 30), REC) is False


def test_timestamp_string_mixing():
    e = col("x") >= "2024-01-10"
    s = stats(dt.datetime(2024, 1, 1).isoformat(), dt.datetime(2024, 1, 5).isoformat())
    assert e.may_match_file(s, REC) is False
    s2 = stats(dt.datetime(2024, 1, 1).isoformat(), dt.datetime(2024, 1, 15).isoformat())
    assert e.may_match_file(s2, REC) is True


def _spec_schema():
    schema = IceSchema(
        0,
        [NestedField(1, "ts", "timestamp_ntz"), NestedField(2, "kind", "string")],
    )
    spec = PartitionSpec(
        0, [PartitionField(1, 1000, "day", "ts_day"), PartitionField(2, 1001, "identity", "kind")]
    )
    return spec, schema


def test_projection_day_range():
    spec, schema = _spec_schema()
    pred = (col("ts") >= "2024-01-10") & (col("ts") < "2024-01-12")
    p = project_to_partition(pred, spec, schema)
    assert partition_tuple_matches(p, {"ts_day": "2024-01-10", "kind": "a"})
    assert partition_tuple_matches(p, {"ts_day": "2024-01-11", "kind": "a"})
    # upper bound is inclusive after truncation (< 2024-01-12 00:00 keeps day 12: safe superset)
    assert not partition_tuple_matches(p, {"ts_day": "2024-01-09", "kind": "a"})
    assert not partition_tuple_matches(p, {"ts_day": "2024-02-01", "kind": "a"})


def test_projection_identity_eq_and_in():
    spec, schema = _spec_schema()
    p = project_to_partition(col("kind") == "a", spec, schema)
    assert partition_tuple_matches(p, {"ts_day": "2024-01-01", "kind": "a"})
    assert not partition_tuple_matches(p, {"ts_day": "2024-01-01", "kind": "b"})
    p2 = project_to_partition(In("kind", ["a", "b"]), spec, schema)
    assert partition_tuple_matches(p2, {"kind": "b"})
    assert not partition_tuple_matches(p2, {"kind": "c"})


def test_projection_unknown_shape_is_true():
    spec, schema = _spec_schema()
    p = project_to_partition(col("other") == 1, spec, schema)
    assert isinstance(p, AlwaysTrue) or partition_tuple_matches(p, {"ts_day": "x", "kind": "y"})


def test_or_projection_keeps_both_sides():
    spec, schema = _spec_schema()
    pred = (col("kind") == "a") | (col("ts") >= "2024-06-01")
    p = project_to_partition(pred, spec, schema)
    assert partition_tuple_matches(p, {"ts_day": "2024-01-01", "kind": "a"})
    assert partition_tuple_matches(p, {"ts_day": "2024-07-01", "kind": "zzz"})
    assert not partition_tuple_matches(p, {"ts_day": "2024-01-01", "kind": "b"})


def test_statistics_less_column_never_crashes_planner():
    """A parquet column with NO statistics harvests as
    {"min": None, "max": None, "nulls": None} (manifest.py); every
    predicate shape must treat that as unknown -> keep, not crash
    (found by the round-4 distributed-pruning translation work)."""
    from icepack.expr import Cmp, In, IsNull, NotNull

    s = {"c": {"min": None, "max": None, "nulls": None}}
    for e in (
        IsNull("c"),
        NotNull("c"),
        Cmp("c", "=", 5),
        Cmp("c", "<", 5),
        Cmp("c", "!=", 5),
        In("c", [1, 2]),
    ):
        assert e.may_match_file(s, 10) is True
        assert e.all_match_file(s, 10) is False


def test_in_bisect_fast_path_matches_per_value_walk():
    """Large numeric In lists take a sorted+bisect path (O(log n) per
    file); it must be decision-identical to the per-value Cmp walk on
    every gated shape, and non-numeric / NaN / bool shapes must fall
    through to the walk unchanged."""
    import random

    from icepack.expr import Cmp, In

    rnd = random.Random(3)

    def walk(e, stats, rc):
        return any(
            Cmp(e.name, "=", v).may_match_file(stats, rc) for v in e.values
        )

    for trial in range(200):
        n = rnd.choice([32, 40, 200])
        vals = [
            rnd.choice([rnd.randint(-50, 50), rnd.uniform(-50, 50)])
            for _ in range(n)
        ]
        e = In("x", vals)
        lo = rnd.choice([rnd.randint(-60, 60), rnd.uniform(-60, 60), None])
        hi = (
            None
            if lo is None and rnd.random() < 0.5
            else rnd.choice([rnd.randint(-60, 60), rnd.uniform(-60, 60), None])
        )
        if lo is not None and hi is not None and lo > hi:
            lo, hi = hi, lo
        rc = rnd.randint(1, 5)
        nulls = rnd.choice([0, 0, rc, None])
        stats = {"x": {"min": lo, "max": hi, "nulls": nulls}}
        assert e.may_match_file(stats, rc) == walk(e, stats, rc), (
            trial, lo, hi, nulls, rc
        )
    # ungated shapes: strings, bools, NaN values — identical to walk
    for vals in (
        ["a"] * 40,
        [True] * 40,
        [float("nan")] + list(range(40)),
        list(range(31)),  # below the gate
    ):
        e = In("x", vals)
        stats = {"x": {"min": 0, "max": 10, "nulls": 0}}
        assert e.may_match_file(stats, 5) == walk(e, stats, 5)
    # NaN / string bounds fall through too
    e = In("x", list(range(40)))
    for b in (float("nan"), "zz"):
        stats = {"x": {"min": b, "max": b, "nulls": 0}}
        assert e.may_match_file(stats, 5) == walk(e, stats, 5)
