"""Property-based tests (hypothesis) for the scan pruner.

The pruner is the only custom planner in the engine and its failure
mode is SILENT ROW LOSS (SURVEY.md §5.5), so we verify its two
contracts against brute-force row evaluation over arbitrary data:

- ``may_match_file`` == False  ⇒  no row in the file matches
  (pruning never loses rows);
- ``all_match_file`` == True   ⇒  every row in the file matches
  (full-file DELETE drops never keep rows they shouldn't).
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from icepack.expr import Cmp, In, IsNull, NotNull, col

values = st.one_of(st.integers(-50, 50), st.none())
rows = st.lists(values, min_size=1, max_size=30)
ops = st.sampled_from(["<", "<=", ">", ">=", "=", "!="])
lit = st.integers(-60, 60)


def file_stats(data):
    nn = [v for v in data if v is not None]
    return {
        "x": {
            "min": min(nn) if nn else None,
            "max": max(nn) if nn else None,
            "nulls": sum(1 for v in data if v is None),
        }
    }


def row_matches(pred, v):
    if isinstance(pred, Cmp):
        if v is None:
            return False
        return {
            "<": v < pred.value,
            "<=": v <= pred.value,
            ">": v > pred.value,
            ">=": v >= pred.value,
            "=": v == pred.value,
            "!=": v != pred.value,
        }[pred.op]
    if isinstance(pred, In):
        return v is not None and v in pred.values
    if isinstance(pred, IsNull):
        return v is None
    if isinstance(pred, NotNull):
        return v is not None
    raise TypeError(pred)


@st.composite
def predicates(draw):
    kind = draw(st.sampled_from(["cmp", "in", "isnull", "notnull", "and", "or", "not"]))
    if kind == "cmp":
        return Cmp("x", draw(ops), draw(lit))
    if kind == "in":
        return In("x", draw(st.lists(lit, min_size=1, max_size=5)))
    if kind == "isnull":
        return IsNull("x")
    if kind == "notnull":
        return NotNull("x")
    a = Cmp("x", draw(ops), draw(lit))
    b = Cmp("x", draw(ops), draw(lit))
    if kind == "and":
        return a & b
    if kind == "or":
        return a | b
    return ~a


def eval_row(pred, v):
    from icepack.expr import And, Or

    if isinstance(pred, And):
        return eval_row(pred.left, v) and eval_row(pred.right, v)
    if isinstance(pred, Or):
        return eval_row(pred.left, v) or eval_row(pred.right, v)
    return row_matches(pred, v)


@settings(max_examples=500, deadline=None)
@given(data=rows, pred=predicates())
def test_may_match_is_superset(data, pred):
    stats = file_stats(data)
    if not pred.may_match_file(stats, len(data)):
        assert not any(eval_row(pred, v) for v in data), (
            f"pruned a file containing matches: {pred} over {data}"
        )


@settings(max_examples=500, deadline=None)
@given(data=rows, pred=predicates())
def test_all_match_is_subset(data, pred):
    stats = file_stats(data)
    if pred.all_match_file(stats, len(data)):
        assert all(eval_row(pred, v) for v in data), (
            f"full-match claimed but a row doesn't match: {pred} over {data}"
        )


@settings(max_examples=300, deadline=None)
@given(data=rows, pred=predicates())
def test_negation_consistency(data, pred):
    """~pred prunes only files where pred matches every row."""
    stats = file_stats(data)
    neg = ~pred
    if not neg.may_match_file(stats, len(data)):
        assert all(eval_row(pred, v) or v is None for v in data)


def test_float_nan_stats_keep():
    """NaN bounds must never prune (parquet writers may emit NaN)."""
    stats = {"x": {"min": math.nan, "max": math.nan, "nulls": 0}}
    assert (col("x") > 0).may_match_file(stats, 10) is True
    assert (col("x") > 0).all_match_file(stats, 10) is False
