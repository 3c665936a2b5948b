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


# ----------------------- decimal truncate projection (r10 new lane) --------

from decimal import Decimal as _D  # noqa: E402

_dec_vals = st.decimals(
    min_value=-99, max_value=99, places=2, allow_nan=False, allow_infinity=False
)
_dec_lits = st.one_of(
    st.decimals(min_value=-100, max_value=100, places=2, allow_nan=False,
                allow_infinity=False),
    st.decimals(min_value=-100, max_value=100, places=3, allow_nan=False,
                allow_infinity=False),  # finer than column scale
    st.floats(min_value=-100, max_value=100, allow_nan=False),
    st.integers(-100, 100),
)


def _spark_matches(op, lit, v):
    """Ground truth under SPARK comparison semantics: a float literal
    compares in the double domain (Spark casts decimal→double), an
    int/Decimal literal compares exactly."""
    left = float(v) if isinstance(lit, float) else v
    if op == "<":
        return left < lit
    if op == "<=":
        return left <= lit
    if op == ">":
        return left > lit
    if op == ">=":
        return left >= lit
    if op == "=":
        return left == lit
    return left != lit


@settings(max_examples=400, deadline=None)
@given(
    vals=st.lists(_dec_vals, min_size=1, max_size=20),
    w=st.sampled_from([1, 7, 50, 2500]),
    op=ops,
    lit=_dec_lits,
)
def test_decimal_truncate_projection_superset(spark, vals, w, op, lit):
    """truncate[W] on decimal(9,2): if the projected predicate rejects
    a partition tuple, NO row of that partition may match the original
    predicate under Spark's comparison semantics — silent row loss
    otherwise.  Exercises the r10 unscaled-long lane end to end
    (py_value tuple encoding + literal projection + tuple matching)."""
    from pyspark.sql import types as T

    from icepack import transforms as tr
    from icepack.expr import Cmp, partition_tuple_matches, project_to_partition
    from icepack.metadata import (
        IceSchema,
        NestedField,
        PartitionField,
        PartitionSpec,
    )

    t = tr.parse(f"truncate[{w}]")
    schema = IceSchema(0, [NestedField(1, "x", "decimal(9,2)", False)])
    spec = PartitionSpec(0, [PartitionField(1, 1000, f"truncate[{w}]", "x_truncate")])
    pred = Cmp("x", op, lit)
    proj = project_to_partition(pred, spec, schema)
    groups: dict = {}
    for v in vals:
        groups.setdefault(t.py_value(v, "decimal(9,2)"), []).append(v)
    for pv, group in groups.items():
        assert isinstance(pv, int)  # the unscaled-long domain
        if not partition_tuple_matches(proj, {"x_truncate": pv}):
            lost = [v for v in group if _spark_matches(op, lit, v)]
            assert not lost, (w, op, lit, pv, lost)
