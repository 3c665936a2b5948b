"""Partition-value directory codec parity (icepack/transforms.py).

The DSv2 task writer derives partition tuples from VALUES
(``Transform.py_value`` → ``_dir_value`` + ``_decode_like``) while
``IceTable.append`` derives them from Spark's ``partitionBy`` directory
keys (``table._decode_part``).  Both decoders must agree value-for-value
or the same logical partition splits into two manifest tuples and
pruning misses (r8 ADVICE: ``int('\\n12')`` parsed on one path only;
Python ``str(1e-7)`` = ``'1e-07'`` vs Spark's ``'1.0E-7'``).
"""

import pytest

from icepack.table import _decode_part
from icepack.transforms import _decode_like, _dir_value


@pytest.mark.parametrize(
    "s",
    [
        "12", "-3", "+4", " 12", "\t12", "\n12", " \n 12 ",  # int spellings
        "1.5", "-0.25", "1e-07", "1.0E-7", "1E5", ".5", "2.",  # float spellings
        "abc", "", "n7", "a1.5", "--", "+", ".", "1.2.3",  # plain strings
        "nan", "NaN", "inf", "-inf", "Infinity",  # non-finite stay strings
        "1_0",  # python numeric-literal quirk: both paths agree either way
        "2024-01-05", "s0",
    ],
)
def test_decode_like_matches_decode_part(s):
    assert _decode_like(s) == _decode_part(s)


def test_decode_normalizes_float_spellings():
    """Python str() and Spark CAST..AS STRING spell the same double
    differently; both must decode to the SAME manifest tuple value."""
    assert _decode_like("1e-07") == _decode_like("1.0E-7") == 1e-7
    assert _decode_like(str(1e-7)) == 1e-7
    assert isinstance(_decode_like("12"), int)  # ints stay ints, not floats


def test_decode_non_finite_stays_string():
    for s in ("nan", "NaN", "inf", "-Infinity"):
        assert _decode_like(s) == s


def test_float_identity_partition_single_tuple(spark):
    """End-to-end: the two write paths' spellings of one float value
    decode to the same tuple value — Spark's directory spelling
    (CAST(v AS STRING), what ``partitionBy`` writes and _decode_part
    reads) and Python's ``_dir_value`` (what py_value feeds
    _decode_like)."""
    from pyspark.sql import functions as F

    vals = [1e-7, 12.0, -0.5, 123456.789, 3.0e10, 1.5e-12]
    rows = spark.createDataFrame([(v,) for v in vals], "v double").select(
        F.col("v").cast("string").alias("s")
    ).collect()
    for v, r in zip(vals, rows):
        spark_side = _decode_part(r.s)
        py_side = _decode_like(_dir_value(v))
        assert spark_side == py_side == v, (v, r.s, spark_side, py_side)
        assert isinstance(spark_side, float) and isinstance(py_side, float)


def test_decode_int_roundtrip_with_whitespace():
    # int() accepts any leading/trailing whitespace; the fast-path
    # guard must not diverge from it
    for s in ("\n12", "\r7", "\x0b3", " 5 "):
        assert _decode_like(s) == int(s)
