"""Pin the pure-Python XXH64 (icepack/xxh64.py) against F.xxhash64.

The task-level DSv2 writer computes bucket(N) partition tuples in
plain Python workers where no JVM hash is reachable; if the Python
reimplementation drifted from Spark's XxHash64 by even one bit, a
bucket-partitioned table written through the native writer would put
rows in the WRONG bucket and equality pruning would silently return
nothing (the same failure class transforms.py:152 documents for
int-vs-long hashing).  Property tests over every bucketable source
type, driven by one round-trip through a real Spark column.
"""

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from icepack.xxh64 import spark_xxhash64, xxh64


def _spark_hashes(spark, values, spark_type):
    df = spark.createDataFrame(
        [(v,) for v in values], T.StructType([T.StructField("c", spark_type)])
    )
    return [r["h"] for r in df.select(F.xxhash64("c").alias("h")).collect()]


CASES = [
    (T.IntegerType(), "int", [0, 1, 7, -1, -2147483648, 2147483647, 42]),
    (T.LongType(), "bigint", [0, 1, 7, -1, -(2**63), 2**63 - 1, 123456789012345]),
    (T.ShortType(), "smallint", [0, 7, -1, -32768, 32767]),
    (T.StringType(), "string", ["", "a", "abc", "héllo wörld", "x" * 100, "日本語"]),
    (T.BinaryType(), "binary", [b"", b"\x00", b"abc", bytes(range(256))]),
    (T.BooleanType(), "boolean", [True, False]),
    (T.DateType(), "date", [dt.date(1970, 1, 1), dt.date(2024, 2, 29), dt.date(1969, 12, 31)]),
    (
        T.TimestampType(),
        "timestamp",
        [
            dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc),
            dt.datetime(2024, 6, 15, 12, 34, 56, 789012, tzinfo=dt.timezone.utc),
        ],
    ),
    (T.FloatType(), "float", [0.0, -0.0, 1.5, -3.25, 1e30]),
    (T.DoubleType(), "double", [0.0, -0.0, 1.5, -3.25, 1e300]),
]


@pytest.mark.parametrize("spark_type,simple,values", CASES, ids=[c[1] for c in CASES])
def test_typed_parity(spark, spark_type, simple, values):
    got = [spark_xxhash64(v, simple) for v in values]
    want = _spark_hashes(spark, values, spark_type)
    assert got == want


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=20))
def test_long_parity_property(spark, vals):
    assert [spark_xxhash64(v, "bigint") for v in vals] == _spark_hashes(
        spark, vals, T.LongType()
    )


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(min_size=0, max_size=64).filter(lambda s: "\x00" not in s),
        min_size=1,
        max_size=10,
    )
)
def test_string_parity_property(spark, vals):
    assert [spark_xxhash64(v, "string") for v in vals] == _spark_hashes(
        spark, vals, T.StringType()
    )


def test_all_length_classes():
    # exercise every tail path of the block structure: <4, 4-7, 8-31,
    # exactly 32, >32 with every remainder mod 8
    for n in [0, 1, 3, 4, 5, 7, 8, 9, 15, 16, 31, 32, 33, 40, 63, 64, 100]:
        xxh64(bytes(range(256))[:n] * (n // 256 + 1))  # must not raise


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_binary_parity_property(spark, data):
    assert spark_xxhash64(data, "binary") == _spark_hashes(
        spark, [data], T.BinaryType()
    )[0]


def test_numpy_hash_parity_property():
    import numpy as np

    from icepack.xxh64 import hash_int, hash_int_np, hash_long, hash_long_np

    rng = np.random.default_rng(7)
    longs = rng.integers(-(2**63), 2**63 - 1, size=500, dtype=np.int64)
    assert hash_long_np(longs).tolist() == [hash_long(int(v)) for v in longs]
    ints = rng.integers(-(2**31), 2**31 - 1, size=500, dtype=np.int32)
    assert hash_int_np(ints).tolist() == [hash_int(int(v)) for v in ints]


def test_batch_values_matches_py_value():
    """transforms.Transform.batch_values (the writer's vectorized lane)
    must match py_value element-for-element across every fast-path
    shape — including nulls, tz-aware timestamps, dates, negative ints,
    and the per-row fallback shapes."""
    import datetime as dtm

    import pyarrow as pa

    from icepack.transforms import parse

    utc = dtm.timezone.utc
    ts = [
        dtm.datetime(2024, 3, 1, 8, 30, tzinfo=utc),
        None,
        dtm.datetime(1969, 12, 31, 23, 59, 59, tzinfo=utc),
        dtm.datetime(2031, 12, 5, 0, 0, 0, 123456, tzinfo=utc),
    ]
    cases = [
        ("day", pa.array(ts, pa.timestamp("us", tz="UTC")), "timestamp"),
        ("month", pa.array(ts, pa.timestamp("us", tz="UTC")), "timestamp"),
        ("hour", pa.array(ts, pa.timestamp("us", tz="UTC")), "timestamp"),
        ("year", pa.array(ts, pa.timestamp("us", tz="UTC")), "timestamp"),
        ("day", pa.array([dtm.date(2024, 2, 29), None, dtm.date(1969, 6, 1)]), "date"),
        ("bucket[7]", pa.array([1, None, -5, 2**62, -(2**62)], pa.int64()), "bigint"),
        ("bucket[7]", pa.array([1, None, -5, 2**30], pa.int32()), "int"),
        ("bucket[4]", pa.array(ts, pa.timestamp("us", tz="UTC")), "timestamp"),
        ("bucket[4]", pa.array([dtm.date(2024, 2, 29), None], pa.date32()), "date"),
        ("bucket[8]", pa.array(["a", None, "héllo", ""], pa.string()), "string"),
        ("truncate[10]", pa.array([0, None, -15, 27, 2**40], pa.int64()), "bigint"),
        ("truncate[2]", pa.array(["abcd", None, "42x", "x"], pa.string()), "string"),
        ("identity", pa.array([1, None, -5], pa.int64()), "bigint"),
        ("identity", pa.array(["a", None, "12"], pa.string()), "string"),
        ("mmh3bucket[5]", pa.array([1, None, 9], pa.int64()), "bigint"),
    ]
    for tr_name, col, st in cases:
        tr = parse(tr_name)
        got = tr.batch_values(col, st)
        want = [tr.py_value(v, st) for v in col.to_pylist()]
        assert got == want, f"{tr_name}/{st}: {got} != {want}"


def test_transform_apply_bucket_fast_lane_matches_spark_job(spark):
    """r9: Transform.apply's bucket branch hashes type-matched literals
    through the pure-Python xxh64 lane (no Spark job).  Must equal the
    CAST-faithful Spark-job twin bit-for-bit for every supported type
    family, and mismatched literal/column types must still resolve
    through the Spark path (cache cleared so both lanes actually run)."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from icepack import transforms as tr

    cases = [
        (7, T.IntegerType()),
        (7, T.LongType()),
        (-3, T.ShortType()),
        ("abc", T.StringType()),
        (1.5, T.DoubleType()),
        (1.5, T.FloatType()),
        (-0.0, T.DoubleType()),
        (5, T.DoubleType()),  # int literal over double column
        (True, T.BooleanType()),
        (dt.date(2024, 3, 1), T.DateType()),
        (dt.datetime(2024, 3, 1, 12, 30, 0, 123456), T.TimestampNTZType()),
        (b"\x01\x02", T.BinaryType()),
    ]
    t = tr.parse("bucket[16]")
    for value, dtype in cases:
        got = t.apply(value, spark, dtype)
        c = F.lit(value).cast(dtype)
        want = (
            spark.range(1)
            .select(F.pmod(F.xxhash64(c), F.lit(16)).alias("b"))
            .first()["b"]
        )
        assert got == want, (value, dtype, got, want)
    # timestamp (TZ) lanes under a NON-UTC session timezone (r9
    # ADVICE): a tz-aware literal takes the fast lane (conversion is
    # timezone-independent); a NAIVE one must route through the Spark
    # twin, whose cast applies the session timezone — the pure-Python
    # UTC arithmetic would land it in the wrong bucket.
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        tr._bucket_cache.clear()
        for value in [
            dt.datetime(2024, 3, 1, 12, 30, 0, 123456, tzinfo=dt.timezone.utc),
            dt.datetime(2024, 3, 1, 12, 30, 0, 123456),  # naive → Spark twin
        ]:
            assert tr._literal_matches_type(value, "timestamp") == (
                value.tzinfo is not None
            )
            got = t.apply(value, spark, T.TimestampType())
            want = (
                spark.range(1)
                .select(
                    F.pmod(
                        F.xxhash64(F.lit(value).cast(T.TimestampType())),
                        F.lit(16),
                    ).alias("b")
                )
                .first()["b"]
            )
            assert got == want, (value, got, want)
        # and the NTZ mirror: tz-aware refuses the fast lane
        assert not tr._literal_matches_type(
            dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc), "timestamp_ntz"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        tr._bucket_cache.clear()
    # mismatched type: string literal over a timestamp column — the
    # fast-lane gate refuses, the Spark twin casts and hashes
    tr._bucket_cache.clear()
    got = t.apply("2024-03-01 12:30:00", spark, T.TimestampNTZType())
    want = (
        spark.range(1)
        .select(
            F.pmod(
                F.xxhash64(F.lit("2024-03-01 12:30:00").cast("timestamp_ntz")),
                F.lit(16),
            ).alias("b")
        )
        .first()["b"]
    )
    assert got == want


def test_bucket_decimal_py_value_matches_spark(spark):
    """r10: a compact decimal (p ≤ 18) hashes as its UNSCALED LONG in
    Spark's xxhash64 — the task-level write lane (py_value/
    batch_values) must agree bit-for-bit so DSv2 appends into a
    bucket(N)-on-decimal table land rows in the same buckets the JVM
    path and the pruner's projection use.  Wide decimals stay a loud
    refusal (callers fall back to the Spark-job twin)."""
    import decimal as dec

    import pyarrow as pa
    import pytest as _pytest
    from pyspark.sql import functions as F

    from icepack.transforms import parse

    vals = [dec.Decimal("10.25"), dec.Decimal("-0.05"), dec.Decimal("0.00"), None]
    t = parse("bucket[8]")
    got = t.batch_values(pa.array(vals, pa.decimal128(9, 2)), "decimal(9,2)")
    df = spark.createDataFrame(
        [(v,) for v in vals], "p decimal(9,2)"
    ).select(F.pmod(F.xxhash64("p"), F.lit(8)).alias("b"))
    want = [r.b for r in df.collect()]
    assert got == want
    assert got == [t.py_value(v, "decimal(9,2)") if v is not None else got[-1] for v in vals[:3]] + [got[-1]]
    with _pytest.raises(TypeError):
        t.py_value(dec.Decimal("10.25"), "decimal(22,2)")
