"""Streaming-window operators in batch form (SURVEY.md §2.11).

ST1-ST3 (tumbling / sliding / session windows) run here as batch
``groupBy(window(...))`` over the ``events`` fixture so the DuckDB
oracle can check them; the *same expressions* run under Structured
Streaming in ``icepack/streaming.py`` (readStream + watermark), which
is pytest-verified.  The oracle emulates:

- tumbling  → ``time_bucket``
- sliding   → each event replicated into the ≤2 covering windows
- session   → gaps-and-islands (new session when the gap since the
  previous event per user is ≥ the 30-min gap duration — exactly
  Spark's ``session_window`` close rule)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from . import query


@query(
    "st1_tumbling_window",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def st1_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "st2_sliding_window",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    slid AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts)
               - k.k * INTERVAL '30 minutes' AS window_start,
             event_type
      FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k) k
    )
    SELECT window_start, event_type, COUNT(*) AS n
    FROM slid GROUP BY 1, 2
    """,
)
def st2_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """1-hour window sliding every 30 min: each event lands in exactly
    2 windows (the oracle replicates via k ∈ {0,1})."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
    )


@query(
    "st3_session_window",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    flags AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flags
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def st3_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows, 30-min gap.  Deterministic under ts ties: equal
    timestamps always merge into the same session (gap 0)."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


@query(
    "st5_dedup",
    oracle="""
    SELECT event_type, COUNT(*) AS n_unique
    FROM (
      SELECT DISTINCT event_id, event_type FROM (
        SELECT event_id, event_type FROM events
        UNION ALL
        SELECT event_id, event_type FROM events
      )
    ) GROUP BY event_type
    """,
)
def st5_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Stream dedup in batch form: a doubled stream deduped on the
    event key collapses to the original (streaming twin:
    dropDuplicatesWithinWatermark, pytest-verified in
    tests/test_streaming.py)."""
    ev = load(spark, sf, "events").select("event_id", "event_type")
    doubled = ev.unionByName(ev)
    return (
        doubled.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique"))
    )


@query(
    "st7_stream_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           p.value AS amount
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def st7_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """ST7 batch twin: the SAME watermarked click→purchase attribution
    join ``icepack.streaming.stream_stream_join`` runs under a real
    two-stream query (tests/test_streaming.py::
    test_stream_stream_join_equals_batch) — here over batch frames so
    DuckDB can value-check the join semantics."""
    from ..streaming import stream_stream_join

    ev = load(spark, sf, "events")
    return stream_stream_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
