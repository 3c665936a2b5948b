"""Skew-mitigation helpers (SURVEY.md §4 "join keys need good
distribution", docs/09-query-performance.md:170-181).

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these helpers cover the two shapes AQE can't fix:

- ``salted_agg``: a groupBy on a hot key funnels the hot key's rows
  into one task.  Two-phase salted aggregation spreads the hot key
  over N sub-keys, partially aggregates, then combines — the classic
  map-side-skew escape for 100 TB group-bys with power-law keys.
- ``salted_broadcast_left``: replicating a SMALL right side N× lets a
  skewed left side join against any salt replica; used when the right
  side is broadcastable but the left's hot key would still skew
  downstream aggregation.

Both are pure DataFrame compositions — no partitioner code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    combines: list[Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` aggregate within (keys, salt); ``combines`` must re-combine
    the partials named by the aggs' aliases (sum→sum, count→sum,
    min→min, max→max...).  Example::

        salted_agg(ev, ["user_id"],
                   aggs=[F.count("*").alias("n"), F.sum("value").alias("v")],
                   combines=[F.sum("n").alias("n"), F.sum("v").alias("v")])
    """
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt)))
    partial = salted.groupBy(*keys, "_salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*combines)


def salted_shuffle_join(
    left: DataFrame, right: DataFrame, on: str, salt: int = 8
) -> DataFrame:
    """Skew-safe shuffle join: salt the (skewed) left side into
    ``salt`` sub-keys and replicate every right row across the salt
    domain, so a hot join key spreads over ``salt`` reducers instead of
    one.  Row-equivalent to ``left.join(right, on, "inner")``; salt is
    pure routing, so results are deterministic even though the salt
    assignment isn't.  Use when the right side is too big to broadcast
    and one left key dominates (the case AQE's skew split can't fix
    when the skew appears after other operators)."""
    lsalt = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int"),
    )
    replicas = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return lsalt.join(replicas, [on, "_salt"], "inner").drop("_salt")
