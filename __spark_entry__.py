"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``icepack/queries/`` (one module per operator
family, SURVEY.md §2); this file is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icepack.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's gold-layer join-aggregate,
    SURVEY.md M0) on /root/testdata/sf0.001; driver checks rows>0."""
    from icepack.queries.relational import a0_gold_daily

    return a0_gold_daily(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable re-pins the engine's runtime confs unconditionally
    (ensure_confs force=True, ~1 ms): the internal memo makes conf
    normalization one-shot per session, and a harness that mutates a
    runtime conf between queries must not change what a declared query
    computes."""
    import functools

    from icepack.session import ensure_confs

    def _pinned(fn):
        @functools.wraps(fn)
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_confs(spark, force=True)
            return fn(spark, sf_dir)

        return run

    return {name: _pinned(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return all_oracles()
