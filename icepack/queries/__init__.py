"""Query registry: named (PySpark builder, DuckDB oracle SQL) pairs.

Every operator claimed in SURVEY.md §2 registers here via the
:func:`query` decorator.  ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin re-exports of these dicts.

Contract (driver): each builder takes ``(spark, sf_dir)`` and returns a
DataFrame; the oracle SQL runs under DuckDB with the fixture tables
pre-registered as views.  Column names are aliased identically on both
sides; float aggregates are rounded on both sides so summation-order
differences between engines can't flip the order-insensitive value
hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check;
    those are additionally covered by pytest invariants (SURVEY.md §5.3).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_modules() -> None:
    """Import every query module so decorators run."""
    from . import llm, relational, tableops, windows  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    load_all_modules()
    return dict(REGISTRY)


def all_oracles() -> dict[str, str]:
    load_all_modules()
    return dict(ORACLES)
