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


#: Names the driver should evaluate first.  The correctness harness
#: walks ``queries()`` in iteration order with a bounded budget (~50
#: entries per round), so this STATIC list front-loads what most needs
#: fresh hash evidence; everything else follows in registration order.
#: The ordering is deliberately a source-code constant — updated by hand
#: each round from the published CORRECTNESS_r*.json — so library
#: iteration order never depends on untracked files in the environment
#: (same input -> same order, everywhere).
#:
#: Round-9 snapshot (VERDICT r8 item 3): the r8 driver run refreshed
#: the r3-stale cohort plus the r8-changed code paths, so the oldest
#: driver-side evidence now belongs to the 35 queries last sampled in
#: round 4 — they go FIRST (the 50-entry budget covers all of them),
#: followed by the queries whose code paths change THIS round
#: (distributed-planner bucket-tuple pruning + In range-collapse,
#: executor-side spec-primary Avro decode, one-pass MERGE key
#: profiling, float/whitespace partition-value decode alignment,
#: v2-file-scoped-pos-delete import routing).
PRIORITY: list[str] = [
    # r04-evidenced cohort (oldest driver evidence; local battery green
    # every round since, but the hard signal must rotate)
    "f1_date_trunc",
    "f2_date_parts",
    "f3_date_arith",
    "f4_casts",
    "f5_strings",
    "f6_bucket_mod",
    "f8_explode_words",
    "f9_math",
    "f10_date_spine",
    "f11_calendar",
    "o4_intersect",
    "o4_except",
    "o6_unpivot",
    "o7_nulls_ordering",
    "o8_histogram",
    "w3_range_frame",
    "w4_ntile",
    "w5_value_windows",
    "a12_funnel",
    "a15_sessionize_gap",
    "j8_salted_join",
    "ice1_create_append_read",
    "ice2_time_travel",
    "ice10_mor_delete",
    "ice13_medallion",
    "ice22_cdc_diff",
    "ice31_mor_pipeline",
    "ice34_scheduled_compaction",
    "ice35_multi_stmt_txn",
    "ice36_glue_catalog",
    "ice37_memory_store",
    "ice38_sql_pruned_select",
    "ice39_distributed_plan",
    "ice41_time_travel_prune",
    "ice42_fsck",
    # code changing this round -- re-evidence
    "x60_bm25_topk",  # new in r9, never driver-sampled
    "ice60_auto_distributed_scan",  # now bucket(8)-partitioned + tuple prune
    "ice49_spec_primary",  # executor-side Avro manifest decode
    "ice47_iceberg_read",
    "ice48_spec_read_prune",
    "ice43_iceberg_export",
    "ice50_foreign_adopt",  # _is_dv_rec v2 file-scoped routing
    "ice5_merge",  # one-pass approx key profile
    "ice27_scd2",
    "ice57_batch_writer",  # float/whitespace decode alignment
    "ice59_partitioned_adopt",
    "ice7_hidden_partition_prune",
    "p1_pruned_scan",
    "p3_time_range",
    "ice54_deletion_vectors",
    "ice40_stream_source",
]


def _ordered(d: dict[str, object]) -> dict[str, object]:
    prio = [n for n in PRIORITY if n in d]
    rest = [n for n in d if n not in set(prio)]
    return {n: d[n] for n in prio + rest}


def all_queries() -> dict[str, QueryFn]:
    load_all_modules()
    return _ordered(dict(REGISTRY))


def all_oracles() -> dict[str, str]:
    load_all_modules()
    return _ordered(dict(ORACLES))
