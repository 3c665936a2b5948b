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
#: Round-14 snapshot: the r13 run re-evidenced the r8 cohort, so the
#: CORRECTNESS_r01..r13 union now bottoms out at an r9 cohort (the
#: f/o/p/w scalar families, ice1/2/7/31/34-42/48/57/59, x60).  First
#: come the queries whose CODE changed this optimization round (the
#: DV/tombstone driver-vs-executor lane split, the scan spelling
#: predictor, the DSv2 commit harvest pool, x48's HALF_UP ranking
#: key), then that oldest cohort — after the r14 run no query's
#: newest driver evidence should be older than r10.
PRIORITY: list[str] = [
    # r14-changed first (optimization round: DV/tombstone driver lanes,
    # scan spelling predictor, DSv2 commit harvest pool, x48 HALF_UP
    # ranking key) — every one needs fresh hash evidence on new code
    "ice54_deletion_vectors",
    "ice10_mor_delete",
    "ice15_mor_position_delete",
    "ice16_mor_update",
    "ice45_mor_batch_read",
    "ice66_v3_dv_dml",
    "ice63_dv_v3_export",
    "ice65_row_lineage",
    "ice67_sql_row_lineage",
    "ice52_table_dedup",
    "ice49_spec_primary",
    "ice50_foreign_adopt",
    "ice5_merge",
    "ice31_mor_pipeline",
    "ice57_batch_writer",
    "ice40_stream_source",
    "ice53_stream_dedup_ingest",
    "x48_semantic_dedup",
    "x55_semantic_dedup_clusters",
    "x56_containment_dedup",
    # oldest-evidence cohort (newest driver check r9, from the
    # CORRECTNESS_r01..r13 union) fills the remaining sample budget
    "f11_calendar",
    "f2_date_parts",
    "f3_date_arith",
    "f4_casts",
    "f5_strings",
    "f8_explode_words",
    "f9_math",
    "ice1_create_append_read",
    "ice2_time_travel",
    "ice34_scheduled_compaction",
    "ice35_multi_stmt_txn",
    "ice36_glue_catalog",
    "ice38_sql_pruned_select",
    "ice41_time_travel_prune",
    "ice42_fsck",
    "ice48_spec_read_prune",
    "ice59_partitioned_adopt",
    "ice7_hidden_partition_prune",
    "j8_salted_join",
    "o4_except",
    "o4_intersect",
    "o6_unpivot",
    "o7_nulls_ordering",
    "o8_histogram",
    "p1_pruned_scan",
    "p3_time_range",
    "w3_range_frame",
    "w4_ntile",
    "w5_value_windows",
    "x60_bm25_topk",
    "a3_approx_percentile",
    "ice37_memory_store",
    "ice39_distributed_plan",
    "ice44_result_cache",
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
