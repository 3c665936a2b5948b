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
#: Round-13 snapshot (VERDICT r12 task 6): the r12 driver run covered
#: the r7-stale cohort; the union of CORRECTNESS_r01..r12 now bottoms
#: out at a 40-query r8 cohort (a0/a1x analytics, the w/o/f families,
#: a4_tpch_q1/5/9/18/19, ice32/33/40/56/58, x45-x47/x56).  First come
#: the queries whose CODE changed this round (v3 DML deletion vectors:
#: ice66 new, ice63/ice54 share the rewritten DV writer, ice65 grew a
#: DV survival row, ice52's MERGE tombstones become DVs on v3; ice67
#: new SQL row-lineage surface), then the full r8 cohort — after the
#: r13 run no query's newest driver evidence should be older than r9.
PRIORITY: list[str] = [
    # r13-changed / new first (never- or stale-evidenced on new code)
    "ice66_v3_dv_dml",  # NEW: v3 DML deletion vectors end-to-end
    "ice67_sql_row_lineage",  # NEW: lineage metadata columns via IceSQL
    "ice65_row_lineage",  # grew a DV-delete survival row
    "ice63_dv_v3_export",  # DV writer now shared write_dv_puffins
    "ice54_deletion_vectors",  # consolidation refactored onto it
    "ice52_table_dedup",  # dedupe MERGE tombstones -> DVs on v3
    # r8-evidenced cohort (oldest in the CORRECTNESS union)
    "a0_gold_daily",
    "a10_conditional_agg",
    "a11_salted_agg",
    "a13_skyline",
    "a17_exact_median",
    "a18_gapfill_lerp",
    "a19_copurchase",
    "a1_groupby_count",
    "a20_share_of_total",
    "a3_approx_distinct",
    "a4_tpch_q1",
    "a4_tpch_q18",
    "a4_tpch_q19",
    "a4_tpch_q5",
    "a4_tpch_q9",
    "a5_correlated_subquery",
    "a5_scalar_subquery",
    "a6_cube",
    "a6_grouping_sets",
    "a6_rollup",
    "a7_stat_aggs",
    "a8_pivot",
    "a9_listagg",
    "ice32_rest_catalog",
    "ice33_orc_ingest",
    "ice40_stream_source",
    "ice56_partition_stats",
    "ice58_materialized_view",
    "j9_null_safe_join",
    "o1_global_sort",
    "o2_top_n",
    "o3_union_all",
    "w1_rank_family",
    "w1_topk_per_group",
    "w2_lag_gap",
    "w3_running_sum",
    "x45_domain_cap",
    "x46_line_dedup_ratio",
    "x47_substring_dedup",
    "x56_containment_dedup",
    # r9 heads (next-oldest) fill the remaining sample budget
    "a12_funnel",
    "a15_sessionize_gap",
    "f10_date_spine",
    "f1_date_trunc",
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
