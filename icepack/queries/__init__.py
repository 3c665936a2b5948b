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
#: Round-8 snapshot: the r7 driver run spent its 50-entry budget on the
#: never-sampled r6/r7 additions and TPC-H completions (all green), so
#: the oldest driver evidence now belongs to 23 queries last sampled in
#: round 3 (VERDICT r7 item 1) — they go FIRST, followed by queries
#: whose code paths change this round (DV kept-entry rebuild fix,
#: partitioned DSv2 writer/add_files, distributed-plan default,
#: composite-key MERGE pruning, MV refresh generation-GC), then the
#: r04-evidenced cohort, then r05 heads as budget allows.
PRIORITY: list[str] = [
    # r03-evidenced cohort (oldest driver evidence; judge re-verified
    # locally in r5-r7 but the hard signal must rotate)
    "a10_conditional_agg",
    "a11_salted_agg",
    "a13_skyline",
    "a17_exact_median",
    "a18_gapfill_lerp",
    "a19_copurchase",
    "a20_share_of_total",
    "a3_approx_distinct",
    "a4_tpch_q9",
    "a4_tpch_q19",
    "a5_scalar_subquery",
    "a5_correlated_subquery",
    "a6_rollup",
    "a6_cube",
    "a6_grouping_sets",
    "a7_stat_aggs",
    "a8_pivot",
    "a9_listagg",
    "ice32_rest_catalog",
    "ice33_orc_ingest",
    "j9_null_safe_join",
    "w1_rank_family",
    "w2_lag_gap",
    # new in r8 -- never driver-sampled
    "ice59_partitioned_adopt",
    "ice60_auto_distributed_scan",
    # code changing this round -- re-evidence
    "x47_substring_dedup",
    "x56_containment_dedup",
    "ice54_deletion_vectors",
    "ice57_batch_writer",
    "ice50_foreign_adopt",
    "ice47_iceberg_read",
    "ice56_partition_stats",
    "ice5_merge",
    "ice27_scd2",
    "ice58_materialized_view",
    "ice7_hidden_partition_prune",
    "p1_pruned_scan",
    "ice40_stream_source",
    # r04-evidenced cohort
    "x45_domain_cap",
    "x46_line_dedup_ratio",
    "a1_groupby_count",
    "a4_tpch_q1",
    "a0_gold_daily",
    "a4_tpch_q5",
    "a4_tpch_q18",
    "w1_topk_per_group",
    "w3_running_sum",
    "o1_global_sort",
    "o2_top_n",
    "o3_union_all",
    "o4_intersect",
    "f1_date_trunc",
    "f2_date_parts",
    "f3_date_arith",
    "f4_casts",
    "f5_strings",
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
