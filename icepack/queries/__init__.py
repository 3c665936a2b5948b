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
#: Round-3 snapshot: first the 4 queries sampled-but-not-green in
#: r01/r02 (x28/x29/a15 carried a now-fixed oracle type bug; x20 was
#: r01 ``no_oracle`` and has since gained an exact oracle), then the 62
#: queries no driver round has sampled yet, then a regression re-sample
#: of evidenced representatives of each operator family so prior greens
#: can't silently rot.
PRIORITY: list[str] = [
    # sampled in r01/r02 but not green — fixed, need fresh evidence
    "x28_sequence_pack",
    "x29_vocab_stats",
    "a15_sessionize_gap",
    "x20_kmeans_ivf",
    # new in r03
    "ice31_mor_pipeline",
    "ice32_rest_catalog",
    "ice33_orc_ingest",
    "x44_pii_redact",
    # never driver-sampled (62) — accumulate coverage
    "x42_training_pipeline",
    "x43_pii_scan",
    "a1_groupby_count",
    "a4_tpch_q1",
    "a4_tpch_q3",
    "a4_tpch_q4",
    "a4_tpch_q5",
    "a4_tpch_q6",
    "a4_tpch_q7",
    "a4_tpch_q8",
    "a4_tpch_q9",
    "a4_tpch_q10",
    "a4_tpch_q13",
    "a4_tpch_q14",
    "a4_tpch_q15",
    "a4_tpch_q17",
    "a4_tpch_q18",
    "a4_tpch_q19",
    "a4_tpch_q22",
    "a3_approx_distinct",
    "a5_scalar_subquery",
    "a5_correlated_subquery",
    "a6_rollup",
    "a6_cube",
    "a6_grouping_sets",
    "a7_stat_aggs",
    "a8_pivot",
    "a9_listagg",
    "a10_conditional_agg",
    "a11_salted_agg",
    "a12_funnel",
    "a13_skyline",
    "a17_exact_median",
    "a18_gapfill_lerp",
    "a19_copurchase",
    "a20_share_of_total",
    "j8_salted_join",
    "j9_null_safe_join",
    "w1_topk_per_group",
    "w1_rank_family",
    "w2_lag_gap",
    "w3_running_sum",
    "w3_range_frame",
    "w4_ntile",
    "w5_value_windows",
    "o2_top_n",
    "o3_union_all",
    "o4_intersect",
    "o4_except",
    "o6_unpivot",
    "o7_nulls_ordering",
    "o8_histogram",
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
    # evidenced regression re-sample — one per operator family
    "a0_gold_daily",
    "ice1_create_append_read",
    "ice2_time_travel",
    "ice5_merge",
    "ice7_hidden_partition_prune",
    "ice13_medallion",
    "ice22_cdc_diff",
    "st1_tumbling_window",
    "st5_dedup",
    "x1_exact_dedup",
    "x3_minhash_lsh",
    "x5_cosine_topk",
    "x22_contamination",
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
