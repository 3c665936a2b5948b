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
#: Round-7 snapshot: cumulative driver coverage 181/181 green, but the
#: four round-6 additions (ice49/ice50/ice51/x47) have NEVER been
#: driver-sampled — they are first (VERDICT r6 item 1), followed by
#: the FIFTEEN round-7 additions (TPC-H completions, the SemDeDup /
#: PQ-ADC / matryoshka / simhash / mixture / audio legs, table +
#: streaming dedup), then the queries whose code paths changed this
#: round (spec-delete canonicalization, shingle rewrite + packing,
#: DSv2 MOR fallback), then the 39 queries whose latest evidence is
#: r03 (oldest cohort), then the r04 cohort heads as budget allows.
PRIORITY: list[str] = [
    # never driver-sampled (landed after the r6 driver run)
    "ice49_spec_primary",
    "ice50_foreign_adopt",
    "ice51_table_stats",
    "x47_substring_dedup",
    # new in r7 (adapted TPC-H completions) -- never sampled
    "a4_tpch_q2",
    "a4_tpch_q11",
    "a4_tpch_q12",
    "a4_tpch_q16",
    "a4_tpch_q20",
    "a4_tpch_q21",
    "x48_semantic_dedup",
    "x49_pq_adc_search",
    "x50_matryoshka_rerank",
    "x51_audio_chunk_energy",
    "ice52_table_dedup",
    "x53_mixture_resample",
    "x54_simhash_neardup",
    "ice53_stream_dedup_ingest",
    "x55_semantic_dedup_clusters",
    "x56_containment_dedup",
    "x57_temperature_sample",
    # r7 continuation session: v3 deletion vectors, rank fusion,
    # adaptive filtering, versioned views, partition statistics, the
    # DSv2 batch writer -- never driver-sampled
    "ice54_deletion_vectors",
    "x58_rrf_fusion",
    "x59_adaptive_quality_filter",
    "ice55_versioned_view",
    "ice56_partition_stats",
    "ice57_batch_writer",
    "ice58_materialized_view",
    # code changing this round -- re-evidence
    "x2_jaccard_pairs",
    "x31_jaccard_stopshingles",
    "ice45_mor_batch_read",
    "ice47_iceberg_read",
    "ice48_spec_read_prune",
    # r03-evidenced cohort (oldest), registration order
    "x20_kmeans_ivf",
    "x28_sequence_pack",
    "x29_vocab_stats",
    "x42_training_pipeline",
    "x43_pii_scan",
    "x44_pii_redact",
    "a4_tpch_q3",
    "a4_tpch_q4",
    "a4_tpch_q6",
    "a4_tpch_q7",
    "a4_tpch_q8",
    "a4_tpch_q13",
    "a4_tpch_q10",
    "a4_tpch_q14",
    "a4_tpch_q17",
    "a4_tpch_q22",
    "a4_tpch_q15",
    "a4_tpch_q9",
    "a4_tpch_q19",
    "a5_scalar_subquery",
    "a6_rollup",
    "a6_cube",
    "a3_approx_distinct",
    "a7_stat_aggs",
    "a8_pivot",
    "w2_lag_gap",
    "w1_rank_family",
    "a5_correlated_subquery",
    "a9_listagg",
    "a10_conditional_agg",
    "a11_salted_agg",
    "j9_null_safe_join",
    "a13_skyline",
    "a17_exact_median",
    "a18_gapfill_lerp",
    "a19_copurchase",
    "a20_share_of_total",
    "ice32_rest_catalog",
    "ice33_orc_ingest",
    # r04 cohort heads
    "x45_domain_cap",
    "x46_line_dedup_ratio",
    "a1_groupby_count",
    "a4_tpch_q1",
    "a0_gold_daily",
    "a4_tpch_q5",
    "a4_tpch_q18",
    "a6_grouping_sets",
    "w1_topk_per_group",
    "w3_running_sum",
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
