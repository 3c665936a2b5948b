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
#: Round-5 snapshot: every §2 row has driver-green evidence
#: (cumulative 175/175 entering r05), but 47 queries' LATEST evidence
#: is r01 — nearly the whole X family plus the early join/predicate
#: battery — four rounds of code movement behind their last driver
#: hash.  Front-load all 47 (VERDICT r4 next-round #2: "no query's
#: latest evidence older than two rounds"), then the DML-family
#: queries whose hit-scan path changed this round, then the oldest
#: r02-evidenced rows as budget allows.
PRIORITY: list[str] = [
    # new in r05 — first-time evidence
    "ice43_iceberg_export",
    "ice44_result_cache",
    "ice45_mor_batch_read",
    "ice46_s3_store",
    "ice47_iceberg_read",
    "ice48_spec_read_prune",
    # latest driver evidence = r01 (47) — refresh first
    "p1_pruned_scan",
    "p3_time_range",
    "p4_like",
    "p5_json_extract",
    "p5_from_json_struct",
    "p6_null_handling",
    "j1_inner_join",
    "j2_left_join",
    "j2_right_join",
    "j2_full_outer",
    "j3_broadcast_star",
    "j4_semi_join",
    "j4_anti_join",
    "j5_range_join",
    "j5_interval_bin_join",
    "j7_asof_join",
    "o1_global_sort",
    "a3_approx_percentile",
    "x1_exact_dedup",
    "x2_jaccard_pairs",
    "x3_minhash_lsh",
    "x4_simhash",
    "x5_cosine_topk",
    "x6_ann_bucketed",
    "x7_text_quality",
    "x8_fingerprint",
    "x9_binary_meta",
    "x10_doc_embedding_join",
    "x11_token_regex",
    "x12_lang_id",
    "x13_embedding_neardup",
    "x14_variant_json",
    "x15_multimodal_features",
    "x16_dedup_clusters",
    "x17_tfidf_terms",
    "x18_hash_sample",
    "x19_weighted_mix",
    "x21_repetition_ratio",
    "x22_contamination",
    "x23_dedup_keep_best",
    "x24_char_entropy",
    "x25_edit_distance",
    "x26_quality_filter",
    "x27_lsh_ann",
    "x30_embedding_outliers",
    "x31_jaccard_stopshingles",
    "x32_bigram_entropy",
    # DML hit-scan path changed in r05 — re-evidence the family
    "ice3_delete_cow",
    "ice4_update",
    "ice16_mor_update",
    # oldest (r02) evidence next, as budget allows
    "ice11_incremental_read",
    "ice14_refs_rollback",
    "ice15_mor_position_delete",
    "ice17_zorder_compact",
    "ice19_partition_evolution",
    "ice20_wap",
    "ice27_scd2",
    "st1_tumbling_window",
    "st2_sliding_window",
    "st3_session_window",
    "x33_doc_chunking",
    "x36_minhash_estimate",
    "x39_kmeans_assign",
    "x40_pq_encode",
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
