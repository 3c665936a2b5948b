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
#: Round-10 snapshot (VERDICT r9 item 4): the r9 driver run refreshed
#: the r4-stale cohort plus the r9-changed code paths, so the oldest
#: driver-side evidence now belongs to the 39 queries last sampled in
#: round 5 — they go FIRST (the 50-entry budget covers all of them),
#: followed by the queries whose code paths change THIS round
#: (production dedupe_table star-link/collapse + data-aware planes,
#: distributed tuple-prune spelling-collision guard + exact In
#: membership, picklable-store executor-side planning, O(hit
#: manifests) replace commits, MOR-aware total-data-files, timestamp
#: bucket fast-lane gating).
PRIORITY: list[str] = [
    # r05-evidenced cohort (oldest driver evidence; local battery green
    # every round since, but the hard signal must rotate)
    "j1_inner_join",
    "j2_right_join",
    "j2_left_join",
    "j2_full_outer",
    "j3_broadcast_star",
    "j4_semi_join",
    "j4_anti_join",
    "j5_range_join",
    "j5_interval_bin_join",
    "j7_asof_join",
    "p4_like",
    "p5_json_extract",
    "p5_from_json_struct",
    "p6_null_handling",
    "a3_approx_percentile",
    "ice44_result_cache",
    "ice46_s3_store",  # ALSO r10-changed: executor-side S3 planning
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
    "x20_kmeans_ivf",
    "x21_repetition_ratio",
    "x22_contamination",
    "x23_dedup_keep_best",
    "x24_char_entropy",
    "x25_edit_distance",
    "x26_quality_filter",
    "x27_lsh_ann",
    # code changing this round -- re-evidence
    "ice62_decimal_truncate",  # NEW in r10: decimal truncate partitioning
    "ice61_dedup_keep_best",  # NEW in r10, never driver-sampled
    "ice52_table_dedup",  # dedupe_table star-link mining + window exact
    "ice39_distributed_plan",  # spelling-collision guard, In membership
    "ice60_auto_distributed_scan",
    "ice37_memory_store",  # non-picklable store driver fallback
    "f6_bucket_mod",  # timestamp fast-lane gating
    "ice5_merge",  # O(hit manifests) replace commit
    "ice10_mor_delete",  # MOR-aware total-data-files
    "ice54_deletion_vectors",
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
