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
#: Round-11 snapshot (VERDICT r10 item 2): the r10 driver run rotated
#: the r5-stale cohort, so the oldest driver-side evidence now belongs
#: to the 44 queries last sampled in round 6 (the ice3-ice30 lifecycle
#: family, st1/2/3/5/7, a14/a16, x1, x30-x40) -- they go FIRST,
#: followed by ice10/ice54 (queued in r10 but fell off the 50-cap) and
#: the queries whose code paths change THIS round (minimal decimal
#: two's-complement export/hash bytes, spec-primary distributed pstats,
#: plan-mode-aware expire/orphan reachability, dedupe_table shuffle
#: self-sizing, Iceberg v3 deletion-vector export).
PRIORITY: list[str] = [
    # r06-evidenced cohort (oldest driver evidence; local battery green
    # every round since, but the hard signal must rotate)
    "ice3_delete_cow",
    "ice4_update",
    "ice6_schema_evolution",
    "ice8_metadata_tables",
    "ice9_compact_expire",  # ALSO r11-changed: plan-mode-aware expire
    "ice11_incremental_read",
    "ice12_sql_over_table",
    "ice13_medallion",
    "ice14_refs_rollback",
    "ice15_mor_position_delete",
    "ice16_mor_update",
    "ice17_zorder_compact",
    "ice18_sorted_write",
    "ice19_partition_evolution",
    "ice20_wap",
    "ice21_query_history",
    "ice22_cdc_diff",
    "ice23_orphan_cleanup",  # ALSO r11-changed: plan-mode-aware orphans
    "ice24_rewrite_manifests",
    "ice25_sql_surface",
    "ice26_incremental_dedup",
    "ice27_scd2",
    "ice28_json_ingest",
    "ice29_add_files",
    "ice30_csv_ingest",
    "st1_tumbling_window",
    "st2_sliding_window",
    "st3_session_window",
    "st5_dedup",
    "st7_stream_join",
    "a14_cohort_retention",
    "a16_stickiness",
    "x1_exact_dedup",
    "x30_embedding_outliers",
    "x31_jaccard_stopshingles",
    "x32_bigram_entropy",
    "x33_doc_chunking",
    "x34_chunk_dedup",
    "x35_train_split",
    "x36_minhash_estimate",
    "x37_unigram_surprisal",
    "x38_ngram_novelty",
    "x39_kmeans_assign",
    "x40_pq_encode",
    # queued in r10 but fell off the 50-sample cap
    "ice10_mor_delete",
    "ice54_deletion_vectors",
    # code changing this round -- re-evidence (new queries first:
    # never driver-sampled)
    "ice63_dv_v3_export",  # NEW in r11: Iceberg v3 DV export
    "ice64_wide_decimal_truncate",  # NEW in r11: decimal(25,4) truncate
    "f6_bucket_mod",  # decimal bucket-hash minimal-bytes change
    "ice52_table_dedup",  # dedupe_table shuffle self-sizing
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
