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
#: Round-12 snapshot (VERDICT r11 task 3): the r11 driver run covered
#: the r6-stale cohort, so the oldest driver evidence is now
#: x41_stratified_fixed_n (r6 -- it sat outside the r10 rotation's
#: named x30-x40 cohort) followed by a 37-query r7 cohort (the
#: a4_tpch battery minus the r8-refreshed five, ice45/51/53/55,
#: x2/x28/x29/x42-x44/x48-x51/x53-x55/x57-x59).  They go FIRST -- after
#: this round no query's newest driver evidence is older than r8 --
#: then the queries whose code paths change THIS round (v3 row
#: lineage: manifest-list field-520 assignment, lineage-carrying COW
#: DML/compaction/manifest rewrite, export reusing table row ids,
#: ENTRY_SCHEMA growing first-row-id; dedup mining width scoped to a
#: cloned session; semantic self-pair/bucket-cap hardening).
PRIORITY: list[str] = [
    "x41_stratified_fixed_n",  # r6 -- missed by the r10 rotation list
    # r7-evidenced cohort
    "a4_tpch_q2",
    "a4_tpch_q3",
    "a4_tpch_q4",
    "a4_tpch_q6",
    "a4_tpch_q7",
    "a4_tpch_q8",
    "a4_tpch_q10",
    "a4_tpch_q11",
    "a4_tpch_q12",
    "a4_tpch_q13",
    "a4_tpch_q14",
    "a4_tpch_q15",
    "a4_tpch_q16",
    "a4_tpch_q17",
    "a4_tpch_q20",
    "a4_tpch_q21",
    "a4_tpch_q22",
    "ice45_mor_batch_read",
    "ice51_table_stats",
    "ice53_stream_dedup_ingest",
    "ice55_versioned_view",
    "x2_jaccard_pairs",
    "x28_sequence_pack",
    "x29_vocab_stats",
    "x42_training_pipeline",
    "x43_pii_scan",
    "x44_pii_redact",
    "x48_semantic_dedup",  # ALSO r12-changed: self-pair filter, bucket cap
    "x49_pq_adc_search",
    "x50_matryoshka_rerank",
    "x51_audio_chunk_energy",
    "x53_mixture_resample",
    "x54_simhash_neardup",
    "x55_semantic_dedup_clusters",
    "x57_temperature_sample",
    "x58_rrf_fusion",
    "x59_adaptive_quality_filter",
    # code changing this round -- re-evidence (new first)
    "ice65_row_lineage",  # NEW in r12: v3 row lineage end-to-end
    "ice63_dv_v3_export",  # v3 commits now assign first_row_id
    "ice49_spec_primary",  # spec-primary commit/summary changes
    "ice50_foreign_adopt",  # read_spec_manifest decodes first_row_id
    "ice43_iceberg_export",  # export prefers table-assigned row ids
    "ice47_iceberg_read",
    "ice60_auto_distributed_scan",  # ENTRY_SCHEMA grew first-row-id
    "ice52_table_dedup",  # mining width now scoped to a cloned session
    "ice5_merge",  # COW merge lineage carry
    "ice9_compact_expire",  # compact materializes lineage columns
    "ice17_zorder_compact",
    "ice24_rewrite_manifests",  # rewrites keep explicit row ids
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
