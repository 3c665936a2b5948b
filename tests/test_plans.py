"""Physical-plan assertions: the optimizations SURVEY.md §4 claims are
actually in the plans (pushdown, pruning, broadcast, top-k)."""

from icepack.queries import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = all_queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_and_projection_pushdown(spark):
    plan = _plan(spark, "p1_pruned_scan")
    assert "PushedFilters: [" in plan and "IsNotNull" in plan or "GreaterThan" in plan
    # column pruning: scan schema is exactly the referenced columns
    assert "l_comment" not in plan
    assert "l_quantity" in plan


def test_star_join_broadcasts(spark):
    plan = _plan(spark, "j3_broadcast_star")
    # formatted mode lists each node twice (tree + details) → 3 joins ≥ 3 hits
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_semi_anti_join_strategies(spark):
    assert "LeftSemi" in _plan(spark, "j4_semi_join")
    assert "LeftAnti" in _plan(spark, "j4_anti_join")


def test_range_join_is_broadcast_nlj(spark):
    plan = _plan(spark, "j5_range_join")
    assert "BroadcastNestedLoopJoin" in plan


def test_top_n_no_global_sort(spark):
    plan = _plan(spark, "o2_top_n")
    assert "TakeOrderedAndProject" in plan


def test_window_topk_group_limit(spark):
    """rank<=k filter should push a WindowGroupLimit below the sort."""
    plan = _plan(spark, "w1_topk_per_group")
    assert "WindowGroupLimit" in plan


def test_aggregate_is_partial_final(spark):
    plan = _plan(spark, "a4_tpch_q1")
    assert plan.count("HashAggregate") >= 2  # map-side partial + final


def test_whole_stage_codegen_everywhere(spark):
    """Codegen spans only appear in the FINAL adaptive plan — execute,
    then inspect; also confirms the vectorized (batched) reader."""
    df = all_queries()["a4_tpch_q1"](spark, SF)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    # codegen stages print as "*(N) Operator" in the executed plan
    assert "*(1)" in final and "*(2)" in final
    assert "Batched: true" in _plan(spark, "a4_tpch_q1")


def test_interval_bin_join_is_hash_join(spark):
    """The binned interval join must be an equi hash/merge join on the
    bin key — never a nested loop (the whole point of binning)."""
    plan = _plan(spark, "j5_interval_bin_join")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_tpch_q5_broadcasts_fixed_dims(spark):
    """nation/region (fixed cardinality at any SF) broadcast; the
    fact-fact join may shuffle."""
    plan = _plan(spark, "a4_tpch_q5")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q18_scans_lineitem_once(spark):
    """Q18 is written so the HAVING pre-aggregate IS the output
    aggregate — the dominant fact table must appear in exactly one
    scan node, not the literal SQL's two."""
    plan = _plan(spark, "a4_tpch_q18")
    # each distinct scan node prints its Location once in the details
    assert plan.count("lineitem.parquet") == 1


def test_global_sort_is_range_partitioned(spark):
    plan = _plan(spark, "o1_global_sort")
    assert "rangepartitioning" in plan.lower()
    assert "Exchange SinglePartition" not in plan


def test_null_safe_join_is_hash_join(spark):
    """EqualNullSafe must stay a hash join (it is a legal equi-join
    key) — never the nested-loop a coalesce-free rewrite would force."""
    plan = _plan(spark, "j9_null_safe_join")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_nulls_first_top_n_no_global_sort(spark):
    plan = _plan(spark, "o7_nulls_ordering")
    assert "TakeOrderedAndProject" in plan
    assert "NULLS FIRST" in plan


def test_sequence_pack_single_window_pass(spark):
    """The packing bin must come from ONE running-sum window (one
    shuffle by shard), not a per-bin self-join or a second exchange."""
    plan = _plan(spark, "x28_sequence_pack")
    assert plan.count("Window") >= 1
    # exactly two exchanges: shard window + final groupBy
    assert plan.count("Exchange") <= 2


def test_funnel_single_data_shuffle(spark):
    """The ordered funnel walks stages inside the per-user array: no
    self-joins (the naive spelling shuffles the fact table 3×) — just
    the user groupBy plus the tiny cohort aggregate."""
    plan = _plan(spark, "a12_funnel")
    assert "Join" not in plan
    # "Exchange (N)" matches tree nodes once (details print "(N) Exchange")
    assert plan.count("Exchange (") <= 2


def test_contamination_broadcasts_eval_suite(spark):
    """x22's train corpus must never shuffle: the eval shingle set
    broadcasts, and the only hash-partitioned exchanges belong to the
    shingle pipeline's doc repartition and the final pair rollup —
    no Exchange keyed on the shingle hash."""
    plan = _plan(spark, "x22_contamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(sh" not in plan


def test_stratified_fixed_n_uses_group_limit(spark):
    """x41's rank-≤-20 cut must push below the sort (per-task 20-row
    heap, not a full stratum sort)."""
    plan = _plan(spark, "x41_stratified_fixed_n")
    assert "WindowGroupLimit" in plan


def test_q5_supplier_side_broadcasts(spark):
    """The composite supplier⋈nation⋈region side is dim-sized at any
    SF: it must broadcast rather than fall to a sort-merge join that
    shuffles the enriched fact."""
    plan = _plan(spark, "a4_tpch_q5")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_pq_encode_is_map_only(spark):
    """x40: beyond the two 1-row codebook broadcasts, encoding adds no
    exchange — each vector compresses where it is scanned."""
    plan = _plan(spark, "x40_pq_encode")
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


def test_training_pipeline_corpus_shuffles_once(spark):
    """x42: exactly three exchanges — the dedup shuffle on the content
    hash (the only one carrying corpus text) plus the census's
    two-phase COUNT DISTINCT pair, which move only ids and counts.
    The keep-first row_number must push down as WindowGroupLimit (a
    per-task 1-row heap per content hash, not a full sort)."""
    plan = _plan(spark, "x42_training_pipeline")
    tree = plan.split("(1) ")[0]
    assert tree.count("Exchange") == 3
    assert "WindowGroupLimit" in plan
    assert "md5" in plan


def test_mor_pipeline_applies_deletes_below_composition(spark):
    """ice31: the equality-delete anti-join must sit at scan level as a
    BROADCAST anti-join (delete files are tiny vs the corpus — a
    shuffle there would re-key the whole table before the pipeline even
    starts), and composing the full x42 pipeline on top must not add
    joins: one anti-join, dedup window's single wide shuffle, zero
    sort-merge joins."""
    plan = _plan(spark, "ice31_mor_pipeline")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_pii_redact_is_single_scan_pass(spark):
    """x44: chained regexp_replace must stay one scan + one aggregation
    — no joins, exactly one exchange (the source groupBy), and no
    Python in the plan (regexp_replace is JVM-side)."""
    plan = _plan(spark, "x44_pii_redact")
    assert "Join" not in plan
    assert plan.count("Exchange (") <= 1
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_domain_cap_group_limit_single_shuffle(spark):
    """x45: top-k per source plans a WindowGroupLimit over exactly one
    shuffle — the per-domain cap must carry O(domains x k) through the
    exchange, never the corpus."""
    plan = _plan(spark, "x45_domain_cap")
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") <= 2  # tree + details listing of ONE node
    assert "BatchEvalPython" not in plan


def test_line_dedup_ratio_is_scan_pass(spark):
    """x46: per-doc boilerplate ratio is a zero-shuffle, JVM-side scan."""
    plan = _plan(spark, "x46_line_dedup_ratio")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
