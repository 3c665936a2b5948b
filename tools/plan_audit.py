"""Physical-plan audit across the whole query battery.

Flags plan smells that would hurt at 100 TB:
- CartesianProduct / BroadcastNestedLoopJoin where not intended
  (j5/j7-style non-equi joins are the only legitimate users);
- BatchEvalPython (row-at-a-time Python UDF in the data path —
  only Arrow-batched MapInPandas/ArrowEvalPython are acceptable);
- parquet scans with no pushed filters while the query filters
  fixture columns (pushdown broken);
- single-partition Exchange (SinglePartition) outside top-k/limit.

Usage: python tools/plan_audit.py [name_filter ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from icepack.queries import all_queries  # noqa: E402
from icepack.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

#: queries where a nested-loop/broadcast-NLJ is the intended strategy
NLJ_OK = {
    "j5_range_join",
    "x5_cosine_topk",
    "x6_ann_bucketed",
    "x27_lsh_ann",
    # 1-row broadcast cross join attaching the corpus-total scalar
    "x37_unigram_surprisal",
    # 1-row broadcast cross joins attaching the frozen PQ codebooks
    "x40_pq_encode",
    # 1-row broadcast cross joins attaching the codebooks + query
    # vector (the ADC LUT is per-query by definition)
    "x49_pq_adc_search",
    # 1-row broadcast cross join attaching the query vector to both
    # retrieval stages
    "x50_matryoshka_rerank",
    # 4-row broadcast cross join attaching the query set to the
    # scoring pass (rank fusion is per-query by definition)
    "x58_rrf_fusion",
    # phase-2 dominance anti-join runs over the LOCAL-skyline survivor
    # set only (frontier-sized per partition, broadcast side tiny by
    # construction) — the full table never enters the NLJ
    "a13_skyline",
    # K=4 centroid table broadcasts under a cross join: K rows per
    # vector, map-only assignment — bounded by K, not data size
    "x39_kmeans_assign",
    # 1-row broadcast cross join attaching the corpus (N, avgdl)
    # aggregate to the postings — the scalar-join idiom; the BNLJ's
    # build side is a single row by construction (r9 verdict)
    "x60_bm25_topk",
}
#: queries where a single-partition exchange is inherent (global top-k)
SINGLE_OK = {"o2_top_n"}


def main() -> int:
    filters = sys.argv[1:]
    spark = get_session("plan-audit")
    flags = 0
    for name, fn in sorted(all_queries().items()):
        if filters and not any(f in name for f in filters):
            continue
        if name.startswith("ice"):  # table-layer entries write to /tmp; audited via tests
            continue
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        issues = []
        if "CartesianProduct" in plan:
            issues.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in NLJ_OK:
            issues.append("BroadcastNestedLoopJoin (unintended?)")
        if "BatchEvalPython" in plan:
            issues.append("row-at-a-time Python UDF")
        if "Exchange SinglePartition" in plan and name not in SINGLE_OK:
            issues.append("single-partition exchange")
        if issues:
            flags += 1
            print(f"FLAG {name}: {', '.join(issues)}")
        else:
            print(f"ok   {name}")
    print(f"\n{flags} flagged")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
