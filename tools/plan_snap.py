"""Snapshot .explain("formatted") for headline queries into plans/<tag>/.

Usage: python tools/plan_snap.py <tag-suffix> [name ...]
e.g.   python tools/plan_snap.py before            # all HEADLINE
       python tools/plan_snap.py after x48_semantic_dedup

Writes plans/r13/<query>_<tag>.txt — the optimization round's evidence
that plan-shape claims (Exchange counts, join strategies, PushedFilters)
match the committed code.  Lifecycle queries execute their side-effect
DML while being built; only the RETURNED DataFrame's plan is dumped.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icepack.queries import all_queries  # noqa: E402
from icepack.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")

HEADLINE = [
    "a0_gold_daily", "a4_tpch_q1", "a4_tpch_q5", "j1_inner_join",
    "j3_broadcast_star", "j7_asof_join", "w1_topk_per_group",
    "w3_running_sum", "a6_cube", "st1_tumbling_window",
    "st3_session_window", "x2_jaccard_pairs", "x3_minhash_lsh",
    "x5_cosine_topk", "x13_embedding_neardup", "x22_contamination",
    "x1_exact_dedup", "x28_sequence_pack", "x30_embedding_outliers",
    "x42_training_pipeline", "x47_substring_dedup", "x48_semantic_dedup",
    "p1_pruned_scan", "f8_explode_words", "ice1_create_append_read",
    "ice7_hidden_partition_prune", "ice10_mor_delete",
    "ice54_deletion_vectors",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_session("icepack-plan-snap")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
