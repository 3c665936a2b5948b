"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <float>}

Each query executes its FULL plan via the noop sink (no collect —
result sizes don't skew timing, and nothing funnels through the
driver, mirroring cluster execution).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icepack.queries import all_queries  # noqa: E402
from icepack.session import get_session  # noqa: E402

#: headline set: one per operator family, heaviest-per-family first.
HEADLINE = [
    "a0_gold_daily",
    "a4_tpch_q1",
    "a4_tpch_q5",
    "j1_inner_join",
    "j3_broadcast_star",
    "j7_asof_join",
    "w1_topk_per_group",
    "w3_running_sum",
    "a6_cube",
    "st1_tumbling_window",
    "st3_session_window",
    "x2_jaccard_pairs",
    "x3_minhash_lsh",
    "x5_cosine_topk",
    "x13_embedding_neardup",
    "x22_contamination",
    "x1_exact_dedup",
    "x28_sequence_pack",
    "x30_embedding_outliers",
    "x42_training_pipeline",
    "p1_pruned_scan",
    "f8_explode_words",
    # table-layer lifecycle: create→append→(prune/delete)→scan
    "ice1_create_append_read",
    "ice7_hidden_partition_prune",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_session("icepack-bench")
    qs = all_queries()

    # Warmup pass (JMH-style, excluded from timing): one full untimed
    # execution of every headline query.  This absorbs the one-time
    # driver costs a long-lived cluster never pays per query — Janino
    # whole-stage-codegen compilation, JIT, parquet footer parse, page
    # cache — so the timed pass measures steady-state execution, which
    # is what scales to the 100 TB target.  Nothing is cached between
    # runs (noop sink, no .cache()): the timed pass re-executes every
    # plan end to end.
    for name in HEADLINE:
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

    # Two timed iterations, keep the min: single-shot timings on a
    # shared box jitter 2-4× from GC pauses / compile stragglers (the
    # full plan still executes end-to-end both times — min-of-N is the
    # standard steady-state estimator, not a cache artifact).
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in HEADLINE:
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
