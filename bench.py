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
    # span-level substring dedup (r6): the heaviest token-granular
    # dedup leg; sf1 ladder stresses its all-grams-shared worst case
    "x47_substring_dedup",
    # semantic-dedup candidate mining (r7): within-bucket pairwise
    # cosine — the vector analogue of x2's bounded pair expansion
    "x48_semantic_dedup",
    "p1_pruned_scan",
    "f8_explode_words",
    # table-layer lifecycle: create→append→(prune/delete)→scan
    "ice1_create_append_read",
    "ice7_hidden_partition_prune",
    # merge-on-read leg (r6): equality-delete masks applied at scan —
    # the sf1 ladder reruns this HEADLINE, so the delete-merge path's
    # scale trend is measured, not assumed
    "ice10_mor_delete",
    # v3 deletion vectors (r7 continuation): position-delete MOR →
    # distributed bitmap consolidation → DV-masked scan.  NEW this
    # round: subtract from cross-round headline comparisons
    "ice54_deletion_vectors",
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

    # Timed iterations (n=5 default), INTERLEAVED per sweep: every
    # sweep runs the canary then each query once, so machine drift
    # within the run spreads across all queries instead of biasing
    # whichever query ran last.  min stays the headline estimator
    # (cross-round continuity); MEDIANS + spread go to BENCH_DETAIL so
    # a round-over-round delta is classified noise-vs-real from the
    # artifact alone (r7 verdict item 5: a +12% driver-run drift on
    # untouched plans needed the builder's word to dismiss).
    #
    # The CANARY is a fixed constant-plan query (range→sum, no I/O, no
    # shuffle): its median is a machine-speed gauge.  Comparing two
    # rounds' canaries gives the machine factor; a query delta beyond
    # that factor is code, not weather.
    #
    # Build vs exec: construction time (the Python/driver work inside
    # the query callable — for lifecycle entries like ice54 this is
    # create+DML+consolidation) is timed separately from plan
    # execution, so the composite ice54 number can't mask a future
    # regression in its 100 TB-relevant SCAN leg (r7 verdict item 7).
    import statistics

    reps = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    build_s: dict[str, list[float]] = {name: [] for name in HEADLINE}
    exec_s: dict[str, list[float]] = {name: [] for name in HEADLINE}
    canary: list[float] = []

    def _canary() -> float:
        t0 = time.time()
        spark.range(50_000_000).selectExpr("sum(id * 2 + 1) AS s").write.mode(
            "overwrite"
        ).format("noop").save()
        return round(time.time() - t0, 3)

    _canary()  # warm the canary's own codegen once
    for _ in range(reps):
        canary.append(_canary())
        for name in HEADLINE:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            samples[name].append(round(t2 - t0, 3))
            build_s[name].append(round(t1 - t0, 3))
            exec_s[name].append(round(t2 - t1, 3))
    timings = {name: min(ts) for name, ts in samples.items()}
    spread = {}
    for name, ts in samples.items():
        mean = sum(ts) / len(ts)
        sd = (sum((t - mean) ** 2 for t in ts) / (len(ts) - 1)) ** 0.5
        spread[name] = {
            "median": round(statistics.median(ts), 3),
            "mean": round(mean, 3),
            "sd": round(sd, 3),
            "min": min(ts),
            "max": max(ts),
            "build_median": round(statistics.median(build_s[name]), 3),
            "exec_median": round(statistics.median(exec_s[name]), 3),
        }
    canary_median = round(statistics.median(canary), 3)

    # Streaming-ingest leg (docs/12:211-236 bronze pattern): events as a
    # bounded multi-batch file stream through the foreachBatch snapshot
    # sink, timed end-to-end, with committed file sizes reported so the
    # docs/02:84-88 small-file behavior is MEASURED per round, not just
    # asserted in pytest.  Run once (a streaming query has fixed
    # per-batch overhead that min-of-N would hide, and its cost is
    # dominated by commit count, not data volume).
    st_time, st_files, st_rows_per_sec = _bench_stream_ingest(spark, sf_dir)
    timings["st0_stream_ingest"] = st_time

    total = round(sum(timings.values()), 3)
    # sf1 ladder rows (tools/scale_ladder.py 10× rung, re-measured each
    # round): embedded so the sf1 trend is machine-tracked in BENCH_r*
    # rather than living only in SCALE.md prose
    sf1 = None
    ladder_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SF1_BENCH.json")
    if os.path.exists(ladder_path):
        with open(ladder_path) as fh:
            rec = json.load(fh)
        sf1 = {"value": rec.get("value"), "queries": rec.get("queries")}
    # Full payload goes to a repo file (BENCH_DETAIL.json); stdout gets
    # the compact record as the FINAL line.  The driver tail-captures
    # ~2000 chars of stdout, so the last line must be small enough to
    # survive whole — r5's single fat line pushed "value" past the
    # capture window and the round lost its headline number.
    detail = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_spread": spread,
        "reps": reps,
        "canary": {"median": canary_median, "samples": canary},
        # the 100 TB-relevant DV legs, split so the composite can't
        # mask a scan regression: write = create+MOR deletes+bitmap
        # consolidation (driver+DML), scan = the DV-masked read plan
        "dv_legs": {
            "write": spread["ice54_deletion_vectors"]["build_median"],
            "scan": spread["ice54_deletion_vectors"]["exec_median"],
        },
        "sf": sf,
        "sf1_ladder": sf1,
        "stream_files": st_files,
        "stream_rows_per_sec": st_rows_per_sec,
    }
    detail_path = os.environ.get("SPARK_GRAFT_DETAIL_PATH") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    compact = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "canary_sec": canary_median,
        "stream_rows_per_sec": st_rows_per_sec,
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # still too fat for the tail capture: drop per-query
        compact.pop("queries")
        line = json.dumps(compact)
    print(line)
    spark.stop()


def _bench_stream_ingest(spark, sf_dir: str) -> tuple[float, dict, int | None]:
    """Bronze streaming ingest at bench scale: land events as 8 parquet
    files, replay them as an AvailableNow stream (2 files/trigger = 4
    micro-batches = 4 snapshot commits), coalesce each batch to one
    file per commit (the docs' streaming file-sizing guidance).

    Returns (seconds, file-size stats).  Scale note: at sf0.1 each
    commit lands ~1/4 of events (~single-digit MB); the 64-128 MB
    production band (docs/02:84-88) is reached by the same sink when a
    trigger accumulates ~100× the rows — file size scales with batch
    size, and compaction (ice9/M1) restores health for any residue."""
    import shutil
    import tempfile

    from icepack.io import load
    from icepack.streaming import write_stream_to_table
    from icepack.table import IceTable

    base = tempfile.mkdtemp(prefix="bench-stream-")
    try:
        ev = load(spark, sf_dir, "events")
        src = os.path.join(base, "src")
        ev.repartition(8).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        table = IceTable.create(spark, os.path.join(base, "tbl"), schema)
        t0 = time.time()
        q = write_stream_to_table(
            stream, table, os.path.join(base, "ckpt"), coalesce_to="auto"
        )
        q.awaitTermination(600)
        dt = round(time.time() - t0, 3)
        table.refresh()
        sizes = sorted(f.file_size_bytes for f in table.live_files())
        # Steady-state throughput: rows/s over the batches AFTER the
        # first, measured from snapshot commit timestamps.  The first
        # batch absorbs the stream's fixed startup (source listing,
        # codegen, sink init); later batches are the per-batch cost a
        # long-lived stream actually pays, so a regression there can't
        # hide behind the startup constant.
        snaps = sorted(table.meta.snapshots, key=lambda s: s.timestamp_ms)
        rows_per_sec = None
        if len(snaps) >= 2 and snaps[-1].timestamp_ms > snaps[0].timestamp_ms:
            steady_rows = sum(
                int(s.summary.get("added-records", 0)) for s in snaps[1:]
            )
            steady_sec = (snaps[-1].timestamp_ms - snaps[0].timestamp_ms) / 1000
            rows_per_sec = int(steady_rows / steady_sec)
        stats = {
            "n_files": len(sizes),
            "n_commits": len(table.meta.snapshots),
            "min_bytes": sizes[0],
            "mean_bytes": int(sum(sizes) / len(sizes)),
            "max_bytes": sizes[-1],
        }
        return dt, stats, rows_per_sec
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
