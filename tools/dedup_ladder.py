"""Dedup-family scale ladder: x2/x47/x48/x56 at sf0.1 → sf1 → sf3 →
sf10 (replicated corpus, same metamorphic scheme as scale_ladder.py).

Why a dedicated ladder (r7 verdict item 8): the x48 superlinearity was
only visible at sf1 — the remaining quadratic-ish candidates (x47's
gram exchanges, x56's containment expansion, x2's posting lists) need
probing ABOVE sf1, where bucket depth and hot-gram multiplicity grow
10-100× past the driver fixtures.  Replication duplicates text and
embedding payloads identically, which is deliberately the WORST case
for these operators: every shingle/gram/LSH bucket deepens K×.

Only ``documents`` and ``embeddings`` replicate (the four queries read
nothing else).  Each rung: one untimed warmup + 2 timed runs per
query, min kept.  Prints one JSON line per rung plus a final ratio
table for SCALE.md.

Usage: python tools/dedup_ladder.py [--unique] [--table] [--control] [K ...]
(default K = 30 100).  ``--table`` ladders the PRODUCTION maintenance
API — dedupe_table's four methods, dry_run — instead of the query
twins (r9 verdict item 2); ``--unique`` swaps in the unique-heavy
corpus twin at equal row counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from icepack.io import load
from icepack.queries import all_queries
from icepack.session import get_session

BASE = "/root/testdata/sf0.1"
KEY_OFFSET = 1_000_000_000
QUERIES = [
    "x2_jaccard_pairs",
    "x47_substring_dedup",
    "x48_semantic_dedup",
    "x56_containment_dedup",
]
KEYS = {"documents": ("doc_id",), "embeddings": ("vec_id",)}


def build(spark, out: str, replicas: int) -> None:
    for name, keys in KEYS.items():
        dst = f"{out}/{name}.parquet"
        if os.path.exists(dst):
            continue
        df = load(spark, BASE, name)
        parts = []
        for i in range(replicas):
            p = df
            for k in keys:
                p = p.withColumn(
                    k, (F.col(k) + F.lit(i * KEY_OFFSET)).cast(dict(df.dtypes)[k])
                )
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.parquet(dst)


def build_unique(spark, out: str, replicas: int) -> None:
    """Unique-heavy twin of :func:`build` at EQUAL row counts (r8
    verdict item 7): replication is the duplicate-saturated worst case
    and exercises the adaptive COLLAPSE paths of x2/x47/x56 — the
    direct (non-collapsed) paths need the same asymptote check on a
    corpus where rows grow K× but near-duplicate structure does NOT.

    Each replica rewrites every word with a per-replica suffix (all
    shingles/grams become replica-local → no cross-replica posting
    growth) and rotates each embedding by a deterministic per-replica,
    per-dimension perturbation (directions diverge → no new cosine
    near-dups; plain scaling would preserve cosine and re-create
    duplicates)."""
    for name, keys in KEYS.items():
        dst = f"{out}/{name}.parquet"
        if os.path.exists(dst):
            continue
        df = load(spark, BASE, name)
        parts = []
        for i in range(replicas):
            p = df
            for k in keys:
                p = p.withColumn(
                    k, (F.col(k) + F.lit(i * KEY_OFFSET)).cast(dict(df.dtypes)[k])
                )
            if i > 0:
                if name == "documents":
                    p = p.withColumn(
                        "text", F.regexp_replace("text", r"(\w+)", rf"$1q{i}")
                    )
                else:
                    p = p.withColumn(
                        "embedding",
                        F.transform(
                            "embedding",
                            lambda v, j: (
                                v
                                + F.sin(
                                    F.col("vec_id") * (j + F.lit(1))
                                    + F.lit(float(i))
                                ).cast("float")
                            ).cast("float"),
                        ),
                    )
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.parquet(dst)


#: production maintenance API (icepack.dedup.dedupe_table) — r9
#: verdict item 2: the ladder must exercise the operator that DELETES
#: rows from a live table, not only its query twins.  dry_run=True so
#: the rung measures the MINING (hash/LSH/banding/CC), not the MERGE.
TABLE_METHODS = ["exact", "minhash", "simhash", "semantic"]


def _adopt(spark, corpus_dir: str, name: str, tbl_root: str):
    """IceTable over an existing parquet corpus via add_files (metadata
    -only; the parquet never moves) — cached like the corpus builds."""
    import glob as _glob

    from icepack.table import IceTable

    loc = os.path.join(tbl_root, name)
    if os.path.exists(os.path.join(loc, "metadata")):
        return IceTable.load(spark, loc)
    df = load(spark, corpus_dir, name)
    t = IceTable.create(spark, loc, df.schema)
    src = os.path.join(corpus_dir, f"{name}.parquet")
    files = (
        sorted(_glob.glob(os.path.join(src, "*.parquet")))
        if os.path.isdir(src)
        else [src]  # the driver fixtures are single parquet files
    )
    if not files:
        raise RuntimeError(f"no parquet under {src}")
    t.add_files(files)
    n, want = t.toDF().count(), df.count()
    if n != want:
        raise RuntimeError(f"adopted {n} rows, corpus has {want}")
    return t


def run_table_rung(spark, corpus_dir: str, tbl_root: str, control: bool = False) -> dict:
    """One dedupe_table rung.  ``control=True`` pins the mining
    shuffle at the session default via ``dedup.shuffle.max-partitions
    =32`` — the pre-r11 fixed-width regime — so the self-sizing
    recovery is measurable from this tool alone (SCALE.md r11)."""
    from icepack.dedup import dedupe_table

    os.makedirs(tbl_root, exist_ok=True)
    docs = _adopt(spark, corpus_dir, "documents", tbl_root)
    embs = _adopt(spark, corpus_dir, "embeddings", tbl_root)
    for t in (docs, embs):
        t.set_properties(
            **{"dedup.shuffle.max-partitions": "32" if control else "4096"}
        )
    out = {}
    for m in TABLE_METHODS:
        if m == "semantic":
            kw = dict(method=m, id_col="vec_id", dry_run=True)
            t = embs
        else:
            kw = dict(method=m, dry_run=True)
            t = docs
        # min-of-2, no extra warmup: a dedupe_table run is many jobs
        # (signatures + CC iterations + stats), so JIT is warm after
        # the first rep and a third full pass buys little
        ts = []
        for _ in range(2):
            t0 = time.time()
            r = dedupe_table(t, **kw)
            ts.append(round(time.time() - t0, 3))
        out[m] = min(ts)
        out[f"{m}_groups"] = r["groups"]
    return out


def run_v3_rung(spark, corpus_dir: str, tbl_root: str) -> dict:
    """r13 (VERDICT r12 task 7): dedupe_table END-TO-END — a REAL
    MERGE-on-read commit, not dry_run — against a spec-primary
    ``format.spec-version=3`` table.  On v3 the losers' tombstones must
    land as DELETION VECTORS (the public v3 spec forbids adding
    position-delete parquet), so this rung measures the full mine →
    cluster → MERGE WHEN MATCHED DELETE → distributed DV build →
    Puffin commit path at ladder scale, then pins that the spec tree
    still serves the deduped rows to the independent ``read_iceberg``
    reader row-count-exactly."""
    import glob as _glob

    from icepack.dedup import dedupe_table
    from icepack.iceberg_import import read_iceberg
    from icepack.table import IceTable

    os.makedirs(tbl_root, exist_ok=True)
    # fresh table per invocation: the rung COMMITS deletes, so reusing
    # an already-deduped tree would measure a no-op second pass
    loc = os.path.join(tbl_root, f"documents_v3_{int(time.time())}")
    df = load(spark, corpus_dir, "documents")
    t = IceTable.create(
        spark, loc, df.schema,
        properties={
            "format.spec-primary": "true",
            "format.spec-version": "3",
            "write.merge.mode": "merge-on-read",
            "dedup.shuffle.max-partitions": "4096",
        },
    )
    src = os.path.join(corpus_dir, "documents.parquet")
    files = (
        sorted(_glob.glob(os.path.join(src, "*.parquet")))
        if os.path.isdir(src)
        else [src]
    )
    t.add_files(files)
    before = t.toDF().count()
    t0 = time.time()
    r = dedupe_table(t, method="exact")
    wall = round(time.time() - t0, 3)
    native = t.toDF().count()
    live = t.live_files(content="all")
    if [f for f in live if f.content == "position-deletes"]:
        raise RuntimeError("v3 dedupe committed position-delete parquet")
    dvs = [f for f in live if f.content == "deletion-vectors"]
    if r["dropped"] and not dvs:
        raise RuntimeError("v3 dedupe dropped rows without deletion vectors")
    if before - r["dropped"] != native:
        raise RuntimeError(
            f"dedupe arithmetic off: {before} - {r['dropped']} != {native}"
        )
    ext = read_iceberg(spark, os.path.join(loc, "metadata")).count()
    if ext != native:
        raise RuntimeError(f"read_iceberg rows {ext} != native {native}")
    return {
        "rows_before": before,
        "dropped": r["dropped"],
        "rows_after": native,
        "exact_commit_sec": wall,
        "dv_entries": len(dvs),
        "read_iceberg_rows": ext,
    }


def run_rung(spark, qs, sf_dir: str) -> dict:
    out = {}
    for name in QUERIES:
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        ts = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts.append(round(time.time() - t0, 3))
        out[name] = min(ts)
    return out


def main() -> None:
    args = sys.argv[1:]
    unique = "--unique" in args
    table_mode = "--table" in args
    v3_mode = "--v3" in args  # r13: real MERGE->DV commit on a v3 table
    control = "--control" in args  # pin mining shuffle at 32 (pre-r11)
    reps = [int(a) for a in args if not a.startswith("--")] or [30, 100]
    spark = get_session("icepack-dedup-ladder")
    kind = "unique" if unique else "dup"
    results = {}
    if v3_mode:
        for k in [0] + reps:
            sf = 0.1 * k if k else 0.1
            out = BASE
            if k:
                out = f"/tmp/icepack-dedup-{kind}-sf{sf:g}"
                os.makedirs(out, exist_ok=True)
                (build_unique if unique else build)(spark, out, k)
            r = run_v3_rung(
                spark, out, f"/tmp/icepack-dedup-v3-{kind}-sf{sf:g}"
            )
            print(json.dumps({"sf": sf, "v3_dedupe": r, "corpus": kind if k else "base"}))
        spark.stop()
        return
    if table_mode:
        names = TABLE_METHODS
        base = run_table_rung(spark, BASE, f"/tmp/icepack-dedup-tbl-base", control)
        results[0.1] = base
        print(json.dumps({"sf": 0.1, "table": base, "corpus": "base"}))
        for k in reps:
            sf = 0.1 * k
            out = f"/tmp/icepack-dedup-{kind}-sf{sf:g}"
            os.makedirs(out, exist_ok=True)
            (build_unique if unique else build)(spark, out, k)
            r = run_table_rung(
                spark, out, f"/tmp/icepack-dedup-tbl-{kind}-sf{sf:g}", control
            )
            results[sf] = r
            print(json.dumps({"sf": sf, "table": r, "corpus": kind}))
    else:
        names = QUERIES
        qs = all_queries()
        base = run_rung(spark, qs, BASE)
        results[0.1] = base
        print(json.dumps({"sf": 0.1, "queries": base, "corpus": "base"}))
        for k in reps:
            sf = 0.1 * k
            out = f"/tmp/icepack-dedup-{kind}-sf{sf:g}"
            os.makedirs(out, exist_ok=True)
            (build_unique if unique else build)(spark, out, k)
            r = run_rung(spark, qs, out)
            results[sf] = r
            print(json.dumps({"sf": sf, "queries": r, "corpus": kind}))
    # ratio table: sec and x-vs-data-growth per rung (1.0 = perfectly
    # linear in rows; <1 = duplicate-collapse sublinearity)
    print("\nquery            " + "".join(f"{sf:>10g}" for sf in results))
    for name in names:
        row = f"{name:<17}"
        for sf, r in results.items():
            row += f"{r[name]:>10.2f}"
        print(row)
    print("\nper-row ratio vs sf0.1 (time_K / (time_0.1 * K)):")
    for name in names:
        row = f"{name:<17}"
        for sf, r in results.items():
            k = sf / 0.1
            row += f"{r[name] / (results[0.1][name] * k):>10.2f}"
        print(row)
    spark.stop()


if __name__ == "__main__":
    main()
