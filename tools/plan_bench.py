"""Planner-mode micro-benchmark: driver vs distributed planning on a
MANY-MANIFEST table (the auto plan-mode flip's raison d'être).

Planning never opens data files — only manifests — so the table is
synthesized: N append commits of M entries each (incremental manifests:
one manifest per commit), every entry carrying real per-file stats over
a key column so an equality predicate selects ~1/SEL of the files.
Times ``plan_files`` under ``read.plan-mode = driver`` and
``distributed`` on the same predicate, asserts the selections agree
(tuple+stats parity is pinned in tests/test_scanplan.py; this tool is
the TIMING evidence), and prints one JSON line for SCALE.md.

Usage: python tools/plan_bench.py [N_manifests] [entries_per_manifest]
       (default 128 x 1000 = 128k entries)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from icepack.expr import col  # noqa: E402
from icepack.manifest import DataFile  # noqa: E402
from icepack.session import get_session  # noqa: E402
from icepack.table import IceTable  # noqa: E402


def build(spark, base: str, n_manifests: int, per: int) -> IceTable:
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    t = IceTable.create(spark, os.path.join(base, "t"), schema)
    fid = 0
    for _ in range(n_manifests):
        entries = []
        for _ in range(per):
            lo = (fid * 37) % 100_000
            hi = lo + 50
            entries.append(
                DataFile(
                    path=f"{t.location}/data/synthetic-{fid}.parquet",
                    status="added",
                    partition={},
                    spec_id=t.meta.default_spec_id,
                    schema_id=t.meta.current_schema_id,
                    record_count=1000,
                    file_size_bytes=1 << 20,
                    stats={
                        "k": {"min": lo, "max": hi, "nulls": 0},
                        "v": {"min": 0.0, "max": 1.0, "nulls": 0},
                    },
                )
            )
            fid += 1
        t._commit_snapshot("append", entries)
    return t


def main() -> None:
    n_manifests = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_session("icepack-plan-bench")
    base = tempfile.mkdtemp(prefix="plan-bench-")
    t0 = time.time()
    t = build(spark, base, n_manifests, per)
    build_s = round(time.time() - t0, 1)
    total = n_manifests * per
    pred = col("k") == 12_345  # selects the files whose 50-wide range covers it

    out: dict = {
        "manifests": n_manifests,
        "entries": total,
        "build_sec": build_s,
    }
    for mode in ("driver", "distributed"):
        t.set_properties(**{"read.plan-mode": mode})
        # one untimed warmup (JVM/codegen for the distributed job)
        t.plan_files(pred)
        ts = []
        for _ in range(3):
            s = time.time()
            files, rep = t.plan_files(pred)
            ts.append(round(time.time() - s, 3))
        out[mode] = {
            "sec_min": min(ts),
            "samples": ts,
            "files_scanned": len(files),
            "planner": rep.get("planner", "driver"),
        }
    assert out["driver"]["files_scanned"] == out["distributed"]["files_scanned"]
    out["selected_fraction"] = round(
        out["driver"]["files_scanned"] / total, 5
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
