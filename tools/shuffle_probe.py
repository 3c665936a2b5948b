"""Shuffle-partition scaling probe for the dedup ladder's top rung
(r9 verdict item 8).

SCALE.md attributes the unique-corpus ladder's 100x->300x elevation
(3.9-5.7x time for 3x rows) to the single-box shuffle regime: at that
rung the working set exceeds the 32-way local shuffle's in-memory
sort, so tasks spill to external-sort IO.  If that attribution is
right, scaling ``spark.sql.shuffle.partitions`` with the rung (the
exact knob a cluster deployment turns) must flatten the elevation; if
it's wrong (e.g. hidden pair growth), more partitions won't help.

Runs the 4 dedup-family queries on the K-replica unique corpus at
several shuffle-partition settings (2 runs each, min kept; the first
setting's first pass doubles as JIT warmup for the rest).

Usage: python tools/shuffle_probe.py [K] [parts ...]
       (defaults: K=300, parts = 32 128 256)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icepack.queries import all_queries
from icepack.session import get_session

from dedup_ladder import QUERIES, build_unique  # noqa: E402


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    k = args[0] if args else 300
    parts = args[1:] or [32, 128, 256]
    sf = 0.1 * k
    out = f"/tmp/icepack-dedup-unique-sf{sf:g}"
    spark = get_session("icepack-shuffle-probe")
    os.makedirs(out, exist_ok=True)
    build_unique(spark, out, k)
    qs = all_queries()
    results: dict[int, dict[str, float]] = {}
    for p in parts:
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        r: dict[str, float] = {}
        for name in QUERIES:
            ts = []
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, out).write.mode("overwrite").format("noop").save()
                ts.append(round(time.time() - t0, 3))
            r[name] = min(ts)
        results[p] = r
        print(json.dumps({"sf": sf, "shuffle_partitions": p, "queries": r}))
    base = results[parts[0]]
    print("\nquery            " + "".join(f"{p:>10d}" for p in parts))
    for name in QUERIES:
        row = f"{name:<17}"
        for p in parts:
            row += f"{results[p][name]:>10.2f}"
        print(row)
    print("\nratio vs first setting:")
    for name in QUERIES:
        row = f"{name:<17}"
        for p in parts:
            row += f"{results[p][name] / base[name]:>10.2f}"
        print(row)
    spark.stop()


if __name__ == "__main__":
    main()
