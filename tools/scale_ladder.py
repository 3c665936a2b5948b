"""Build an sfN-equivalent fixture set by replicating sf0.1 and run the
headline bench on it — the top rung of SCALE.md's measured ladder.

The driver ships fixtures only up to sf0.1; the super-linearity check
needs at least one point an order of magnitude beyond that.  Following
the metamorphic scheme of tests/test_scale_smoke.py: facts replicate
K× with join keys offset per replica (replicas never cross-join, so
per-key work is invariant and totals scale exactly K×); fixed-
cardinality dims (region/nation/supplier/part) stay 1×, as they would
at any TPC-H scale factor beyond their caps.  Text/embedding payloads
are identical across replicas — deliberately, since that stresses the
dedup/LSH bucket-depth path, the worst case for those operators.

Usage:  python tools/scale_ladder.py [K]        (default K=10 → "sf1")

Writes the replicated set to /tmp/icepack-sf<sf>/ (name carries the sf
so bench.py's sf-from-path parse works) and execs bench.py on it.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from icepack.io import TABLES, load
from icepack.session import get_session

BASE = "/root/testdata/sf0.1"
KEY_OFFSET = 1_000_000_000

#: per-table replication keys (offset per replica); absent = dim, copied 1×
FACT_KEYS = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def build(out: str, replicas: int) -> None:
    spark = get_session("icepack-scale-ladder")
    for name in TABLES:
        dst = f"{out}/{name}.parquet"
        if os.path.exists(dst):
            continue
        df = load(spark, BASE, name)
        keys = FACT_KEYS.get(name)
        if keys:
            parts = []
            for i in range(replicas):
                p = df
                for k in keys:
                    p = p.withColumn(k, (F.col(k) + F.lit(i * KEY_OFFSET)).cast(dict(df.dtypes)[k]))
                parts.append(p)
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            u.write.parquet(dst)
        else:
            df.write.parquet(dst)
    spark.stop()


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf = 0.1 * replicas
    out = f"/tmp/icepack-sf{sf:g}"
    os.makedirs(out, exist_ok=True)
    build(out, replicas)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": out,
        # keep the sf0.1 BENCH_DETAIL.json intact: the ladder's run
        # writes its own detail file
        "SPARK_GRAFT_DETAIL_PATH": os.path.join(repo, f"SF{sf:g}_BENCH_DETAIL.json"),
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env,
        check=True,
        capture_output=True,
        text=True,
    )
    line = proc.stdout.strip().splitlines()[-1]
    print(line)
    if replicas == 10:  # the canonical sf1 rung: persist for bench.py
        import json

        rec = json.loads(line)
        with open(os.path.join(repo, "SF1_BENCH.json"), "w") as fh:
            json.dump(rec, fh, indent=2, sort_keys=True)
        print(f"wrote {os.path.join(repo, 'SF1_BENCH.json')}")


if __name__ == "__main__":
    main()
