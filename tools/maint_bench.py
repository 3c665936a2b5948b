"""Maintenance-lane micro-benchmark: driver vs distributed execution
of the metadata-heavy maintenance ops on a MANY-MANIFEST table (the
r10 executor-side lanes' raison d'être).

Maintenance planning never opens data files — only manifests — so the
table is synthesized exactly like tools/plan_bench.py: N append
commits of M entries each (one incremental manifest per commit), every
entry carrying stats and an identity partition value.  Per mode the
sequence is:

1. ``write_partition_stats``      (aggregation over all live entries)
2. ``rewrite_manifests``          (decode + regroup + rewrite them all)
3. ``expire_snapshots``           (the rewrite's replace snapshot makes
                                   every pre-rewrite manifest
                                   expired-only, so reachability has
                                   real entry-level work to do)

Each mode gets its OWN freshly-built table (rewrite mutates the tree).
Prints one JSON line for SCALE.md.

Usage: python tools/maint_bench.py [N_manifests] [entries_per_manifest]
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

from icepack.avroenc import read_container_with_meta  # noqa: E402
from icepack.iceberg_export import export_iceberg  # noqa: E402
from icepack.maintenance import (  # noqa: E402
    expire_snapshots,
    rewrite_manifests,
    verify_table,
)
from icepack.manifest import DataFile  # noqa: E402
from icepack.session import get_session  # noqa: E402
from icepack.stats import write_partition_stats  # noqa: E402
from icepack.table import IceTable  # noqa: E402


def build(spark, base: str, n_manifests: int, per: int, mode: str) -> IceTable:
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    t = IceTable.create(
        spark,
        os.path.join(base, "t"),
        schema,
        partition_by=[("k", "identity")],
        properties={"read.plan-mode": mode},
    )
    fid = 0
    for _ in range(n_manifests):
        entries = []
        for _ in range(per):
            lo = (fid * 37) % 100_000
            entries.append(
                DataFile(
                    path=f"{t.location}/data/synthetic-{fid}.parquet",
                    status="added",
                    partition={"k": lo % 32},
                    spec_id=t.meta.default_spec_id,
                    schema_id=t.meta.current_schema_id,
                    record_count=1000,
                    file_size_bytes=1 << 20,
                    stats={
                        "k": {"min": lo, "max": lo + 50, "nulls": 0},
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
    spark = get_session("icepack-maint-bench")
    out: dict = {"manifests": n_manifests, "entries": n_manifests * per}
    check: dict = {}
    for mode in ("driver", "distributed"):
        base = tempfile.mkdtemp(prefix=f"maint-bench-{mode}-")
        t0 = time.time()
        t = build(spark, base, n_manifests, per, mode)
        res: dict = {"build_sec": round(time.time() - t0, 1)}
        t0 = time.time()
        write_partition_stats(t)
        res["pstats_sec"] = round(time.time() - t0, 2)
        # fsck metadata walk (r11 distributed lane).  The synthetic
        # entries reference parquet that was never written, so BOTH
        # lanes emit one missing-file finding per entry — a worst case
        # for the distributed lane (it pays an O(entries) findings
        # collect a healthy table never would), making this an UPPER
        # bound on its cost; the lanes must agree on the finding count.
        t0 = time.time()
        fsck_findings = verify_table(t)
        res["fsck_sec"] = round(time.time() - t0, 2)
        res["fsck_findings"] = len(fsck_findings)
        # spec export encode (r12 distributed lane): pure metadata
        # encode — the synthetic parquet is never opened, so this times
        # exactly the per-entry record build + avro container encode
        exp_dest = os.path.join(base, "export")
        t0 = time.time()
        export_iceberg(t, dest=exp_dest)
        res["export_sec"] = round(time.time() - t0, 2)
        exp_rows = 0
        for fn in os.listdir(exp_dest):
            if fn.startswith("snap-") and fn.endswith(".avro"):
                _s, recs, _m = read_container_with_meta(
                    open(os.path.join(exp_dest, fn), "rb").read()
                )
                exp_rows += sum(
                    r["added_rows_count"] + r["existing_rows_count"]
                    for r in recs
                )
        res["export_rows"] = exp_rows
        # fv3 export (r13): the driver lane walks live_files and
        # memo-assigns row ids sequentially; the distributed lane
        # pre-assigns per-manifest bases (row-count pre-pass + driver
        # prefix sum) and encodes in executors — the assigned ids must
        # be BYTE-IDENTICAL across lanes
        exp3_dest = os.path.join(base, "export3")
        t0 = time.time()
        export_iceberg(t, dest=exp3_dest, format_version=3)
        res["export_v3_sec"] = round(time.time() - t0, 2)
        ids3 = {}
        for fn in os.listdir(exp3_dest):
            if fn.startswith("manifest-") and fn.endswith(".avro"):
                _s, recs, _m = read_container_with_meta(
                    open(os.path.join(exp3_dest, fn), "rb").read()
                )
                if _m.get("content", b"data").decode() != "data":
                    continue
                for r in recs:
                    ids3[r["data_file"]["file_path"]] = r["data_file"][
                        "first_row_id"
                    ]
        res["export_v3_files"] = len(ids3)
        out[f"_ids3_{mode}"] = ids3
        t0 = time.time()
        rewrite_manifests(t)
        res["rewrite_sec"] = round(time.time() - t0, 2)
        res["manifests_after_rewrite"] = len(
            t._read_mlist(t.meta.current_snapshot.manifest_list)
        )
        t0 = time.time()
        rep = expire_snapshots(t, older_than_ms=2**62, retain_last=1)
        res["expire_sec"] = round(time.time() - t0, 2)
        res["expired"] = rep["expired"]
        out[mode] = res
        check[mode] = (
            rep["expired"],
            sorted(r[0] for r in t.partition_stats().select("spec_id").collect()),
            t.meta.current_snapshot.sequence_number,
            res["fsck_findings"],
            res["export_rows"],
        )
    assert check["driver"][0] == check["distributed"][0], check
    assert check["driver"][3] == check["distributed"][3], check
    assert check["driver"][4] == check["distributed"][4], check
    ids_d = out.pop("_ids3_driver")
    ids_x = out.pop("_ids3_distributed")
    assert len(ids_d) == len(ids_x) and sorted(ids_d.values()) == sorted(
        ids_x.values()
    ), "fv3 export row-id assignment diverged across lanes"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
