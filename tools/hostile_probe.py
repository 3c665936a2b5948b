"""Hostile-session probe (one command for the /verify recipe).

Simulates the DRIVER's exact conditions, deliberately hostile:
- run from a NON-repo cwd (worker imports must not lean on cwd);
- import ``__spark_entry__`` by FILE PATH (no package install);
- build the SparkSession WITHOUT our confs and with a non-UTC
  timezone (``icepack.session.ensure_confs`` must normalize at
  runtime, and ``addPyFile`` must ship the package to workers).

Checks: entry() returns rows, a ns-timestamp query runs, a
UDF-bearing table query runs (ice54 exercises the executor-side DV
decode; ice50 the canonicalizer pandas UDFs), and the
queries()/oracle_sql() key sets match.

Usage: python tools/hostile_probe.py   (from anywhere)
"""

from __future__ import annotations

import importlib.util
import os
import sys
import tempfile


def main() -> int:
    os.chdir(tempfile.gettempdir())  # the hostile part: NOT the repo
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    n = len(mod.entry(spark).collect())
    assert n > 0, "entry() returned no rows"
    print(f"entry rows: {n}")
    qs = mod.queries()
    qs["st1_tumbling_window"](spark, "/root/testdata/sf0.01").collect()
    print("st1 (ns timestamps) OK")
    # ice60: the auto-DISTRIBUTED planner (Spark-side pruning over a
    # bucket-partitioned table) — its mapInPandas/semi-join stages must
    # run on a foreign session's workers; ice49: spec-primary, whose
    # distributed plans decode Avro manifests executor-side
    # ice62: decimal truncate[W] partitioning (r10) — the unscaled-long
    # projection, the DSv2-parity transform lanes, and the decimal
    # footer-stats fallback all run against the foreign session
    for probe in (
        "ice54_deletion_vectors",
        "ice50_foreign_adopt",
        "ice60_auto_distributed_scan",
        "ice49_spec_primary",
        "ice62_decimal_truncate",
    ):
        rows = qs[probe](spark, "/root/testdata/sf0.001").collect()
        assert rows, f"{probe} returned no rows"
        print(f"{probe} OK ({len(rows)} rows)")
    # Picklable-store distributed planning on a FOREIGN session (r10):
    # a loopback-S3-backed table plans its scan with the store pickled
    # into executor closures — workers must import icepack via the
    # addPyFile shipping AND reconstruct the store to read manifests
    # over signed HTTP, with zero driver-side entry decodes.
    sys.path.insert(0, repo)
    import threading
    from http.server import ThreadingHTTPServer

    from pyspark.sql import Row

    from icepack.expr import col
    from icepack.s3store import LoopbackS3Handler, S3Store
    from icepack.scanplan import plan_entries_distributed
    from icepack.table import IceTable

    handler = LoopbackS3Handler.make("AK", "sk", "us-east-1")
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    srv_thread = threading.Thread(target=srv.serve_forever, daemon=True)
    srv_thread.start()
    store = S3Store(
        f"http://127.0.0.1:{srv.server_port}", bucket="probe",
        region="us-east-1", access_key="AK", secret_key="sk",
    )
    loc = tempfile.mkdtemp(prefix="probe-s3-")
    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(8)])
    t = IceTable.create(spark, os.path.join(loc, "t"), df.schema, store=store)
    t.append(df)
    decodes = []
    orig = IceTable._read_mentries
    IceTable._read_mentries = lambda self, name: (
        decodes.append(name), orig(self, name))[1]
    try:
        files, _ = plan_entries_distributed(t, col("id") >= 4)
    finally:
        IceTable._read_mentries = orig
    assert files and decodes == [], (files, decodes)
    assert handler.bad_auth == []
    print(f"s3-store distributed planning OK ({len(files)} files, 0 driver decodes)")
    # r10: executor-side maintenance on the same S3-backed table — the
    # manifest LINES reader must reconstruct the pickled store in the
    # foreign session's workers for rewrite_manifests and the
    # partition-stats aggregation, again with zero driver decodes
    from icepack.maintenance import rewrite_manifests
    from icepack.stats import write_partition_stats

    assert srv_thread.is_alive(), "loopback S3 server thread died"
    t.set_properties(**{"read.plan-mode": "distributed"})
    before = sorted(r.id for r in t.toDF().collect())
    decodes = []
    IceTable._read_mentries = lambda self, name: (
        decodes.append(name), orig(self, name))[1]
    try:
        rewrite_manifests(t)
        write_partition_stats(t)
    finally:
        IceTable._read_mentries = orig
    assert decodes == [], decodes
    assert sorted(r.id for r in t.toDF().collect()) == before
    srv.shutdown()  # after the last read: shutdown stops serving but
    # keeps the listening socket, so a later request would hang forever
    print("s3-store executor-side maintenance OK (rewrite+pstats, 0 driver decodes)")

    qk, ok = set(qs), set(mod.oracle_sql())
    assert qk == ok, f"key sets differ: {qk ^ ok}"
    print(f"key sets match: {len(qk)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
