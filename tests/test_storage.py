"""Metadata-storage seam (storage.py): a table whose metadata I/O goes
through a NON-default store — proving table.py/manifest.py/catalog.py/
maintenance.py are not filesystem-bound (docs/01-table-format-
architecture.md:101-124: the reference's data model assumes object
storage for everything, and this seam is where an S3 adapter plugs in).

The integration tests run a full table lifecycle (create, append, DML,
time travel, compaction, expire, orphan sweep) with every metadata
document living ONLY in an InMemoryStore dict while Spark keeps writing
parquet to local disk — the exact metadata/data split of an
object-store + catalog deployment.
"""

import os

import pytest
from pyspark.sql import Row, functions as F

from icepack.catalog import Catalog
from icepack.maintenance import (
    compact,
    expire_snapshots,
    remove_orphan_files,
    rewrite_manifests,
    table_health,
)
from icepack.storage import InMemoryStore, LocalStore
from icepack.table import CommitConflict, IceTable

from .conftest import rows_sorted


# -- store unit semantics ---------------------------------------------------


def test_create_exclusive_is_cas():
    st = InMemoryStore()
    st.create_exclusive("/t/metadata/v1.metadata.json", "a")
    with pytest.raises(FileExistsError):
        st.create_exclusive("/t/metadata/v1.metadata.json", "b")
    assert st.read_text("/t/metadata/v1.metadata.json") == "a"


def test_replace_and_glob_and_mtime():
    st = InMemoryStore()
    st.replace_text("/t/metadata/manifest-a.jsonl", "x")
    st.replace_text("/t/metadata/snap-1.manifest-list.json", "y")
    st.replace_text("/t/metadata/v1-abc.metadata.json", "z")
    assert st.glob("/t/metadata/v*-*.metadata.json") == ["/t/metadata/v1-abc.metadata.json"]
    assert st.mtime_ms("/t/metadata/manifest-a.jsonl") > 0
    st.delete("/t/metadata/manifest-a.jsonl")
    st.delete("/t/metadata/manifest-a.jsonl")  # idempotent
    assert not st.exists("/t/metadata/manifest-a.jsonl")


def test_local_store_replace_is_atomic_rename(tmp_path):
    st = LocalStore()
    p = str(tmp_path / "hint.json")
    st.replace_text(p, "1")
    st.replace_text(p, "2")
    assert st.read_text(p) == "2"
    assert os.listdir(tmp_path) == ["hint.json"]  # no tmp debris


# -- table lifecycle on the non-default store -------------------------------


def _no_local_metadata(location: str) -> bool:
    mdir = os.path.join(location, "metadata")
    return not os.path.exists(mdir) or os.listdir(mdir) == []


def test_table_lifecycle_in_memory_metadata(spark, tmp_path):
    st = InMemoryStore()
    loc = str(tmp_path / "t")
    t = IceTable.create(
        spark, loc, spark.range(0).selectExpr("id", "id * 2 as v").schema, store=st
    )
    t.append(spark.range(5).selectExpr("id", "id * 2 as v"))
    t.append(spark.range(5, 8).selectExpr("id", "id * 2 as v"))

    # every metadata doc lives only in the store; local disk has parquet only
    assert _no_local_metadata(t.location)
    assert st.glob(os.path.join(t.location, "metadata", "v*.metadata.json"))
    assert st.glob(os.path.join(t.location, "metadata", "manifest-*.jsonl"))
    local_parquet = [
        p for root, _d, files in os.walk(os.path.join(t.location, "data"))
        for p in files if p.endswith(".parquet")
    ]
    assert local_parquet  # data stayed on the Spark-side filesystem

    assert t.toDF().count() == 8
    # a fresh handle resolves purely through the store
    t2 = IceTable.load(spark, loc, store=st)
    assert rows_sorted(t2.toDF()) == rows_sorted(t.toDF())
    # time travel across in-memory snapshots
    first = t.meta.snapshots[0].snapshot_id
    assert t.toDF(snapshot=t.as_of(snapshot_id=first)).count() == 5


def test_commit_conflict_through_store(spark, tmp_path):
    st = InMemoryStore()
    loc = str(tmp_path / "t")
    t = IceTable.create(
        spark, loc, spark.range(0).selectExpr("id").schema, store=st
    )
    # simulate a racing writer: occupy the next version key in the store
    nxt = st.join(t._mdir, f"v{t._version + 1}.metadata.json")
    st.create_exclusive(nxt, t.meta.dumps())
    # the loser's CAS sees the conflict, refreshes past it, and retries
    t.append(spark.range(3).selectExpr("id"))
    assert t._version >= 3
    assert t.toDF().count() == 3


def test_maintenance_through_store(spark, tmp_path):
    st = InMemoryStore()
    loc = str(tmp_path / "t")
    t = IceTable.create(spark, loc, spark.range(0).selectExpr("id").schema, store=st)
    for lo in range(0, 9, 3):
        t.append(spark.range(lo, lo + 3).selectExpr("id"))
    assert table_health(t)["file_count"] >= 3

    rewrite_manifests(t)
    assert table_health(t)["manifest_count"] == 1

    compact(t)
    assert rows_sorted(t.toDF()) == [(i,) for i in range(9)]

    expired = expire_snapshots(t, older_than_ms=int(1e18), retain_last=1)
    assert expired["expired"] >= 3
    # expired manifests were deleted from the store, survivors remain
    assert st.glob(os.path.join(t.location, "metadata", "manifest-*.jsonl"))
    assert rows_sorted(t.toDF()) == [(i,) for i in range(9)]

    # orphan sweep of unreferenced data files works with store-side metadata
    swept = remove_orphan_files(t, older_than_ms=int(1e18))
    assert all(p.endswith(".parquet") for p in swept)
    assert rows_sorted(t.toDF()) == [(i,) for i in range(9)]
    assert _no_local_metadata(t.location)


def test_threaded_commit_race_through_memory_store(spark, tmp_path):
    """Two handles over the SAME in-memory store race appends: the
    conditional-PUT create_exclusive is the only arbiter (no POSIX
    O_EXCL involved), and both appends must land via the retry loop —
    the object-store analog of the local CAS race test."""
    from concurrent.futures import ThreadPoolExecutor

    st = InMemoryStore()
    loc = str(tmp_path / "t")
    IceTable.create(spark, loc, spark.range(0).selectExpr("id").schema, store=st)
    h1 = IceTable.load(spark, loc, store=st)
    h2 = IceTable.load(spark, loc, store=st)

    def go(h, lo):
        h.append(spark.range(lo, lo + 4).selectExpr("id"))

    with ThreadPoolExecutor(max_workers=2) as ex:
        f1 = ex.submit(go, h1, 0)
        f2 = ex.submit(go, h2, 100)
        f1.result(), f2.result()

    t = IceTable.load(spark, loc, store=st)
    got = {r.id for r in t.toDF().collect()}
    assert got == {0, 1, 2, 3, 100, 101, 102, 103}
    assert len(t.meta.snapshots) == 2


def test_catalog_objects_through_store(spark, tmp_path):
    st = InMemoryStore()
    cat = Catalog(spark, str(tmp_path / "wh"), store=st)
    cat.create_external_volume("vol1", [{"NAME": "a", "STORAGE_BASE_URL": "s3://bkt/p"}])
    assert cat.list_external_volumes() == ["vol1"]
    assert cat.get_external_volume("vol1")["storage_locations"][0]["NAME"] == "a"

    tbl = cat.create_table(
        "db.t1", spark.range(0).selectExpr("id").schema
    )
    tbl.append(spark.range(4).selectExpr("id"))
    assert cat.table_exists("db.t1")
    assert cat.load_table("db.t1").toDF().count() == 4
    assert _no_local_metadata(tbl.location)


def test_location_binding_resolves_store_for_string_only_consumers(spark, tmp_path):
    """Consumers that hold only a LOCATION STRING — the streaming
    source/sink registers by option, not by handle — must re-resolve
    the store a sibling handle created the table with (round-4 seam ×
    datasource product; the TxnTable analog was audit finding #3)."""
    from icepack.datasource import _StreamReader

    mem = InMemoryStore()
    loc = str(tmp_path / "bound")
    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(4)])
    t = IceTable.create(spark, loc, df.schema, store=mem)
    t.append(df)

    # string-only load (what the datasource does internally) finds the
    # bound store instead of failing on an empty local directory
    t2 = IceTable.load(spark, loc)
    assert t2.store is mem
    assert t2.toDF().count() == 4

    # and the streaming reader's batch planning works against the
    # bound store.  (Scope: the binding is process-local, so it covers
    # every same-process string-only consumer — IceSQL temp views,
    # scheduler task bodies, direct reader use as here.  A stream
    # STARTED through spark.readStream runs the data source in a
    # separate Python worker process, where only stateless scheme
    # dispatch can resolve a store — i.e. a real object-store adapter;
    # the in-memory proof store is inherently single-process.)
    r = _StreamReader(None, loc, {})
    off = r.latestOffset()
    parts = r.partitions({"seq": 0}, off)
    assert parts


def test_binding_evicted_on_drop_and_rebind(spark, tmp_path):
    """Dropping a table evicts its location→store binding, so a table
    re-created at the same path with the default local store doesn't
    resolve the stale in-memory store (ADVICE r5 #3)."""
    from pyspark.sql import types as T

    from icepack import storage
    from icepack.catalog import Catalog
    from icepack.storage import LOCAL, InMemoryStore, store_for

    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh, store=InMemoryStore())
    schema = T.StructType([T.StructField("id", T.LongType())])
    t = cat.create_table("db.bind", schema)
    loc = t.location
    assert store_for(loc) is cat.store  # bound by the explicit store
    # drop via a plain local-store catalog at the same warehouse
    Catalog(spark, wh).drop_table("db.bind", purge=True)
    assert store_for(loc) is LOCAL, "drop must evict the binding"
    # explicit local rebind also evicts a stale mapping
    storage._BOUND[os.path.abspath(loc)] = InMemoryStore()
    assert store_for(loc, LOCAL) is LOCAL
    assert store_for(loc) is LOCAL
