"""REST catalog protocol (SURVEY.md S5): client + table commit seam
against an in-process loopback server implementing the same public
Iceberg-REST subset — namespaces, table lifecycle, and the pointer-CAS
commit endpoint with its 409-on-stale-base contract.

The server below is a test double for a real Glue/REST service: an
in-memory {(namespace, table): metadata-location} map behind a lock.
What these tests pin is everything an offline sandbox CAN verify about
external-catalog mode: protocol shapes, CAS semantics, conflict-retry
through the inherited _commit_snapshot loop, and that a second client
(another "engine", docs/11-multi-engine-compatibility.md:16-29) sees
exactly the committed state.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from icepack.restcat import RestCatalog, RestCatalogClient
from icepack.table import CommitConflict


class _State:
    def __init__(self):
        self.lock = threading.Lock()
        self.namespaces: dict[str, dict] = {}
        self.tables: dict[tuple[str, str], str] = {}  # -> metadata-location


class _Handler(BaseHTTPRequestHandler):
    state: _State  # set per-server

    def log_message(self, *a):  # silence test output
        pass

    def _send(self, status: int, payload: dict | None = None):
        body = json.dumps(payload or {}).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        return json.loads(self.rfile.read(n)) if n else {}

    def do_GET(self):
        st, parts = self.state, self.path.strip("/").split("/")
        # /v1/config | /v1/namespaces | /v1/namespaces/{ns}/tables
        # /v1/namespaces/{ns}/tables/{t}
        if parts[1:] == ["config"]:
            return self._send(200, {"defaults": {}, "overrides": {}})
        if parts[1:] == ["namespaces"]:
            return self._send(
                200, {"namespaces": [ns.split(".") for ns in st.namespaces]}
            )
        if len(parts) == 4 and parts[3] == "tables":
            ns = parts[2]
            ids = [
                {"namespace": ns.split("."), "name": t}
                for (n, t) in st.tables
                if n == ns
            ]
            return self._send(200, {"identifiers": ids})
        if len(parts) == 5 and parts[3] == "tables":
            loc = st.tables.get((parts[2], parts[4]))
            if loc is None:
                return self._send(404, {"error": "no such table"})
            return self._send(200, {"metadata-location": loc})
        self._send(404, {"error": f"bad path {self.path}"})

    def do_POST(self):
        st, parts = self.state, self.path.strip("/").split("/")
        body = self._body()
        if parts[1:] == ["namespaces"]:
            ns = ".".join(body["namespace"])
            with st.lock:
                if ns in st.namespaces:
                    return self._send(409, {"error": "namespace exists"})
                st.namespaces[ns] = body.get("properties", {})
            return self._send(200, {"namespace": body["namespace"]})
        if len(parts) == 4 and parts[3] == "register":
            ns, name = parts[2], body["name"]
            with st.lock:
                if (ns, name) in st.tables:
                    return self._send(409, {"error": "table exists"})
                st.tables[(ns, name)] = body["metadata-location"]
            return self._send(200, {"metadata-location": body["metadata-location"]})
        if len(parts) == 5 and parts[3] == "tables":
            ns, name = parts[2], parts[4]
            want = None
            for r in body.get("requirements", []):
                if r.get("type") == "assert-metadata-location":
                    want = r.get("metadata-location")
            new = body["metadata-location"]
            with st.lock:  # the CAS the whole protocol exists to provide
                cur = st.tables.get((ns, name))
                if cur != want:
                    return self._send(
                        409,
                        {"error": f"stale base: current={cur!r} asserted={want!r}"},
                    )
                st.tables[(ns, name)] = new
            return self._send(200, {"metadata-location": new})
        self._send(404, {"error": f"bad path {self.path}"})

    def do_DELETE(self):
        st, parts = self.state, self.path.strip("/").split("/")
        if len(parts) == 5 and parts[3] == "tables":
            with st.lock:
                if st.tables.pop((parts[2], parts[4]), None) is None:
                    return self._send(404, {"error": "no such table"})
            return self._send(200, {})
        self._send(404, {"error": f"bad path {self.path}"})


@pytest.fixture()
def server():
    state = _State()
    handler = type("H", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_port}", state
    srv.shutdown()
    th.join(5)


def test_protocol_surface(server):
    url, _ = server
    c = RestCatalogClient(url)
    assert c.config() == {"defaults": {}, "overrides": {}}
    assert c.list_namespaces() == []
    c.create_namespace("lake")
    assert c.list_namespaces() == ["lake"]
    with pytest.raises(CommitConflict):
        c.create_namespace("lake")
    assert c.list_tables("lake") == []
    with pytest.raises(FileNotFoundError):
        c.load_table("lake", "nope")


def test_table_lifecycle_and_second_client_visibility(spark, server, tmp_path):
    url, _ = server
    cat = RestCatalog(spark, str(tmp_path / "wh"), RestCatalogClient(url), "lake")
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    t = cat.create_table("orders", df.schema)
    assert cat.list_tables() == ["orders"]
    t.append(df)
    # a SECOND client (fresh connection — another engine in docs/11
    # terms) resolves the pointer through the service and sees the data
    cat2 = RestCatalog(spark, str(tmp_path / "wh"), RestCatalogClient(url), "lake")
    t2 = cat2.load_table("orders")
    assert t2.toDF().count() == 100
    assert [r.v for r in t2.toDF().orderBy("id").limit(3).collect()] == [0, 2, 4]
    # snapshots/time travel work through the REST commit path
    t.append(df.selectExpr("id + 100 AS id", "id AS v"))
    t2.refresh()
    assert t2.toDF().count() == 200
    first = t2.meta.snapshots[0]
    assert t2.toDF(snapshot=t2.as_of(snapshot_id=first.snapshot_id)).count() == 100
    cat.drop_table("orders")
    assert cat.list_tables() == []


def test_concurrent_commit_cas_retry(spark, server, tmp_path):
    """Two writers on the SAME base: first CAS wins at the service, the
    second gets 409, and the inherited retry loop re-bases and merges —
    both appends land (append vs append always merges, docs/08:71-78)."""
    url, _ = server
    cat = RestCatalog(spark, str(tmp_path / "wh"), RestCatalogClient(url), "lake")
    df = spark.range(0, 50).selectExpr("id", "id AS v")
    cat.create_table("t", df.schema)
    a = cat.load_table("t")
    b = cat.load_table("t")  # same base version as a
    a.append(df)
    b.append(df.selectExpr("id + 50 AS id", "v"))  # stale base -> 409 -> retry
    assert cat.load_table("t").toDF().count() == 100
    snaps = cat.load_table("t").meta.snapshots
    assert len(snaps) == 2  # both commits present, linear history


def test_stale_base_without_retry_is_409(server, tmp_path):
    """Protocol-level: a raw commit against a stale previous location
    must 409 — the exact contract engines build their retry on."""
    url, _ = server
    c = RestCatalogClient(url)
    c.create_namespace("lake")
    c.register_table("lake", "t", "/meta/v1.json")
    c.commit_table("lake", "t", "/meta/v2.json", "/meta/v1.json")
    with pytest.raises(CommitConflict):
        c.commit_table("lake", "t", "/meta/v3.json", "/meta/v1.json")
    assert c.load_table("lake", "t")["metadata-location"] == "/meta/v2.json"


def test_threaded_concurrent_commits_through_service(spark, server, tmp_path):
    """True thread race: two RestTable handles append SIMULTANEOUSLY
    through the HTTP service.  Whatever interleaving occurs, the
    catalog CAS must serialize the commits: both appends land, history
    is linear, no rows lost (the REST twin of the local O_EXCL race in
    tests/test_table.py::test_concurrent_append_cas_merges)."""
    import threading

    url, _ = server
    cat = RestCatalog(spark, str(tmp_path / "wh"), RestCatalogClient(url), "lake")
    df = spark.range(0, 200).selectExpr("id", "id AS v")
    cat.create_table("race", df.schema)
    h1, h2 = cat.load_table("race"), cat.load_table("race")
    a = df.filter("id % 2 = 0")
    b = df.filter("id % 2 = 1")
    errs = []

    def w(handle, part):
        try:
            handle.append(part)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=w, args=(h1, a))
    t2 = threading.Thread(target=w, args=(h2, b))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    final = cat.load_table("race")
    assert final.toDF().count() == 200
    assert len(final.meta.snapshots) == 2
    # parent chain is linear: second snapshot's parent is the first
    s1, s2 = final.meta.snapshots
    assert s2.parent_snapshot_id == s1.snapshot_id


def test_orphan_sweep_collects_lost_race_metadata_docs(spark, server, tmp_path):
    """A commit attempt that loses the catalog CAS leaves its uniquely-
    named metadata doc behind; remove_orphan_files must collect docs
    older than the cutoff while keeping the CURRENT pointer doc —
    local-pointer version files are untouched."""
    import os
    import time

    from icepack.maintenance import remove_orphan_files

    url, _ = server
    cat = RestCatalog(spark, str(tmp_path / "wh"), RestCatalogClient(url), "lake")
    df = spark.range(0, 10).selectExpr("id", "id AS v")
    t = cat.create_table("orph", df.schema)
    t.append(df)
    # forge a lost-race doc: uniquely named, never referenced
    loser = os.path.join(t._mdir, "v2-deadbeefdeadbeefdeadbeefdeadbeef.metadata.json")
    with open(loser, "w") as f:
        f.write(t.meta.dumps())
    old = time.time() - 100_000
    os.utime(loser, (old, old))
    removed = remove_orphan_files(t, older_than_ms=int(time.time() * 1000) - 200_000_000)
    assert removed == []  # everything younger than a strict cutoff survives
    removed = remove_orphan_files(t)
    assert loser in removed and not os.path.exists(loser)
    assert os.path.exists(t._metadata_location)  # current pointer kept
    assert t.toDF().count() == 10  # table unharmed


def test_orphan_sweep_refreshes_stale_handle(spark, server, tmp_path):
    """A RestTable handle stale by more than the cutoff must NOT treat
    the catalog's CURRENT pointer doc as an orphan: remove_orphan_files
    refreshes the handle against the catalog first, so the sweep
    collects the handle's superseded doc — never the live one."""
    import os
    import time

    from icepack.maintenance import remove_orphan_files

    url, _ = server
    cat = RestCatalog(spark, str(tmp_path / "wh"), RestCatalogClient(url), "lake")
    df = spark.range(0, 10).selectExpr("id", "id AS v")
    stale = cat.create_table("staleorph", df.schema)
    stale.append(df)
    old_doc = stale._metadata_location
    # a SECOND handle advances the catalog pointer past the first
    fresh = cat.load_table("staleorph")
    fresh.append(spark.range(10, 20).selectExpr("id", "id AS v"))
    live_doc = fresh._metadata_location
    assert old_doc != live_doc
    # age every metadata doc past the cutoff, then sweep via the STALE
    # handle with a future cutoff — the worst case the advice describes
    for p in os.listdir(stale._mdir):
        full = os.path.join(stale._mdir, p)
        os.utime(full, (time.time() - 100_000, time.time() - 100_000))
    removed = remove_orphan_files(stale, older_than_ms=int(time.time() * 1000) + 10_000)
    assert os.path.exists(live_doc), "sweep deleted the catalog's CURRENT doc"
    assert old_doc in removed and not os.path.exists(old_doc)
    assert cat.load_table("staleorph").toDF().count() == 20


def test_sql_create_iceberg_table_from_rest_catalog(spark, server, tmp_path):
    """docs/04:77-93 end to end through the SQL surface: CREATE CATALOG
    INTEGRATION with a live CATALOG_URI, then the docs' columnless
    CREATE ICEBERG TABLE ... CATALOG_TABLE_NAME links the externally-
    cataloged table — after which it SELECTs and INSERTs like any local
    table, with writes committing through the service CAS."""
    from icepack.sql import IceSQL

    url, _ = server
    # seed a table in the external catalog (the "other engine")
    cat = RestCatalog(spark, str(tmp_path / "extwh"), RestCatalogClient(url), "ns")
    seed = spark.range(0, 40).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    cat.create_table("source_table", seed.schema).append(seed)

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql(f"""
        CREATE CATALOG INTEGRATION rest_live
          CATALOG_SOURCE = ICEBERG_REST
          TABLE_FORMAT = ICEBERG
          CATALOG_URI = '{url}'
          ENABLED = TRUE
    """)
    isql.sql("""
        CREATE ICEBERG TABLE my_table
          CATALOG = 'rest_live'
          CATALOG_TABLE_NAME = 'ns.source_table'
    """)
    n = isql.sql("SELECT COUNT(*) AS n FROM my_table").collect()[0].n
    assert n == 40
    isql.sql("INSERT INTO my_table VALUES (100, 0.5)")
    # the write went through the service: the ORIGINAL client sees it
    assert cat.load_table("source_table").toDF().count() == 41
    total = isql.sql("SELECT SUM(v) AS s FROM my_table").collect()[0].s
    assert total == sum(float(i) for i in range(40)) + 0.5


def test_sql_dml_on_rest_linked_table(spark, server, tmp_path):
    """DELETE/UPDATE through the SQL surface on a REST-linked table:
    every DML commit goes through the service CAS and is visible to
    the originating client, with the full snapshot history intact."""
    from icepack.sql import IceSQL

    url, _ = server
    cat = RestCatalog(spark, str(tmp_path / "ext"), RestCatalogClient(url), "ns")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id long, k string, v double"
    )
    cat.create_table("src", df.schema).append(df)
    isql = IceSQL(spark, str(tmp_path / "local"))
    isql.sql(
        f"CREATE CATALOG INTEGRATION rc CATALOG_SOURCE = ICEBERG_REST"
        f" CATALOG_URI = '{url}' ENABLED = TRUE"
    )
    isql.sql("CREATE ICEBERG TABLE lt CATALOG = 'rc' CATALOG_TABLE_NAME = 'ns.src'")
    isql.sql("DELETE FROM lt WHERE k = 'b'")
    isql.sql("UPDATE lt SET v = v * 10 WHERE id = 3")
    want = [(1, "a", 1.0), (3, "c", 30.0)]
    got = sorted((r.id, r.k, r.v) for r in isql.sql("SELECT * FROM lt").collect())
    assert got == want
    t = cat.load_table("src")
    assert sorted((r.id, r.k, r.v) for r in t.toDF().collect()) == want
    assert [s.operation for s in t.meta.snapshots] == ["append", "delete", "overwrite"]
