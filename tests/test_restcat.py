"""REST catalog protocol (SURVEY.md S5): client + table commit seam
against an in-process loopback server implementing the same public
Iceberg-REST subset — namespaces, table lifecycle (createTable /
loadTable / updateTable), and the spec's CommitTableRequest contract:
UpdateRequirements validated against current metadata (409 on any
failed assert), MetadataUpdate actions applied by the SERVER, which
writes each new metadata document and answers with
{metadata-location, metadata}.

The server below is a test double for a real REST service and is
deliberately INDEPENDENT of icepack's metadata classes: it validates
requirements and applies updates directly on the raw metadata JSON.
What these tests pin is everything an offline sandbox CAN verify about
external-catalog mode: wire shapes, requirement semantics,
conflict-retry through the inherited _commit_snapshot loop, and that a
second client (another "engine", docs/11-multi-engine-compatibility.md:
16-29) sees exactly the committed state.
"""

from __future__ import annotations

import copy
import json
import os
import threading
import time
import uuid as _uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from icepack.restcat import RestCatalog, RestCatalogClient
from icepack.table import CommitConflict


class _State:
    def __init__(self):
        self.lock = threading.Lock()
        self.namespaces: dict[str, dict] = {}
        self.tables: dict[tuple[str, str], str] = {}  # -> metadata-location


def _check_reqs_json(doc: dict | None, reqs: list[dict]) -> str | None:
    """Requirement validation straight off the metadata JSON — a second
    implementation, independent of icepack.restcat.check_requirements."""
    for r in reqs:
        t = r.get("type")
        if t == "assert-create":
            if doc is not None:
                return "table exists"
        elif doc is None:
            return "no such table"
        elif t == "assert-table-uuid":
            if doc["table-uuid"] != r.get("uuid"):
                return "uuid mismatch"
        elif t == "assert-ref-snapshot-id":
            name = r.get("ref")
            if name == "main":
                cur = doc.get("current-snapshot-id")
            else:
                cur = (doc.get("refs", {}).get(name) or {}).get("snapshot-id")
            if cur != r.get("snapshot-id"):
                return f"ref {name!r} moved"
        elif t == "assert-current-schema-id":
            if doc["current-schema-id"] != r.get("current-schema-id"):
                return "current schema changed"
        elif t == "assert-last-assigned-field-id":
            if doc["last-column-id"] != r.get("last-assigned-field-id"):
                return "last column changed"
        elif t == "assert-default-spec-id":
            if doc["default-spec-id"] != r.get("default-spec-id"):
                return "default spec changed"
        elif t == "assert-default-sort-order-id":
            if doc.get("default-sort-order-id", 0) != r.get("default-sort-order-id"):
                return "default sort order changed"
        else:
            return f"unsupported requirement {t!r}"
    return None


def _apply_updates_json(doc: dict, updates: list[dict]) -> dict:
    """MetadataUpdate application on raw JSON."""
    d = copy.deepcopy(doc)
    for u in updates:
        a = u.get("action")
        if a == "set-location":
            d["location"] = u["location"]
        elif a == "add-schema":
            d["schemas"].append(u["schema"])
            d["last-column-id"] = max(d["last-column-id"], u.get("last-column-id", 0))
        elif a == "set-current-schema":
            d["current-schema-id"] = u["schema-id"]
        elif a == "add-spec":
            d["partition-specs"].append(u["spec"])
        elif a == "set-default-spec":
            d["default-spec-id"] = u["spec-id"]
        elif a == "add-sort-order":
            d.setdefault("sort-orders", []).append(u["sort-order"])
        elif a == "set-default-sort-order":
            d["default-sort-order-id"] = u["sort-order-id"]
        elif a == "add-snapshot":
            d["snapshots"].append(u["snapshot"])
            d["last-sequence-number"] = max(
                d.get("last-sequence-number", 0),
                u["snapshot"].get("sequence-number", 0),
            )
        elif a == "remove-snapshots":
            gone = set(u["snapshot-ids"])
            d["snapshots"] = [
                s for s in d["snapshots"] if s["snapshot-id"] not in gone
            ]
        elif a == "set-snapshot-ref":
            if u["ref-name"] == "main":
                d["current-snapshot-id"] = u["snapshot-id"]
            else:
                d.setdefault("refs", {})[u["ref-name"]] = {
                    "snapshot-id": u["snapshot-id"],
                    "type": u.get("type", "branch"),
                }
        elif a == "remove-snapshot-ref":
            if u["ref-name"] == "main":
                d["current-snapshot-id"] = None
            else:
                d.get("refs", {}).pop(u["ref-name"], None)
        elif a == "set-properties":
            d.setdefault("properties", {}).update(u["updates"])
        elif a == "remove-properties":
            for k in u["removals"]:
                d.get("properties", {}).pop(k, None)
        else:
            raise ValueError(f"unsupported action {a!r}")
    return d


def _new_doc_json(body: dict) -> dict:
    """Initial metadata JSON for a CreateTableRequest."""
    schema = body["schema"]
    spec = body.get("partition-spec") or {"spec-id": 0, "fields": []}
    return {
        "format-version": 2,
        "table-uuid": str(_uuid.uuid4()),
        "location": body["location"],
        "last-column-id": max([f["id"] for f in schema.get("fields", [])] + [0]),
        "last-sequence-number": 0,
        "last-updated-ms": int(time.time() * 1000),
        "schemas": [schema],
        "current-schema-id": schema.get("schema-id", 0),
        "partition-specs": [spec],
        "default-spec-id": spec.get("spec-id", 0),
        "snapshots": [],
        "current-snapshot-id": None,
        "properties": body.get("properties", {}),
        "refs": {},
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
    }


def _write_doc_json(doc: dict, version: int) -> str:
    mdir = os.path.join(doc["location"], "metadata")
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"v{version}-{_uuid.uuid4().hex}.metadata.json")
    with open(path, "x") as f:
        json.dump(doc, f)
    return path


def _doc_version(loc: str) -> int:
    try:
        return int(os.path.basename(loc).split("-", 1)[0].lstrip("v"))
    except ValueError:
        return 0


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
            with open(loc) as f:
                doc = json.load(f)
            return self._send(200, {"metadata-location": loc, "metadata": doc})
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
        if len(parts) == 4 and parts[3] == "tables":
            # createTable: SERVER builds + persists the v1 document
            ns, name = parts[2], body["name"]
            with st.lock:
                if (ns, name) in st.tables:
                    return self._send(409, {"error": "table exists"})
                doc = _new_doc_json(body)
                loc = _write_doc_json(doc, 1)
                st.tables[(ns, name)] = loc
            return self._send(200, {"metadata-location": loc, "metadata": doc})
        if len(parts) == 5 and parts[3] == "tables":
            # updateTable: CommitTableRequest — validate, apply, persist
            ns, name = parts[2], parts[4]
            with st.lock:  # the CAS the whole protocol exists to provide
                cur_loc = st.tables.get((ns, name))
                cur = None
                if cur_loc is not None:
                    with open(cur_loc) as f:
                        cur = json.load(f)
                err = _check_reqs_json(cur, body.get("requirements", []))
                if err is not None:
                    return self._send(409, {"error": err})
                if cur is None:
                    return self._send(404, {"error": "no such table"})
                try:
                    new = _apply_updates_json(cur, body.get("updates", []))
                except ValueError as e:
                    return self._send(400, {"error": str(e)})
                new["last-updated-ms"] = int(time.time() * 1000)
                loc = _write_doc_json(new, _doc_version(cur_loc) + 1)
                st.tables[(ns, name)] = loc
            return self._send(200, {"metadata-location": loc, "metadata": new})
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


def test_failed_requirement_is_409(server, tmp_path):
    """Protocol-level CommitTableRequest contract: a commit whose
    UpdateRequirement does not hold against current metadata must 409 —
    the exact contract engines build their retry on — and a passing
    commit returns the server-written {metadata-location, metadata}."""
    url, _ = server
    c = RestCatalogClient(url)
    c.create_namespace("lake")
    schema = {
        "schema-id": 0,
        "fields": [{"id": 1, "name": "id", "type": "long", "required": True}],
    }
    created = c.create_table("lake", "t", str(tmp_path / "t"), schema)
    meta = created["metadata"]
    assert meta["table-uuid"] and meta["current-snapshot-id"] is None
    assert os.path.exists(created["metadata-location"])  # server persisted it
    ok = c.commit_table(
        "lake",
        "t",
        [
            {"type": "assert-table-uuid", "uuid": meta["table-uuid"]},
            {"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": None},
        ],
        [{"action": "set-properties", "updates": {"owner": "etl"}}],
    )
    assert ok["metadata"]["properties"]["owner"] == "etl"
    assert ok["metadata-location"] != created["metadata-location"]
    # requirement that no longer holds -> 409
    with pytest.raises(CommitConflict):
        c.commit_table(
            "lake",
            "t",
            [{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 12345}],
            [{"action": "set-properties", "updates": {"owner": "hacker"}}],
        )
    with pytest.raises(CommitConflict):
        c.commit_table(
            "lake",
            "t",
            [{"type": "assert-table-uuid", "uuid": "not-the-uuid"}],
            [],
        )
    assert c.load_table("lake", "t")["metadata-location"] == ok["metadata-location"]


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


def test_metadata_updates_round_trip_through_service(spark, server, tmp_path):
    """Every MetadataUpdate family the diff engine emits survives the
    server applying it to ITS copy of the metadata: schema evolution
    (add-schema/set-current-schema), named refs (set-snapshot-ref /
    remove-snapshot-ref), snapshot expiry (remove-snapshots), and
    properties — the client adopts the server's result each commit, so
    any application drift would surface as data loss here."""
    url, _ = server
    cat = RestCatalog(spark, str(tmp_path / "wh"), RestCatalogClient(url), "lake")
    df = spark.range(0, 30).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    t = cat.create_table("rt", df.schema)
    t.append(df)
    t.add_column("note", "string")  # add-schema + set-current-schema
    assert [f.name for f in t.meta.schema.fields] == ["id", "v", "note"]
    t.append(
        spark.range(30, 40).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v", "CAST('x' AS STRING) AS note"
        )
    )
    t.create_tag("before-expire", t.meta.current_snapshot_id)  # set-snapshot-ref
    t.set_properties(retention="long")  # set-properties
    first = t.meta.snapshots[0].snapshot_id
    t.expire_snapshots(older_than_ms=int(time.time() * 1000) + 10_000)
    # a fresh second client sees the full composite state via the service
    t2 = RestCatalog(spark, str(tmp_path / "wh"), RestCatalogClient(url), "lake").load_table("rt")
    assert t2.toDF().count() == 40
    assert [f.name for f in t2.meta.schema.fields] == ["id", "v", "note"]
    assert t2.meta.properties["retention"] == "long"
    assert "before-expire" in t2.meta.refs
    assert t2.meta.snapshot_by_id(first) is None  # remove-snapshots applied
    t.drop_ref("before-expire")  # remove-snapshot-ref
    t2.refresh()
    assert "before-expire" not in t2.meta.refs


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
