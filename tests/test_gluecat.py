"""Glue Data Catalog protocol (SURVEY.md S5, docs/04-catalog-systems.md:
58-76): client + table commit seam against the in-process loopback
speaking the AWS JSON-1.1 dialect — database/table lifecycle, the
Iceberg-on-Glue pointer convention (Parameters.metadata_location), and
UpdateTable's VersionId optimistic lock with its
ConcurrentModificationException contract.
"""

from __future__ import annotations

import threading

import pytest

from icepack.gluecat import (
    GlueCatalog,
    GlueCatalogClient,
    loopback_glue_server,
)
from icepack.table import CommitConflict


@pytest.fixture()
def server():
    endpoint, shutdown = loopback_glue_server()
    yield endpoint
    shutdown()


def test_protocol_surface(server):
    c = GlueCatalogClient(server)
    assert c.get_databases() == []
    c.create_database("lake")
    assert c.get_databases() == ["lake"]
    with pytest.raises(FileExistsError):
        c.create_database("lake")
    assert c.get_tables("lake") == []
    with pytest.raises(FileNotFoundError):
        c.get_table("lake", "nope")


def test_version_id_optimistic_lock(server):
    """The raw UpdateTable contract engines build their retry on: an
    update carrying a stale VersionId must fail with
    ConcurrentModificationException (→ CommitConflict)."""
    c = GlueCatalogClient(server)
    c.create_database("lake")
    ti = {
        "Name": "t",
        "TableType": "EXTERNAL_TABLE",
        "Parameters": {"table_type": "ICEBERG", "metadata_location": "/m/v1.json"},
    }
    c.create_table("lake", ti)
    v1 = c.get_table("lake", "t")["VersionId"]
    ti2 = {**ti, "Parameters": {**ti["Parameters"], "metadata_location": "/m/v2.json"}}
    c.update_table("lake", ti2, v1)  # ok: version matches
    with pytest.raises(CommitConflict):
        c.update_table("lake", ti2, v1)  # stale VersionId
    t = c.get_table("lake", "t")
    assert t["Parameters"]["metadata_location"] == "/m/v2.json"
    assert t["VersionId"] != v1


def test_table_lifecycle_and_second_client_visibility(spark, server, tmp_path):
    cat = GlueCatalog(spark, str(tmp_path / "wh"), GlueCatalogClient(server), "lake")
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    t = cat.create_table("orders", df.schema)
    assert cat.list_tables() == ["orders"]
    t.append(df)
    # a second client (fresh connection — another engine) resolves the
    # pointer through the service and sees the data
    cat2 = GlueCatalog(spark, str(tmp_path / "wh"), GlueCatalogClient(server), "lake")
    t2 = cat2.load_table("orders")
    assert t2.toDF().count() == 100
    t.append(df.selectExpr("id + 100 AS id", "id AS v"))
    t2.refresh()
    assert t2.toDF().count() == 200
    first = t2.meta.snapshots[0]
    assert t2.toDF(snapshot=t2.as_of(snapshot_id=first.snapshot_id)).count() == 100
    cat.drop_table("orders")
    assert cat.list_tables() == []


def test_threaded_concurrent_commits_through_service(spark, server, tmp_path):
    """Two GlueTable handles append simultaneously; the VersionId lock
    serializes the pointer swaps: both appends land, linear history."""
    cat = GlueCatalog(spark, str(tmp_path / "wh"), GlueCatalogClient(server), "lake")
    df = spark.range(0, 200).selectExpr("id", "id AS v")
    cat.create_table("race", df.schema)
    h1, h2 = cat.load_table("race"), cat.load_table("race")
    errs = []

    def w(handle, part):
        try:
            handle.append(part)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=w, args=(h1, df.filter("id % 2 = 0")))
    t2 = threading.Thread(target=w, args=(h2, df.filter("id % 2 = 1")))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    final = cat.load_table("race")
    assert final.toDF().count() == 200
    s1, s2 = final.meta.snapshots
    assert s2.parent_snapshot_id == s1.snapshot_id


def test_sql_linked_glue_table(spark, server, tmp_path):
    """docs/04:58-76 end to end through the SQL surface: CREATE CATALOG
    INTEGRATION with CATALOG_SOURCE = GLUE (endpoint override), the
    columnless CREATE ICEBERG TABLE ... CATALOG_TABLE_NAME link, then
    SELECT and DML committing through the Glue version lock."""
    from icepack.sql import IceSQL

    ext = GlueCatalog(spark, str(tmp_path / "extwh"), GlueCatalogClient(server), "gdb")
    seed = spark.range(0, 40).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    ext.create_table("source_table", seed.schema).append(seed)

    isql = IceSQL(spark, str(tmp_path / "wh"))
    isql.sql(
        "CREATE CATALOG INTEGRATION glue_catalog"
        "  CATALOG_SOURCE = GLUE"
        "  CATALOG_NAMESPACE = 'gdb'"
        "  TABLE_FORMAT = ICEBERG"
        "  GLUE_AWS_ROLE_ARN = 'arn:aws:iam::123456789:role/glue-role'"
        "  GLUE_CATALOG_ID = '123456789'"
        f"  GLUE_ENDPOINT = '{server}'"
        "  ENABLED = TRUE"
    )
    isql.sql(
        "CREATE ICEBERG TABLE my_table CATALOG = 'glue_catalog'"
        " CATALOG_TABLE_NAME = 'gdb.source_table'"
    )
    assert isql.sql("SELECT COUNT(*) AS n FROM my_table").collect()[0].n == 40
    isql.sql("DELETE FROM my_table WHERE id >= 30")
    # the delete committed through the service: a fresh external client sees it
    assert ext.load_table("source_table").toDF().count() == 30


def test_sigv4_transport_signs_and_server_verifies():
    """The production transport factory signs JSON-1.1 Glue calls; a
    loopback server recomputes each SigV4 signature with the shared
    secret and refuses mismatches — composing the signing leg onto the
    already-proven protocol client (r5)."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import unquote, urlparse

    from icepack.gluecat import GlueCatalogClient, sigv4_transport
    from icepack.sigv4 import sign

    ACCESS, SECRET, REGION = "AKIDGLUE", "glue/secret+key", "eu-west-1"
    seen = {"ok": 0, "bad": 0}

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            auth = self.headers.get("Authorization", "")
            signed_names = auth.split("SignedHeaders=")[1].split(",")[0]
            hdrs = {
                n: self.headers.get(n, "")
                for n in signed_names.split(";")
                if n not in ("x-amz-date", "x-amz-content-sha256", "x-amz-security-token")
            }
            expect = sign(
                "POST", unquote(urlparse(self.path).path), {}, hdrs, body,
                access_key=ACCESS, secret_key=SECRET, region=REGION,
                service="glue", amz_date=self.headers.get("x-amz-date"),
            )["Authorization"]
            if expect != auth:
                seen["bad"] += 1
                self.send_response(403); self.end_headers(); return
            seen["ok"] += 1
            out = _json.dumps({"DatabaseList": []}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        ep = f"http://127.0.0.1:{srv.server_port}"
        client = GlueCatalogClient(
            ep,
            transport=sigv4_transport(
                ep, region=REGION, access_key=ACCESS, secret_key=SECRET
            ),
        )
        status, payload = client._transport("GetDatabases", {})
        assert status == 200 and payload == {"DatabaseList": []}
        assert seen == {"ok": 1, "bad": 0}
        # forged credentials are refused by the server
        bad = sigv4_transport(ep, region=REGION, access_key=ACCESS, secret_key="wrong")
        status, _ = bad("GetDatabases", {})
        assert status == 403
        assert seen["bad"] == 1
    finally:
        srv.shutdown()
