"""Iceberg REST catalog protocol client (SURVEY.md S5,
docs/04-catalog-systems.md:58-93).

Speaks the subset of the PUBLIC Apache Iceberg REST Catalog OpenAPI
surface that table lifecycle needs — config, namespaces, table
create/load/list/drop, and the commit endpoint whose conflict contract
(HTTP 409 on a stale base) is the network form of the optimistic CAS
every Iceberg catalog provides (docs/01:50-66: "atomic CAS commits").

Division of labor, exactly as the docs describe external catalogs
(docs/04:16-24): data and metadata FILES stay in storage (here the
local warehouse; in production an object store) and only the
*current-metadata pointer* lives in the catalog service.  So:

- :class:`RestCatalogClient` — transport-level client (stdlib urllib,
  injectable opener for tests/auth).  One method per endpoint, JSON in
  and out, 409 mapped to :class:`CommitConflict`.
- :class:`RestTable` — an :class:`~icepack.table.IceTable` whose commit
  CAS happens at the catalog instead of via the local POSIX O_EXCL
  pointer: each commit writes an immutable uniquely-named metadata
  document (``v<N>-<uuid>.metadata.json`` — losers of a race leave an
  orphan doc, collected by the normal orphan sweep), then swaps the
  catalog pointer conditioned on the previous metadata-location.  Every
  other operation (append/DML/maintenance/time travel) is inherited
  unchanged — the commit seam is the ONLY difference between a
  filesystem-cataloged and a REST-cataloged table.
- :class:`RestCatalog` — Catalog-shaped facade (create/load/list/drop)
  over the client.

The pytest loopback server (tests/test_restcat.py) implements the same
subset in-process over 127.0.0.1, which is what an offline sandbox can
verify: protocol fidelity, pointer CAS semantics, and conflict-retry
behavior under concurrent commits.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .metadata import IceSchema, TableMetadata
from .table import CommitConflict, IceTable


class RestCatalogClient:
    """Minimal Iceberg-REST-protocol client.

    ``transport`` is a callable ``(method, url, json_body|None) ->
    (status, parsed_json)``; the default uses urllib.  Auth headers /
    OAuth per the public spec would wrap the transport — injected, so
    offline tests and real deployments share the protocol code.
    """

    def __init__(self, base_url: str, transport=None, prefix: str = "v1"):
        self.base = base_url.rstrip("/")
        self.prefix = prefix
        self._transport = transport or self._urllib_transport

    @staticmethod
    def _urllib_transport(method: str, url: str, body: dict | None):
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            url,
            data=data,
            method=method,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                raw = resp.read()
                return resp.status, (json.loads(raw) if raw else {})
        except urllib.error.HTTPError as e:
            raw = e.read()
            try:
                payload = json.loads(raw) if raw else {}
            except json.JSONDecodeError:
                payload = {"error": raw.decode(errors="replace")}
            return e.code, payload

    def _call(self, method: str, path: str, body: dict | None = None) -> dict:
        status, payload = self._transport(
            method, f"{self.base}/{self.prefix}{path}", body
        )
        if status == 409:
            raise CommitConflict(payload.get("error", "commit conflict (409)"))
        if status == 404:
            raise FileNotFoundError(payload.get("error", f"not found: {path}"))
        if status >= 400:
            raise RuntimeError(f"catalog error {status} on {path}: {payload}")
        return payload

    # -- endpoints (public REST catalog spec subset) ------------------------

    def config(self) -> dict:
        return self._call("GET", "/config")

    def list_namespaces(self) -> list[str]:
        out = self._call("GET", "/namespaces")
        return [".".join(ns) for ns in out.get("namespaces", [])]

    def create_namespace(self, namespace: str, properties: dict | None = None) -> None:
        self._call(
            "POST",
            "/namespaces",
            {"namespace": namespace.split("."), "properties": properties or {}},
        )

    def list_tables(self, namespace: str) -> list[str]:
        out = self._call("GET", f"/namespaces/{namespace}/tables")
        return [i["name"] for i in out.get("identifiers", [])]

    def register_table(
        self, namespace: str, name: str, metadata_location: str
    ) -> dict:
        """Register an existing metadata document as a catalog table
        (the spec's ``register`` endpoint — adoption/migration path)."""
        return self._call(
            "POST",
            f"/namespaces/{namespace}/register",
            {"name": name, "metadata-location": metadata_location},
        )

    def load_table(self, namespace: str, name: str) -> dict:
        """→ {"metadata-location": ...}."""
        return self._call("GET", f"/namespaces/{namespace}/tables/{name}")

    def commit_table(
        self,
        namespace: str,
        name: str,
        new_metadata_location: str,
        previous_metadata_location: str | None,
    ) -> dict:
        """Pointer CAS: succeeds iff the catalog's current location ==
        ``previous_metadata_location`` (None = create). 409 otherwise —
        surfaced as CommitConflict so the table's retry loop re-bases,
        identical to the local-pointer conflict path."""
        return self._call(
            "POST",
            f"/namespaces/{namespace}/tables/{name}",
            {
                "requirements": [
                    {
                        "type": "assert-metadata-location",
                        "metadata-location": previous_metadata_location,
                    }
                ],
                "metadata-location": new_metadata_location,
            },
        )

    def drop_table(self, namespace: str, name: str) -> None:
        self._call("DELETE", f"/namespaces/{namespace}/tables/{name}")


class RestTable(IceTable):
    """IceTable committed through a REST catalog: same storage layout,
    pointer CAS at the service (docs/04:16-24 external-catalog mode).

    cf. docs/08-acid-transactions.md:52-78 — the conflict/retry loop in
    ``_commit_snapshot`` is inherited unchanged; only the "attempt the
    swap" primitive differs (HTTP 409 instead of FileExistsError)."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        meta: TableMetadata,
        client: RestCatalogClient,
        namespace: str,
        name: str,
        metadata_location: str | None = None,
    ):
        super().__init__(spark, location, meta)
        self.client = client
        self.namespace = namespace
        self.name = name
        self._metadata_location = metadata_location

    # -- commit seam --------------------------------------------------------

    def _write_version(self, version: int, meta: TableMetadata) -> None:
        meta.last_updated_ms = int(time.time() * 1000)
        # immutable, uniquely-named document: concurrent committers never
        # collide on the file, the catalog CAS picks the winner, and the
        # loser's document becomes an orphan for the maintenance sweep
        doc = os.path.join(
            self._mdir, f"v{version}-{uuid.uuid4().hex}.metadata.json"
        )
        with open(doc, "x") as f:
            f.write(meta.dumps())
        self.client.commit_table(  # raises CommitConflict on 409
            self.namespace, self.name, doc, self._metadata_location
        )
        self._metadata_location = doc
        self._version = version
        self.meta = meta

    def refresh(self) -> "RestTable":
        loc = self.client.load_table(self.namespace, self.name)[
            "metadata-location"
        ]
        with open(loc) as f:
            self.meta = TableMetadata.loads(f.read())
        self._metadata_location = loc
        base = os.path.basename(loc)
        self._version = int(base.split("-", 1)[0][1:])
        return self


class RestCatalog:
    """Catalog facade over the REST protocol — the drop-in counterpart
    of :class:`icepack.catalog.Catalog` for service-cataloged tables.
    ``warehouse`` is where table storage lives (object store in
    production); the service holds only names and pointers."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        client: RestCatalogClient,
        namespace: str = "default",
    ):
        self.spark = spark
        self.warehouse = os.path.abspath(warehouse)
        self.client = client
        self.namespace = namespace
        if namespace not in client.list_namespaces():
            client.create_namespace(namespace)

    def _loc(self, name: str) -> str:
        return os.path.join(self.warehouse, *self.namespace.split("."), name)

    def create_table(
        self,
        name: str,
        schema: "T.StructType | IceSchema",
        partition_by: list[tuple[str, str]] | None = None,
        properties: dict | None = None,
    ) -> RestTable:
        # write storage-side metadata exactly like a filesystem create,
        # then hand the pointer to the service (create = CAS from None)
        local = IceTable.create(
            self.spark, self._loc(name), schema, partition_by, properties
        )
        t = RestTable(
            self.spark,
            local.location,
            local.meta,
            self.client,
            self.namespace,
            name,
        )
        doc = os.path.join(
            t._mdir, f"v1-{uuid.uuid4().hex}.metadata.json"
        )
        with open(doc, "x") as f:
            f.write(local.meta.dumps())
        self.client.commit_table(self.namespace, name, doc, None)
        t._metadata_location = doc
        t._version = 1
        return t

    def load_table(self, name: str) -> RestTable:
        # the metadata DOCUMENT is the source of truth for where the
        # table's storage lives (its `location` field) — a client must
        # not assume the table sits under its own warehouse root (a
        # linked table created by another engine usually doesn't)
        loc = self.client.load_table(self.namespace, name)["metadata-location"]
        with open(loc) as f:
            meta = TableMetadata.loads(f.read())
        t = RestTable(
            self.spark,
            meta.location,
            meta,
            self.client,
            self.namespace,
            name,
            metadata_location=loc,
        )
        t._version = int(os.path.basename(loc).split("-", 1)[0][1:])
        return t

    def table_exists(self, name: str) -> bool:
        return name in self.client.list_tables(self.namespace)

    def list_tables(self) -> list[str]:
        return sorted(self.client.list_tables(self.namespace))

    def drop_table(self, name: str) -> None:
        self.client.drop_table(self.namespace, name)


def loopback_catalog_server():
    """Start an in-process loopback HTTP server speaking the same REST
    subset the client does, on an ephemeral 127.0.0.1 port.  Returns
    ``(base_url, shutdown)``.

    This is the offline stand-in for a real catalog service: it holds
    {(namespace, table) -> metadata-location} in memory behind a lock
    and implements the CAS commit contract (409 on a stale base).  Used
    by the ice32 driver query so external-catalog mode is exercised
    end to end in any environment; tests/test_restcat.py pins the
    protocol against an independent second implementation."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    namespaces: dict[str, dict] = {}
    tables: dict[tuple[str, str], str] = {}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: N802
            pass

        def _send(self, status, payload=None):
            body = json.dumps(payload or {}).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n)) if n else {}

        def do_GET(self):  # noqa: N802
            parts = self.path.strip("/").split("/")
            if parts[1:] == ["config"]:
                return self._send(200, {"defaults": {}, "overrides": {}})
            if parts[1:] == ["namespaces"]:
                return self._send(
                    200, {"namespaces": [n.split(".") for n in namespaces]}
                )
            if len(parts) == 4 and parts[3] == "tables":
                ids = [
                    {"namespace": parts[2].split("."), "name": t}
                    for (n, t) in tables
                    if n == parts[2]
                ]
                return self._send(200, {"identifiers": ids})
            if len(parts) == 5 and parts[3] == "tables":
                loc = tables.get((parts[2], parts[4]))
                if loc is None:
                    return self._send(404, {"error": "no such table"})
                return self._send(200, {"metadata-location": loc})
            self._send(404, {"error": self.path})

        def do_POST(self):  # noqa: N802
            parts = self.path.strip("/").split("/")
            body = self._body()
            if parts[1:] == ["namespaces"]:
                ns = ".".join(body["namespace"])
                with lock:
                    if ns in namespaces:
                        return self._send(409, {"error": "namespace exists"})
                    namespaces[ns] = body.get("properties", {})
                return self._send(200, {"namespace": body["namespace"]})
            if len(parts) == 5 and parts[3] == "tables":
                key = (parts[2], parts[4])
                want = None
                for r in body.get("requirements", []):
                    if r.get("type") == "assert-metadata-location":
                        want = r.get("metadata-location")
                with lock:
                    if tables.get(key) != want:
                        return self._send(409, {"error": "stale base"})
                    tables[key] = body["metadata-location"]
                return self._send(200, {"metadata-location": body["metadata-location"]})
            self._send(404, {"error": self.path})

        def do_DELETE(self):  # noqa: N802
            parts = self.path.strip("/").split("/")
            if len(parts) == 5 and parts[3] == "tables":
                with lock:
                    if tables.pop((parts[2], parts[4]), None) is None:
                        return self._send(404, {"error": "no such table"})
                return self._send(200, {})
            self._send(404, {"error": self.path})

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()

    def shutdown():
        srv.shutdown()
        th.join(5)

    return f"http://127.0.0.1:{srv.server_port}", shutdown
