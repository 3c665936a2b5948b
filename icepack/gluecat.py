"""AWS Glue Data Catalog protocol client (SURVEY.md S5,
docs/04-catalog-systems.md:58-76).

Speaks the subset of the PUBLIC AWS Glue Data Catalog API that Iceberg
table lifecycle needs, in Glue's actual wire dialect (AWS JSON 1.1:
every call is ``POST /`` with an ``X-Amz-Target: AWSGlue.<Operation>``
header and a JSON body; errors come back as
``{"__type": "...Exception", "Message": ...}``):

- ``GetDatabases`` / ``CreateDatabase`` — namespace lifecycle.
- ``GetTable`` / ``GetTables`` / ``CreateTable`` / ``DeleteTable`` —
  table lifecycle.  Following the public Iceberg-on-Glue convention, a
  Glue table entry is just a POINTER: ``Table.Parameters`` carries
  ``table_type=ICEBERG``, ``metadata_location`` and
  ``previous_metadata_location``; the metadata documents themselves
  live in storage and are written by the ENGINE (unlike the REST
  catalog protocol, where the service writes them — this difference is
  why :class:`GlueTable` keeps the client-side document write).
- ``UpdateTable`` with ``VersionId`` — Glue's optimistic concurrency:
  the update succeeds only if the table's version has not moved since
  it was read; otherwise the service answers
  ``ConcurrentModificationException``, surfaced here as
  :class:`CommitConflict` so the inherited commit retry loop re-bases,
  exactly like the local-O_EXCL and REST-409 conflict paths.

Production Glue additionally needs SigV4 request signing and an AWS
endpoint; both live in the injectable ``transport`` (the default uses
stdlib urllib against an explicit endpoint, which is how the offline
loopback server and tests drive the same protocol code).  The SQL
surface reaches this module through CREATE CATALOG INTEGRATION ...
CATALOG_SOURCE = GLUE with a ``GLUE_ENDPOINT`` override — the AWS
SDK's standard endpoint-override escape hatch — since the sandbox has
no network route to real AWS.
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
from .table import CommitConflict, IceTable, build_partition_spec


class GlueCatalogClient:
    """Minimal Glue Data Catalog client (AWS JSON 1.1 dialect).

    ``transport`` is ``(target, json_body) -> (status, parsed_json)``;
    the default POSTs to ``endpoint`` with the ``X-Amz-Target`` header.
    SigV4 signing in production wraps the transport — injected, so
    offline tests and real deployments share the protocol code.
    """

    def __init__(self, endpoint: str, transport=None, catalog_id: str | None = None):
        self.endpoint = endpoint.rstrip("/")
        self.catalog_id = catalog_id
        self._transport = transport or self._urllib_transport

    def _urllib_transport(self, target: str, body: dict):
        req = urllib.request.Request(
            self.endpoint + "/",
            data=json.dumps(body).encode(),
            method="POST",
            headers={
                "Content-Type": "application/x-amz-json-1.1",
                "X-Amz-Target": f"AWSGlue.{target}",
            },
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
                payload = {"__type": "InternalServiceException", "Message": raw.decode(errors="replace")}
            return e.code, payload

    def _call(self, target: str, body: dict) -> dict:
        if self.catalog_id:
            body = {"CatalogId": self.catalog_id, **body}
        status, payload = self._transport(target, body)
        if status < 400:
            return payload
        etype = str(payload.get("__type", "")).rsplit("#", 1)[-1]
        msg = payload.get("Message", etype)
        if etype == "ConcurrentModificationException":
            raise CommitConflict(msg)
        if etype == "EntityNotFoundException":
            raise FileNotFoundError(msg)
        if etype == "AlreadyExistsException":
            raise FileExistsError(msg)
        raise RuntimeError(f"glue error {status} {etype}: {msg}")

    # -- operations (public Glue API subset) --------------------------------

    def get_databases(self) -> list[str]:
        out = self._call("GetDatabases", {})
        return [d["Name"] for d in out.get("DatabaseList", [])]

    def create_database(self, name: str) -> None:
        self._call("CreateDatabase", {"DatabaseInput": {"Name": name}})

    def get_tables(self, database: str) -> list[str]:
        out = self._call("GetTables", {"DatabaseName": database})
        return [t["Name"] for t in out.get("TableList", [])]

    def get_table(self, database: str, name: str) -> dict:
        """→ the Glue ``Table`` structure (Parameters carry the Iceberg
        pointer; VersionId feeds UpdateTable's optimistic lock)."""
        return self._call("GetTable", {"DatabaseName": database, "Name": name})["Table"]

    def create_table(self, database: str, table_input: dict) -> None:
        self._call(
            "CreateTable", {"DatabaseName": database, "TableInput": table_input}
        )

    def update_table(
        self, database: str, table_input: dict, version_id: str
    ) -> None:
        """Optimistic-lock pointer swap: fails with
        ConcurrentModificationException (→ CommitConflict) when the
        table's version moved past ``version_id``."""
        self._call(
            "UpdateTable",
            {
                "DatabaseName": database,
                "TableInput": table_input,
                "VersionId": version_id,
            },
        )

    def delete_table(self, database: str, name: str) -> None:
        self._call("DeleteTable", {"DatabaseName": database, "Name": name})


def _iceberg_table_input(name: str, metadata_location: str, previous: str | None) -> dict:
    params = {
        "table_type": "ICEBERG",
        "metadata_location": metadata_location,
    }
    if previous:
        params["previous_metadata_location"] = previous
    return {"Name": name, "TableType": "EXTERNAL_TABLE", "Parameters": params}


class GlueTable(IceTable):
    """IceTable committed through the Glue catalog: the engine writes
    each immutable, uniquely-named metadata document to storage (Glue
    never writes metadata — it holds only the pointer), then swaps the
    ``metadata_location`` parameter under Glue's VersionId optimistic
    lock.  Losers of a race leave an orphan document for the normal
    maintenance sweep, identical to the REST table's behavior."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        meta: TableMetadata,
        client: GlueCatalogClient,
        database: str,
        name: str,
        metadata_location: str | None = None,
        version_id: str | None = None,
        store=None,
    ):
        super().__init__(spark, location, meta, store=store)
        self.client = client
        self.database = database
        self.name = name
        self._metadata_location = metadata_location
        self._glue_version_id = version_id
        if metadata_location:
            base = os.path.basename(metadata_location)
            try:
                self._version = int(base.split("-", 1)[0].lstrip("v"))
            except ValueError:
                self._version = 0

    def _write_version(self, version: int, meta: TableMetadata) -> None:
        meta.last_updated_ms = int(time.time() * 1000)
        doc = self.store.join(
            self._mdir, f"v{version}-{uuid.uuid4().hex}.metadata.json"
        )
        self.store.create_exclusive(doc, meta.dumps())
        self.client.update_table(  # raises CommitConflict on version race
            self.database,
            _iceberg_table_input(self.name, doc, self._metadata_location),
            self._glue_version_id,
        )
        entry = self.client.get_table(self.database, self.name)
        self._glue_version_id = entry["VersionId"]
        self._metadata_location = doc
        self._version = version
        self.meta = meta

    def refresh(self) -> "GlueTable":
        entry = self.client.get_table(self.database, self.name)
        loc = entry["Parameters"]["metadata_location"]
        self.meta = TableMetadata.loads(self.store.read_text(loc))
        self._metadata_location = loc
        self._glue_version_id = entry["VersionId"]
        base = os.path.basename(loc)
        try:
            self._version = int(base.split("-", 1)[0].lstrip("v"))
        except ValueError:
            self._version = 0
        return self


class GlueCatalog:
    """Catalog facade over the Glue protocol — the CATALOG_SOURCE=GLUE
    counterpart of :class:`icepack.restcat.RestCatalog`."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        client: GlueCatalogClient,
        database: str = "default",
        store=None,
    ):
        from .storage import store_for

        self.store = store_for(warehouse, store)
        self.spark = spark
        self.warehouse = self.store.canonical(warehouse)
        self.client = client
        self.database = database
        if database not in client.get_databases():
            client.create_database(database)

    def _loc(self, name: str) -> str:
        return os.path.join(self.warehouse, self.database, name)

    def create_table(
        self,
        name: str,
        schema: "T.StructType | IceSchema",
        partition_by: list[tuple[str, str]] | None = None,
        properties: dict | None = None,
    ) -> GlueTable:
        ice_schema = (
            schema if isinstance(schema, IceSchema) else IceSchema.from_struct(schema)
        )
        spec = build_partition_spec(ice_schema, partition_by)
        location = self._loc(name)
        meta = TableMetadata.new(location, ice_schema, spec, properties)
        mdir = self.store.join(location, "metadata")
        self.store.mkdirs(mdir)
        doc = self.store.join(mdir, f"v1-{uuid.uuid4().hex}.metadata.json")
        self.store.create_exclusive(doc, meta.dumps())
        self.client.create_table(
            self.database, _iceberg_table_input(name, doc, None)
        )
        entry = self.client.get_table(self.database, name)
        return GlueTable(
            self.spark,
            location,
            meta,
            self.client,
            self.database,
            name,
            metadata_location=doc,
            version_id=entry["VersionId"],
            store=self.store,
        )

    def load_table(self, name: str) -> GlueTable:
        entry = self.client.get_table(self.database, name)
        params = entry.get("Parameters", {})
        if str(params.get("table_type", "")).upper() != "ICEBERG":
            raise ValueError(f"glue table {name!r} is not an Iceberg table")
        loc = params["metadata_location"]
        meta = TableMetadata.loads(self.store.read_text(loc))
        t = GlueTable(
            self.spark,
            meta.location,
            meta,
            self.client,
            self.database,
            name,
            metadata_location=loc,
            version_id=entry["VersionId"],
            store=self.store,
        )
        return t

    def table_exists(self, name: str) -> bool:
        return name in self.client.get_tables(self.database)

    def list_tables(self) -> list[str]:
        return sorted(self.client.get_tables(self.database))

    def drop_table(self, name: str) -> None:
        self.client.delete_table(self.database, name)


def loopback_glue_server():
    """In-process loopback speaking the same Glue JSON-1.1 subset on an
    ephemeral 127.0.0.1 port; returns ``(endpoint, shutdown)``.

    The offline stand-in for the AWS service: databases and table
    entries (Parameters + monotonically increasing VersionId) behind a
    lock, with UpdateTable enforcing the VersionId optimistic lock —
    what an offline sandbox can verify is protocol shape and the
    conflict contract; real AWS additionally needs SigV4 in the
    transport."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    databases: dict[str, dict] = {}
    tables: dict[tuple[str, str], dict] = {}  # -> Glue Table structure
    lock = threading.Lock()

    def _err(etype: str, msg: str) -> tuple[int, dict]:
        return 400, {"__type": etype, "Message": msg}

    def _dispatch(target: str, body: dict) -> tuple[int, dict]:
        if target == "GetDatabases":
            return 200, {"DatabaseList": [{"Name": n} for n in sorted(databases)]}
        if target == "CreateDatabase":
            name = body["DatabaseInput"]["Name"]
            if name in databases:
                return _err("AlreadyExistsException", f"database {name}")
            databases[name] = body["DatabaseInput"]
            return 200, {}
        if target == "GetTables":
            db = body["DatabaseName"]
            return 200, {
                "TableList": [t for (d, _), t in sorted(tables.items()) if d == db]
            }
        if target == "GetTable":
            key = (body["DatabaseName"], body["Name"])
            t = tables.get(key)
            if t is None:
                return _err("EntityNotFoundException", f"table {key}")
            return 200, {"Table": t}
        if target == "CreateTable":
            ti = body["TableInput"]
            key = (body["DatabaseName"], ti["Name"])
            if key in tables:
                return _err("AlreadyExistsException", f"table {key}")
            tables[key] = {
                **ti,
                "DatabaseName": key[0],
                "VersionId": "1",
            }
            return 200, {}
        if target == "UpdateTable":
            ti = body["TableInput"]
            key = (body["DatabaseName"], ti["Name"])
            cur = tables.get(key)
            if cur is None:
                return _err("EntityNotFoundException", f"table {key}")
            if body.get("VersionId") != cur["VersionId"]:
                return _err(
                    "ConcurrentModificationException",
                    f"version {body.get('VersionId')} != {cur['VersionId']}",
                )
            tables[key] = {
                **ti,
                "DatabaseName": key[0],
                "VersionId": str(int(cur["VersionId"]) + 1),
            }
            return 200, {}
        if target == "DeleteTable":
            key = (body["DatabaseName"], body["Name"])
            if tables.pop(key, None) is None:
                return _err("EntityNotFoundException", f"table {key}")
            return 200, {}
        return _err("InvalidInputException", f"unsupported operation {target}")

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: N802
            pass

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length") or 0)
            body = json.loads(self.rfile.read(n)) if n else {}
            target = (self.headers.get("X-Amz-Target") or "").rsplit(".", 1)[-1]
            with lock:
                status, payload = _dispatch(target, body)
            out = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/x-amz-json-1.1")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()

    def shutdown():
        srv.shutdown()
        th.join(5)

    return f"http://127.0.0.1:{srv.server_port}", shutdown


def sigv4_transport(
    endpoint: str,
    *,
    region: str,
    access_key: str,
    secret_key: str,
    session_token: str | None = None,
):
    """Production transport factory: the same JSON-1.1 wire dialect,
    SIGNED with :mod:`icepack.sigv4` (service ``glue``).  Injected as
    ``GlueCatalogClient(endpoint, transport=sigv4_transport(...))`` —
    protocol code unchanged, exactly the seam the class docstring
    promises.  Loopback-verified (tests/test_gluecat.py signs against
    a server that recomputes each signature)."""
    from urllib.parse import urlparse

    from .sigv4 import sign as _sign

    host = urlparse(endpoint.rstrip("/")).netloc

    def transport(target: str, body: dict):
        payload = json.dumps(body).encode()
        headers = _sign(
            "POST",
            "/",
            {},
            {
                "host": host,
                "content-type": "application/x-amz-json-1.1",
                "x-amz-target": f"AWSGlue.{target}",
            },
            payload,
            access_key=access_key,
            secret_key=secret_key,
            region=region,
            service="glue",
            session_token=session_token,
        )
        headers.pop("host", None)  # urllib sets Host; it was signed
        req = urllib.request.Request(
            endpoint.rstrip("/") + "/", data=payload, method="POST", headers=headers
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                raw = resp.read()
                return resp.status, (json.loads(raw) if raw else {})
        except urllib.error.HTTPError as e:
            raw = e.read()
            try:
                return e.code, json.loads(raw)
            except (ValueError, TypeError):
                return e.code, {"__type": "HTTPError", "Message": raw.decode("utf-8", "replace")}

    return transport
