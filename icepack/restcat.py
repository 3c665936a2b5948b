"""Iceberg REST catalog protocol client (SURVEY.md S5,
docs/04-catalog-systems.md:58-93).

Speaks the subset of the PUBLIC Apache Iceberg REST Catalog OpenAPI
surface that table lifecycle needs — config, namespaces, table
create/load/list/drop/register, and the commit endpoint whose conflict
contract (HTTP 409 on a failed UpdateRequirement) is the network form
of the optimistic CAS every Iceberg catalog provides (docs/01:50-66:
"atomic CAS commits").

Wire shapes follow the spec's request/response bodies:

- ``createTable``: POST /v1/{prefix}/namespaces/{ns}/tables with a
  CreateTableRequest ``{name, location, schema, partition-spec,
  properties}`` — the SERVER constructs and persists the initial
  metadata document and answers with a LoadTableResult.
- ``loadTable``: GET .../tables/{t} → LoadTableResult
  ``{metadata-location, metadata}`` — metadata travels INLINE; the
  location is an opaque storage URI the client never needs to read
  (this client falls back to reading it only when a server omits the
  inline field).
- ``updateTable`` (commit): POST .../tables/{t} with a
  CommitTableRequest ``{identifier, requirements, updates}``.  The
  client authors fine-grained MetadataUpdate actions (add-snapshot,
  set-snapshot-ref, add-schema, set-properties, ...) plus the
  UpdateRequirements guarding them (assert-table-uuid,
  assert-ref-snapshot-id, ...); the SERVER validates the requirements
  against its current metadata, applies the updates, writes the new
  metadata document, and answers with a CommitTableResponse
  ``{metadata-location, metadata}``.  A failed requirement is a 409,
  surfaced as :class:`CommitConflict` so the table's retry loop
  re-bases — identical to the local-pointer conflict path.

Division of labor, exactly as the docs describe external catalogs
(docs/04:16-24): data files stay in storage, the catalog service owns
the current-metadata pointer AND the act of producing the next
metadata document from the committed updates.

One deliberate model note: this table format keeps the main lineage in
``current-snapshot-id`` (refs hold only explicitly-created tags and
branches), so on the wire the spec's ``main`` branch ref maps to
``current-snapshot-id`` — ``set-snapshot-ref main`` moves the current
pointer, ``assert-ref-snapshot-id main`` guards it.  Named refs map to
the refs table directly.

The in-repo loopback server (:func:`loopback_catalog_server`, plus an
independent JSON-level double in tests/test_restcat.py) implements the
same subset in-process over 127.0.0.1 — what an offline sandbox can
verify is protocol SHAPE fidelity, requirement semantics, and
conflict-retry behavior under concurrent commits; interop against a
hosted Polaris/Nessie/Tabular deployment additionally needs their
auth transport wrapped around ``RestCatalogClient.transport``.
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

from .metadata import IceSchema, PartitionSpec, Snapshot, SortOrder, TableMetadata
from .table import CommitConflict, IceTable, build_partition_spec


# -- MetadataUpdate / UpdateRequirement (spec shapes) -----------------------


def build_updates(base: TableMetadata, new: TableMetadata) -> list[dict]:
    """Diff two metadata versions into the spec's MetadataUpdate list.

    Every commit path in :class:`IceTable` derives ``new`` from ``base``
    via ``copy_with`` — schemas/specs/orders/snapshots are append-only
    with stable ids, so the delta is expressible exactly.  A same-id
    entity that CHANGED would be a bug in the commit path (Iceberg
    metadata entities are immutable), so that raises rather than
    silently shipping a lossy diff."""
    ups: list[dict] = []
    if new.location != base.location:
        ups.append({"action": "set-location", "location": new.location})

    def _immutable(kind, olds, news, key):
        old_by_id = {key(o): o for o in olds}
        for n in news:
            o = old_by_id.get(key(n))
            if o is not None and o.to_json() != n.to_json():
                raise ValueError(
                    f"{kind} {key(n)} mutated in place — not expressible as a MetadataUpdate"
                )

    _immutable("schema", base.schemas, new.schemas, lambda s: s.schema_id)
    _immutable("spec", base.partition_specs, new.partition_specs, lambda s: s.spec_id)
    _immutable("snapshot", base.snapshots, new.snapshots, lambda s: s.snapshot_id)

    have = {s.schema_id for s in base.schemas}
    for s in new.schemas:
        if s.schema_id not in have:
            ups.append(
                {
                    "action": "add-schema",
                    "schema": s.to_json(),
                    "last-column-id": new.last_column_id,
                }
            )
    if new.current_schema_id != base.current_schema_id:
        ups.append({"action": "set-current-schema", "schema-id": new.current_schema_id})

    have = {s.spec_id for s in base.partition_specs}
    for s in new.partition_specs:
        if s.spec_id not in have:
            ups.append({"action": "add-spec", "spec": s.to_json()})
    if new.default_spec_id != base.default_spec_id:
        ups.append({"action": "set-default-spec", "spec-id": new.default_spec_id})

    have = {o.order_id for o in base.sort_orders}
    for o in new.sort_orders:
        if o.order_id not in have:
            ups.append({"action": "add-sort-order", "sort-order": o.to_json()})
    if new.default_sort_order_id != base.default_sort_order_id:
        ups.append(
            {
                "action": "set-default-sort-order",
                "sort-order-id": new.default_sort_order_id,
            }
        )

    base_sids = {s.snapshot_id for s in base.snapshots}
    new_sids = {s.snapshot_id for s in new.snapshots}
    for s in new.snapshots:
        if s.snapshot_id not in base_sids:
            ups.append({"action": "add-snapshot", "snapshot": s.to_json()})
    removed = sorted(base_sids - new_sids)
    if removed:
        ups.append({"action": "remove-snapshots", "snapshot-ids": removed})

    if new.current_snapshot_id != base.current_snapshot_id:
        if new.current_snapshot_id is None:
            ups.append({"action": "remove-snapshot-ref", "ref-name": "main"})
        else:
            ups.append(
                {
                    "action": "set-snapshot-ref",
                    "ref-name": "main",
                    "type": "branch",
                    "snapshot-id": new.current_snapshot_id,
                }
            )
    for name, r in new.refs.items():
        if base.refs.get(name) != r:
            ups.append(
                {
                    "action": "set-snapshot-ref",
                    "ref-name": name,
                    "type": r["type"],
                    "snapshot-id": r["snapshot-id"],
                }
            )
    for name in base.refs:
        if name not in new.refs:
            ups.append({"action": "remove-snapshot-ref", "ref-name": name})

    changed = {k: v for k, v in new.properties.items() if base.properties.get(k) != v}
    if changed:
        ups.append({"action": "set-properties", "updates": changed})
    removals = sorted(k for k in base.properties if k not in new.properties)
    if removals:
        ups.append({"action": "remove-properties", "removals": removals})
    return ups


def build_requirements(base: TableMetadata, updates: list[dict]) -> list[dict]:
    """UpdateRequirements guarding ``updates``, valued from the BASE
    metadata the client computed them against (the optimistic-CAS
    contract): every touched ref asserts its base snapshot-id, schema /
    spec / sort-order changes assert the base current ids, and the main
    ref is always asserted when snapshots move so concurrent lineage
    writers conflict instead of forking."""
    reqs: list[dict] = [{"type": "assert-table-uuid", "uuid": base.table_uuid}]
    refs: set[str] = set()
    families: set[str] = set()
    for u in updates:
        a = u["action"]
        if a in ("set-snapshot-ref", "remove-snapshot-ref"):
            refs.add(u["ref-name"])
        elif a in ("add-snapshot", "remove-snapshots"):
            refs.add("main")
        elif a in ("add-schema", "set-current-schema"):
            families.add("schema")
        elif a in ("add-spec", "set-default-spec"):
            families.add("spec")
        elif a in ("add-sort-order", "set-default-sort-order"):
            families.add("order")
    for name in sorted(refs):
        if name == "main":
            sid = base.current_snapshot_id
        else:
            sid = (base.refs.get(name) or {}).get("snapshot-id")
        reqs.append({"type": "assert-ref-snapshot-id", "ref": name, "snapshot-id": sid})
    if "schema" in families:
        reqs.append(
            {
                "type": "assert-current-schema-id",
                "current-schema-id": base.current_schema_id,
            }
        )
        reqs.append(
            {
                "type": "assert-last-assigned-field-id",
                "last-assigned-field-id": base.last_column_id,
            }
        )
    if "spec" in families:
        reqs.append(
            {"type": "assert-default-spec-id", "default-spec-id": base.default_spec_id}
        )
    if "order" in families:
        reqs.append(
            {
                "type": "assert-default-sort-order-id",
                "default-sort-order-id": base.default_sort_order_id,
            }
        )
    return reqs


def check_requirements(meta: TableMetadata | None, reqs: list[dict]) -> str | None:
    """Server-side requirement validation; returns a failure message or
    None.  Unknown requirement types fail closed (a real service
    rejects what it cannot enforce)."""
    for r in reqs:
        t = r.get("type")
        if t == "assert-create":
            if meta is not None:
                return "table already exists"
        elif meta is None:
            return "no such table"
        elif t == "assert-table-uuid":
            if meta.table_uuid != r.get("uuid"):
                return f"uuid mismatch: {meta.table_uuid} != {r.get('uuid')}"
        elif t == "assert-ref-snapshot-id":
            name = r.get("ref")
            cur = (
                meta.current_snapshot_id
                if name == "main"
                else (meta.refs.get(name) or {}).get("snapshot-id")
            )
            if cur != r.get("snapshot-id"):
                return f"ref {name!r} moved: {cur} != {r.get('snapshot-id')}"
        elif t == "assert-current-schema-id":
            if meta.current_schema_id != r.get("current-schema-id"):
                return "current schema changed"
        elif t == "assert-last-assigned-field-id":
            if meta.last_column_id != r.get("last-assigned-field-id"):
                return "last assigned field id changed"
        elif t == "assert-default-spec-id":
            if meta.default_spec_id != r.get("default-spec-id"):
                return "default spec changed"
        elif t == "assert-default-sort-order-id":
            if meta.default_sort_order_id != r.get("default-sort-order-id"):
                return "default sort order changed"
        else:
            return f"unsupported requirement type {t!r}"
    return None


def apply_updates(meta: TableMetadata, updates: list[dict]) -> TableMetadata:
    """Apply a MetadataUpdate list to ``meta`` — the server half of the
    commit protocol."""
    m = meta
    for u in updates:
        a = u.get("action")
        if a == "set-location":
            m = m.copy_with(location=u["location"])
        elif a == "add-schema":
            m = m.copy_with(
                schemas=m.schemas + [IceSchema.from_json(u["schema"])],
                last_column_id=max(m.last_column_id, u.get("last-column-id", 0)),
            )
        elif a == "set-current-schema":
            m = m.copy_with(current_schema_id=u["schema-id"])
        elif a == "add-spec":
            m = m.copy_with(
                partition_specs=m.partition_specs + [PartitionSpec.from_json(u["spec"])]
            )
        elif a == "set-default-spec":
            m = m.copy_with(default_spec_id=u["spec-id"])
        elif a == "add-sort-order":
            m = m.copy_with(
                sort_orders=m.sort_orders + [SortOrder.from_json(u["sort-order"])]
            )
        elif a == "set-default-sort-order":
            m = m.copy_with(default_sort_order_id=u["sort-order-id"])
        elif a == "add-snapshot":
            snap = Snapshot.from_json(u["snapshot"])
            m = m.copy_with(
                snapshots=m.snapshots + [snap],
                last_sequence_number=max(m.last_sequence_number, snap.sequence_number),
            )
        elif a == "remove-snapshots":
            gone = set(u["snapshot-ids"])
            m = m.copy_with(
                snapshots=[s for s in m.snapshots if s.snapshot_id not in gone]
            )
        elif a == "set-snapshot-ref":
            if u["ref-name"] == "main":
                m = m.copy_with(current_snapshot_id=u["snapshot-id"])
            else:
                m = m.copy_with(
                    refs={
                        **m.refs,
                        u["ref-name"]: {
                            "snapshot-id": u["snapshot-id"],
                            "type": u.get("type", "branch"),
                        },
                    }
                )
        elif a == "remove-snapshot-ref":
            if u["ref-name"] == "main":
                m = m.copy_with(current_snapshot_id=None)
            else:
                m = m.copy_with(
                    refs={k: v for k, v in m.refs.items() if k != u["ref-name"]}
                )
        elif a == "set-properties":
            m = m.copy_with(properties={**m.properties, **u["updates"]})
        elif a == "remove-properties":
            gone = set(u["removals"])
            m = m.copy_with(
                properties={k: v for k, v in m.properties.items() if k not in gone}
            )
        else:
            raise ValueError(f"unsupported MetadataUpdate action {a!r}")
    return m


def _doc_version(metadata_location: str) -> int:
    """``.../vN-<uuid>.metadata.json`` → N (0 when unparseable — a
    foreign catalog may name docs differently; version is cosmetic for
    a REST table, the catalog pointer is the source of truth)."""
    base = os.path.basename(metadata_location)
    try:
        return int(base.split("-", 1)[0].lstrip("v"))
    except ValueError:
        return 0


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

    def create_table(
        self,
        namespace: str,
        name: str,
        location: str,
        schema: dict,
        partition_spec: dict | None = None,
        properties: dict | None = None,
    ) -> dict:
        """CreateTableRequest → LoadTableResult.  The server constructs
        and persists the initial metadata document."""
        return self._call(
            "POST",
            f"/namespaces/{namespace}/tables",
            {
                "name": name,
                "location": location,
                "schema": schema,
                "partition-spec": partition_spec,
                "properties": properties or {},
            },
        )

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
        """→ LoadTableResult ``{"metadata-location": ..., "metadata":
        {...}}``."""
        return self._call("GET", f"/namespaces/{namespace}/tables/{name}")

    def commit_table(
        self,
        namespace: str,
        name: str,
        requirements: list[dict],
        updates: list[dict],
    ) -> dict:
        """CommitTableRequest → CommitTableResponse.  The server
        validates ``requirements`` against its current metadata (409 =
        CommitConflict, re-base and retry), applies ``updates``, writes
        the new metadata document itself, and returns
        ``{"metadata-location", "metadata"}``."""
        return self._call(
            "POST",
            f"/namespaces/{namespace}/tables/{name}",
            {
                "identifier": {"namespace": namespace.split("."), "name": name},
                "requirements": requirements,
                "updates": updates,
            },
        )

    def drop_table(self, namespace: str, name: str) -> None:
        self._call("DELETE", f"/namespaces/{namespace}/tables/{name}")


def _result_meta(result: dict, store=None) -> tuple[str, TableMetadata]:
    """(metadata-location, metadata) from a LoadTableResult /
    CommitTableResponse, preferring the spec's inline metadata and
    falling back to reading the location (through the metadata store)
    only when a server omits it."""
    from .storage import LOCAL

    loc = result["metadata-location"]
    inline = result.get("metadata")
    if inline is not None:
        return loc, TableMetadata.from_json(inline)
    return loc, TableMetadata.loads((store or LOCAL).read_text(loc))


class RestTable(IceTable):
    """IceTable committed through a REST catalog: same storage layout,
    commit CAS at the service (docs/04:16-24 external-catalog mode).

    cf. docs/08-acid-transactions.md:52-78 — the conflict/retry loop in
    ``_commit_snapshot`` is inherited unchanged; only the "attempt the
    swap" primitive differs.  ``_write_version`` diffs the staged
    metadata against the handle's base into spec MetadataUpdates +
    UpdateRequirements and POSTs a CommitTableRequest; the SERVER
    applies them and writes the next metadata document, and the handle
    adopts the server's returned metadata as authoritative (so e.g.
    ``last-updated-ms`` is service-assigned, as in a real catalog)."""

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
        if metadata_location:
            self._version = _doc_version(metadata_location)

    # -- commit seam --------------------------------------------------------

    def _write_version(self, version: int, meta: TableMetadata) -> None:
        base = self.meta  # the metadata this mutation was computed from
        updates = build_updates(base, meta)
        reqs = build_requirements(base, updates)
        out = self.client.commit_table(self.namespace, self.name, reqs, updates)
        # raises CommitConflict on 409 → inherited retry loop re-bases
        self._metadata_location, self.meta = _result_meta(out, self.store)
        self._version = _doc_version(self._metadata_location) or version

    def refresh(self) -> "RestTable":
        loc, meta = _result_meta(self.client.load_table(self.namespace, self.name), self.store)
        self.meta = meta
        self._metadata_location = loc
        self._version = _doc_version(loc)
        return self


class RestCatalog:
    """Catalog facade over the REST protocol — the drop-in counterpart
    of :class:`icepack.catalog.Catalog` for service-cataloged tables.
    ``warehouse`` is where table storage lives (object store in
    production); the service holds names, pointers, and the commit
    path."""

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
        ice_schema = (
            schema if isinstance(schema, IceSchema) else IceSchema.from_struct(schema)
        )
        spec = build_partition_spec(ice_schema, partition_by)
        result = self.client.create_table(
            self.namespace,
            name,
            self._loc(name),
            ice_schema.to_json(),
            spec.to_json(),
            properties,
        )
        loc, meta = _result_meta(result)
        return RestTable(
            self.spark,
            meta.location,
            meta,
            self.client,
            self.namespace,
            name,
            metadata_location=loc,
        )

    def load_table(self, name: str) -> RestTable:
        # the metadata DOCUMENT is the source of truth for where the
        # table's storage lives (its `location` field) — a client must
        # not assume the table sits under its own warehouse root (a
        # linked table created by another engine usually doesn't)
        loc, meta = _result_meta(self.client.load_table(self.namespace, name))
        return RestTable(
            self.spark,
            meta.location,
            meta,
            self.client,
            self.namespace,
            name,
            metadata_location=loc,
        )

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

    This is the offline stand-in for a real catalog service: it owns
    {(namespace, table) -> metadata-location} behind a lock and the
    SERVER side of the commit protocol — requirement validation
    (:func:`check_requirements`), update application
    (:func:`apply_updates`), and writing each new metadata document.
    Used by the ice32 driver query so external-catalog mode is
    exercised end to end in any environment; tests/test_restcat.py pins
    the wire protocol against an independent JSON-level second
    implementation."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    namespaces: dict[str, dict] = {}
    tables: dict[tuple[str, str], str] = {}  # -> metadata-location
    lock = threading.Lock()

    def _read_meta(loc: str) -> TableMetadata:
        with open(loc) as f:
            return TableMetadata.loads(f.read())

    def _write_doc(meta: TableMetadata, version: int) -> str:
        mdir = os.path.join(meta.location, "metadata")
        os.makedirs(mdir, exist_ok=True)
        doc = os.path.join(mdir, f"v{version}-{uuid.uuid4().hex}.metadata.json")
        with open(doc, "x") as f:
            f.write(meta.dumps())
        return doc

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
                return self._send(
                    200,
                    {
                        "metadata-location": loc,
                        "metadata": _read_meta(loc).to_json(),
                    },
                )
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
            if len(parts) == 4 and parts[3] == "register":
                key = (parts[2], body["name"])
                with lock:
                    if key in tables:
                        return self._send(409, {"error": "table exists"})
                    tables[key] = body["metadata-location"]
                return self._send(
                    200, {"metadata-location": body["metadata-location"]}
                )
            if len(parts) == 4 and parts[3] == "tables":
                # createTable: the server builds and persists v1 metadata
                key = (parts[2], body["name"])
                schema = IceSchema.from_json(body["schema"])
                spec = (
                    PartitionSpec.from_json(body["partition-spec"])
                    if body.get("partition-spec")
                    else PartitionSpec(0, [])
                )
                meta = TableMetadata.new(
                    body["location"], schema, spec, body.get("properties")
                )
                with lock:
                    if key in tables:
                        return self._send(409, {"error": "table exists"})
                    doc = _write_doc(meta, 1)
                    tables[key] = doc
                return self._send(
                    200, {"metadata-location": doc, "metadata": meta.to_json()}
                )
            if len(parts) == 5 and parts[3] == "tables":
                # updateTable: validate requirements, apply updates,
                # write the next metadata document, swap the pointer
                key = (parts[2], parts[4])
                with lock:
                    cur_loc = tables.get(key)
                    cur = _read_meta(cur_loc) if cur_loc else None
                    err = check_requirements(cur, body.get("requirements", []))
                    if err is not None:
                        return self._send(409, {"error": err})
                    if cur is None:
                        return self._send(404, {"error": "no such table"})
                    try:
                        new = apply_updates(cur, body.get("updates", []))
                    except ValueError as e:
                        return self._send(400, {"error": str(e)})
                    new.last_updated_ms = int(time.time() * 1000)
                    doc = _write_doc(new, _doc_version(cur_loc) + 1)
                    tables[key] = doc
                return self._send(
                    200, {"metadata-location": doc, "metadata": new.to_json()}
                )
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
