"""SPEC-FORMAT metadata as the PRIMARY write path (docs/11-multi-engine-
compatibility.md:112-120: "Writing to Shared Tables … changes visible to
all engines immediately" — one metadata tree both sides commit to).

With table property ``format.spec-primary=true``, every commit writes
ONLY Apache Iceberg v2 spec files under ``<location>/metadata/``:

- ``v{N}.metadata.json`` — spec metadata.json (schemas in Iceberg
  type JSON, numeric partition values downstream, absolute manifest
  lists, refs incl. ``main``), plus ``version-hint.text`` for
  HadoopCatalog-style followers (the native ``version-hint.json``
  stays as the probe hint; both point at the same version),
- ``snap-<sid>-<uuid>.avro`` — spec manifest lists,
- ``manifest-<uuid>.avro`` — spec manifests, split by (content,
  partition-spec) as the spec requires, entries carrying real
  single-value-serialized bounds / value counts / partition tuples.

There is no mirror and no export step: external engines follow the
same version hint the native engine commits, which deletes the
mirror-drift failure class by construction.

Native-only information the spec cannot express rides in Avro OCF
*user* key-value metadata (the spec requires certain keys and permits
extra ones; Java readers ignore unknown keys):

- per-manifest ``icepack.schema-ids`` — {file_path: native schema id}
  (icepack parquet carries no embedded field ids, so per-file schema
  identity is what makes rename/widen reconciliation exact; external
  readers use the exported ``schema.name-mapping.default`` instead),
- per-manifest-list ``icepack.summaries`` — the native partition-range
  summaries that drive manifest-level skip pruning (spec
  ``field_summary`` cannot carry live-bytes / distinct-partition
  bookkeeping the scan report needs).

Everything else — paths, counts, sequence numbers, partition tuples,
column bounds — round-trips through the SPEC fields themselves; the
stashed extras are additive, never an alternate source of truth for
anything the spec can express.

MOR delete files are written spec-shaped at commit (position deletes
path-canonicalized raw + sorted + reserved field ids 2147483546/5,
equality deletes field-id-stamped), so external engines apply the
same masks; the native read side canonicalizes Spark's
``_metadata.file_path`` URI through the same function
(:func:`icepack.iceberg_import.canonical_file_path`).

Transforms must be spec-expressible: identity, year/month/day/hour,
``truncate`` (string/integral), ``mmh3bucket`` (= spec ``bucket``).
The native xxhash64 ``bucket`` and decimal ``truncate`` refuse at
CREATE — a "void" partition column cannot be the primary encoding of
anything.
"""

from __future__ import annotations

import json
import os
import uuid as _uuid
from dataclasses import replace as _dc_replace

from .avroenc import read_container_with_meta, write_container
from .iceberg_export import (
    _bound_bytes,
    _delete_entry_record,
    _dv_entry_record,
    _entry_record,
    _export_transform,
    _manifest_entry_schema,
    _manifest_list_schema,
    _name_mapping,
    _schema_json,
    _spec_partition_value,
)
from .iceberg_import import _decode_bound, canonical_file_path
from .manifest import DataFile, manifest_summary
from .metadata import (
    IceSchema,
    NestedField,
    PartitionField,
    PartitionSpec,
    Snapshot,
    SortField,
    SortOrder,
    TableMetadata,
    UNSORTED_ORDER,
)

PROPERTY = "format.spec-primary"

#: spec format version for spec-primary trees: "2" (default) or "3".
#: v3 lets the tree carry deletion vectors natively (content=1 Puffin
#: blob references, public Iceberg v3 spec "Delete Formats") — under
#: v2 DV content refuses at manifest write (no v2 entry shape exists).
VERSION_PROPERTY = "format.spec-version"


def spec_format_version(properties: dict) -> int:
    try:
        v = int(str(properties.get(VERSION_PROPERTY, "2")))
    except (TypeError, ValueError):
        v = 2
    if v not in (2, 3):
        raise ValueError(f"{VERSION_PROPERTY} must be 2 or 3, got {v}")
    return v

#: native status string ↔ spec entry status code
_STATUS_TO_CODE = {"existing": 0, "added": 1, "deleted": 2}
_CODE_TO_STATUS = {v: k for k, v in _STATUS_TO_CODE.items()}
_CONTENT_TO_CODE = {"data": 0, "position-deletes": 1, "equality-deletes": 2}
_CODE_TO_CONTENT = {v: k for k, v in _CONTENT_TO_CODE.items()}
#: v3 adds deletion vectors as content code 1 with a Puffin blob ref
_CONTENT_TO_CODE_V3 = {**_CONTENT_TO_CODE, "deletion-vectors": 1}

#: transforms whose spec export is lossless (see module docstring)
_SPEC_OK = ("identity", "year", "month", "day", "hour", "truncate", "mmh3bucket")


def is_spec_primary(properties: dict) -> bool:
    return str(properties.get(PROPERTY, "")).lower() == "true"


def check_spec_expressible(meta: TableMetadata, spec_ids=None) -> None:
    """Refuse transforms that would export as ``void`` — under
    spec-primary the spec files ARE the table; a void partition value
    is unrecoverable.

    ``spec_ids`` (optional) restricts the check to those specs: the
    conversion path passes the specs LIVE entries actually reference
    (+ the default), so a table migrated off a native ``bucket[N]``
    spec (maintenance.migrate_bucket_transform) can convert even
    though the retired spec — referenced only by pre-conversion native
    snapshots — still sits in the metadata (it serializes as ``void``,
    which is harmless for a spec no manifest references)."""
    for sp in meta.partition_specs:
        if spec_ids is not None and sp.spec_id not in spec_ids:
            continue
        for pf in sp.fields:
            kind = pf.transform.split("[")[0]
            src = None
            for s in meta.schemas:
                src = src or s.field_by_id(pf.source_id)
            stype = src.type if src is not None else "string"
            if kind not in _SPEC_OK or _export_transform(pf.transform, stype) == "void":
                raise ValueError(
                    f"transform {pf.transform!r} on {stype} is not "
                    "spec-expressible; spec-primary tables support "
                    "identity/year/month/day/hour/truncate(string|integral)/"
                    "mmh3bucket (use mmh3bucket instead of the native "
                    "xxhash64 bucket)"
                )


# ----------------------------------------------------------- type mapping


def _native_type(t) -> str:
    """Iceberg schema-JSON type → native (Spark simpleString-style)
    type string — the reverse of iceberg_export._iceberg_type."""
    if isinstance(t, str):
        prim = {
            "boolean": "boolean",
            "int": "int",
            "long": "bigint",
            "float": "float",
            "double": "double",
            "date": "date",
            "time": "time",
            "timestamp": "timestamp_ntz",
            "timestamptz": "timestamp",
            "string": "string",
            "uuid": "string",
            "binary": "binary",
        }
        if t in prim:
            return prim[t]
        if t.startswith("decimal("):
            # iceberg spells "decimal(10, 2)", Spark simpleString
            # "decimal(10,2)" — normalize to the native spelling (a
            # drifting spelling would read as a schema change, the r4
            # datasource bug class)
            return t.replace(" ", "")
        raise ValueError(f"unknown iceberg primitive {t!r}")
    from .iceberg_import import _spark_type

    return _spark_type(t).simpleString()


# ------------------------------------------------------- metadata.json


def dump_spec_metadata(
    meta: TableMetadata, mdir: str, metadata_log: list | None = None
) -> str:
    """Native TableMetadata → spec metadata.json text.  *metadata_log*
    is the spec ``metadata-log`` chain (previous metadata files, oldest
    first) — external engines walk it for metadata history; the caller
    (``IceTable._write_version``) extends the previous version's chain."""
    next_id = [meta.last_column_id]

    def alloc() -> int:
        next_id[0] += 1
        return next_id[0]

    schemas_json = [_schema_json(s, alloc) for s in meta.schemas]
    specs_json = []
    last_partition_id = 999
    for sp in meta.partition_specs:
        fields = []
        for pf in sp.fields:
            src = None
            for s in meta.schemas:
                src = src or s.field_by_id(pf.source_id)
            stype = src.type if src is not None else "string"
            fields.append(
                {
                    "name": pf.name,
                    "transform": _export_transform(pf.transform, stype),
                    "source-id": pf.source_id,
                    "field-id": pf.field_id,
                }
            )
            last_partition_id = max(last_partition_id, pf.field_id)
        specs_json.append({"spec-id": sp.spec_id, "fields": fields})
    if not any(not sj["fields"] for sj in specs_json):
        # delete manifests are written under an unpartitioned spec
        # (see unpartitioned_spec_id) — register it so external readers
        # can resolve their partition_spec_id
        specs_json.append({"spec-id": unpartitioned_spec_id(meta), "fields": []})
    fv = spec_format_version(meta.properties)
    snapshots_json = []
    # v3 row lineage bookkeeping: snapshots committed after r12 carry
    # the EXACT assignment in their summary (first-row-id /
    # assigned-rows, written by _commit_snapshot alongside the
    # manifest-list field-520 assignment); older snapshots fall back to
    # the added-records approximation — monotonic and unique either way
    running_rows = 0
    first_row_of: dict[int, int] = {}
    for s in sorted(meta.snapshots, key=lambda x: x.sequence_number):
        first = _summary_int(s.summary.get("first-row-id"))
        if first is not None:
            first_row_of[s.snapshot_id] = first
            running_rows = max(
                running_rows,
                first + (_summary_int(s.summary.get("assigned-rows")) or 0),
            )
        else:
            first_row_of[s.snapshot_id] = running_rows
            running_rows += _summary_int(s.summary.get("added-records")) or 0
    for s in meta.snapshots:
        snapshots_json.append(
            {
                "snapshot-id": s.snapshot_id,
                **(
                    {"parent-snapshot-id": s.parent_snapshot_id}
                    if s.parent_snapshot_id is not None
                    else {}
                ),
                "sequence-number": s.sequence_number,
                "timestamp-ms": s.timestamp_ms,
                "schema-id": s.schema_id,
                "manifest-list": os.path.join(mdir, s.manifest_list),
                "summary": {
                    "operation": _SPEC_OPS.get(s.operation, "overwrite"),
                    "icepack.operation": s.operation,
                    **{k: str(v) for k, v in s.summary.items()},
                },
                **(
                    {"first-row-id": first_row_of.get(s.snapshot_id, 0)}
                    if fv >= 3
                    else {}
                ),
            }
        )
    refs = {
        n: {"snapshot-id": r["snapshot-id"], "type": r["type"]}
        for n, r in meta.refs.items()
    }
    if meta.current_snapshot_id is not None:
        refs["main"] = {"snapshot-id": meta.current_snapshot_id, "type": "branch"}
    md = {
        "format-version": fv,
        **({"next-row-id": running_rows} if fv >= 3 else {}),
        "table-uuid": meta.table_uuid
        if _is_uuid(meta.table_uuid)
        else str(_uuid.uuid5(_uuid.NAMESPACE_URL, str(meta.table_uuid))),
        "location": meta.location,
        "last-sequence-number": meta.last_sequence_number,
        "last-updated-ms": meta.last_updated_ms,
        "last-column-id": next_id[0],
        "current-schema-id": meta.current_schema_id,
        "schemas": schemas_json,
        "default-spec-id": meta.default_spec_id,
        "partition-specs": specs_json,
        "last-partition-id": last_partition_id,
        "default-sort-order-id": meta.default_sort_order_id,
        "sort-orders": [
            {
                "order-id": o.order_id,
                "fields": [
                    {
                        "transform": "identity",
                        "source-id": f.source_id,
                        "direction": f.direction,
                        "null-order": f.null_order,
                    }
                    for f in o.fields
                ],
            }
            for o in meta.sort_orders
        ],
        "properties": {
            **{k: str(v) for k, v in meta.properties.items()},
            # regenerated from OUR schema history, MERGED with any
            # mapping already carried (a foreign tree's historical
            # names must survive our commits — they resolve files we
            # never rewrote)
            "schema.name-mapping.default": json.dumps(
                _merged_name_mapping(meta), separators=(",", ":")
            ),
            # native bookkeeping the spec has no top-level slot for
            "icepack.last-column-id": str(meta.last_column_id),
            "icepack.table-uuid": str(meta.table_uuid),
        },
        "current-snapshot-id": meta.current_snapshot_id
        if meta.current_snapshot_id is not None
        else -1,
        "snapshots": snapshots_json,
        "snapshot-log": [
            {"snapshot-id": s["snapshot-id"], "timestamp-ms": s["timestamp-ms"]}
            for s in snapshots_json
            if s["snapshot-id"] in _main_ids(meta)
        ],
        "metadata-log": metadata_log or [],
        "refs": refs,
        # StatisticsFile entries (Puffin, icepack/puffin.py) — already
        # spec-shaped dicts, carried verbatim
        "statistics": meta.statistics,
    }
    return json.dumps(md, indent=1)


#: native operation → the spec's closed operation enum; the exact
#: native operation rides in summary["icepack.operation"]
_SPEC_OPS = {
    "append": "append",
    "overwrite": "overwrite",
    "delete": "delete",
    "replace": "replace",
    "rollback": "overwrite",
}


def _main_ids(meta: TableMetadata) -> set:
    try:
        return meta.main_ancestry_ids()
    except Exception:  # noqa: BLE001 — snapshots referenced by refs only
        return {s.snapshot_id for s in meta.snapshots}


def _is_uuid(s) -> bool:
    try:
        _uuid.UUID(str(s))
        return True
    except ValueError:
        return False


def looks_like_spec_metadata(d: dict) -> bool:
    """Discriminate a spec metadata.json from the native layout: the
    spec nests schemas as ``{"type": "struct", ...}``."""
    schemas = d.get("schemas") or []
    return bool(schemas) and schemas[0].get("type") == "struct"


def _merged_name_mapping(meta: TableMetadata) -> list:
    out = {e["field-id"]: list(e["names"]) for e in _name_mapping(meta)}
    raw = meta.properties.get("schema.name-mapping.default")
    if raw:
        try:
            for e in json.loads(raw):
                names = out.setdefault(e["field-id"], [])
                for n in e.get("names", []):
                    if n not in names:
                        names.append(n)
        except (ValueError, TypeError, KeyError):
            pass
    return [{"field-id": fid, "names": ns} for fid, ns in sorted(out.items())]


def load_spec_metadata(text: str) -> TableMetadata:
    d = json.loads(text)
    props = dict(d.get("properties", {}))
    # keep schema.name-mapping.default: foreign files resolve through
    # it at read time, and the dump side MERGES rather than clobbers
    last_col = int(props.pop("icepack.last-column-id", d["last-column-id"]))
    tuid = props.pop("icepack.table-uuid", d["table-uuid"])
    schemas = []
    for sj in d["schemas"]:
        fields = [
            NestedField(
                f["id"], f["name"], _native_type(f["type"]), f.get("required", False)
            )
            for f in sj["fields"]
            if f["id"] <= last_col  # allocated nested-position ids are not columns
        ]
        schemas.append(IceSchema(sj["schema-id"], fields))
    specs = []
    for sj in d["partition-specs"]:
        pfields = []
        for pf in sj["fields"]:
            tr = pf["transform"]
            if tr.startswith("bucket["):
                tr = "mmh3bucket[" + tr[len("bucket[") :]
            pfields.append(PartitionField(pf["source-id"], pf["field-id"], tr, pf["name"]))
        specs.append(PartitionSpec(sj["spec-id"], pfields))
    snapshots = []
    for sj in d.get("snapshots", []):
        summary = dict(sj.get("summary", {}))
        op = summary.pop("icepack.operation", None) or summary.pop(
            "operation", "append"
        )
        summary.pop("operation", None)
        snapshots.append(
            Snapshot(
                snapshot_id=sj["snapshot-id"],
                parent_snapshot_id=sj.get("parent-snapshot-id"),
                timestamp_ms=sj["timestamp-ms"],
                operation=op,
                manifest_list=os.path.basename(sj["manifest-list"]),
                schema_id=sj.get("schema-id", d["current-schema-id"]),
                sequence_number=sj.get("sequence-number", 0),
                summary=summary,
            )
        )
    refs = {
        n: dict(r) for n, r in d.get("refs", {}).items() if n != "main"
    }
    cur = d.get("current-snapshot-id")
    orders = [
        SortOrder(
            o["order-id"],
            [
                SortField(
                    f["source-id"],
                    f.get("direction", "asc"),
                    f.get("null-order", "nulls-first"),
                )
                for f in o.get("fields", [])
            ],
        )
        for o in d.get("sort-orders", [])
    ] or [UNSORTED_ORDER]
    return TableMetadata(
        table_uuid=tuid,
        location=d["location"],
        last_column_id=last_col,
        schemas=schemas,
        current_schema_id=d["current-schema-id"],
        partition_specs=specs,
        default_spec_id=d["default-spec-id"],
        snapshots=snapshots,
        current_snapshot_id=None if cur in (None, -1) else cur,
        properties=props,
        last_sequence_number=d.get("last-sequence-number", 0),
        last_updated_ms=d.get("last-updated-ms", 0),
        refs=refs,
        sort_orders=orders,
        default_sort_order_id=d.get("default-sort-order-id", 0),
        statistics=d.get("statistics", []),
    )


# ------------------------------------------------------------- manifests


class _TableView:
    """Minimal duck for iceberg_export's record builders (they read
    only ``.meta``)."""

    __slots__ = ("meta",)

    def __init__(self, meta):
        self.meta = meta


def unpartitioned_spec_id(meta: TableMetadata) -> int:
    """The spec id delete manifests are written under: spec engines
    match delete files to data files BY PARTITION, and dml registers
    delete files with an empty tuple — under a partitioned spec that
    tuple would read as all-null and only mask null-partition files in
    external engines (the ADVICE-r5 export bug, closed here for the
    primary tree too).  Unpartitioned deletes are global: position
    deletes still target files by path, equality deletes by key —
    the correct semantics, just unprunable."""
    for sp in meta.partition_specs:
        if not sp.fields:
            return sp.spec_id
    return max(sp.spec_id for sp in meta.partition_specs) + 1


def write_spec_manifests(
    mdir: str, entries: list[DataFile], meta: TableMetadata, store
) -> list[tuple[str, int, dict]]:
    """Write *entries* as spec manifests, split by (content, spec) as
    the spec requires; returns [(name, length, native_summary)].  The
    native summary is computed per SPLIT group so manifest-list skip
    pruning stays exact.  Delete-content entries are re-homed to the
    unpartitioned spec (see :func:`unpartitioned_spec_id`)."""
    tv = _TableView(meta)
    fv = spec_format_version(meta.properties)
    unpart = unpartitioned_spec_id(meta)
    groups: dict[tuple[int, int], list[DataFile]] = {}
    for e in entries:
        if e.content == "deletion-vectors" and fv < 3:
            raise ValueError(
                "deletion-vector content has no Iceberg v2 entry shape; "
                "set format.spec-version=3 on the table or run "
                "rewrite_position_deletes() first"
            )
        code = _CONTENT_TO_CODE_V3[e.content]
        if code != 0:
            e.spec_id = unpart
            e.partition = {}
            groups.setdefault((1, unpart), []).append(e)
        else:
            groups.setdefault((0, e.spec_id), []).append(e)
    out = []
    for (is_delete, spec_id), group in sorted(groups.items()):
        spec = (
            PartitionSpec(unpart, [])
            if is_delete and not any(
                sp.spec_id == spec_id for sp in meta.partition_specs
            )
            else meta.spec_by_id(spec_id)
        )
        # one schema for bounds encoding; per-entry schema ids ride in
        # the OCF stash for exact native reconstruction
        schema = meta.schema_by_id(meta.current_schema_id)
        avro_schema = _manifest_entry_schema(spec, schema, fv)
        recs = []
        for e in group:
            # schema_id == -1 marks a FOREIGN file (no stash when its
            # manifest was read): encode its record under the current
            # schema but keep it OUT of the stash so reads keep
            # resolving it by field-id/name-mapping probe
            ee = (
                _dc_replace(e, schema_id=meta.current_schema_id)
                if e.schema_id == -1
                else e
            )
            if e.content == "data":
                r = _entry_record(tv, ee, _STATUS_TO_CODE[e.status], None)
                if fv >= 3:
                    # v3 row lineage (field 142): explicit when the
                    # entry was resolved (rewrites keep ids stable),
                    # null for fresh files (readers inherit from the
                    # manifest-list field-520 assignment)
                    r["data_file"]["first_row_id"] = e.first_row_id
            elif e.content == "deletion-vectors":
                # v3: the entry references one deletion-vector-v1 blob
                # inside the table's own Puffin file — zero-copy, the
                # bitmap never decodes on this path
                r = _dv_entry_record(
                    spec, e.path, e.referenced_data_file,
                    int(e.content_offset), int(e.content_size),
                    e.record_count, e.file_size_bytes,
                    e.sequence_number, None,
                )
                r["status"] = _STATUS_TO_CODE[e.status]
            else:
                code = _CONTENT_TO_CODE[e.content]
                eq_ids = []
                if e.content == "equality-deletes":
                    dschema = meta.schema_by_id(ee.schema_id)
                    for c in e.equality_columns:
                        f_old = dschema.field_by_name(c)
                        eq_ids.append(f_old.id if f_old is not None else 0)
                r = _delete_entry_record(tv, ee, spec, e.path, code, eq_ids, None)
                r["status"] = _STATUS_TO_CODE[e.status]
            r["sequence_number"] = e.sequence_number
            r["file_sequence_number"] = e.sequence_number
            recs.append(r)
        name = f"manifest-{_uuid.uuid4().hex}.avro"
        stash = {
            "icepack.schema-ids": json.dumps(
                {e.path: e.schema_id for e in group if e.schema_id != -1},
                separators=(",", ":"),
            ),
            **_spec_required_manifest_meta(meta, schema, spec_id, is_delete),
        }
        buf = write_container(
            avro_schema, recs, _sync_for(name), extra_meta=stash,
            codec=meta.properties.get("write.avro.codec", "null"),
        )
        store.write_bytes(store.join(mdir, name), buf)
        seqs = [e.sequence_number for e in group] or [0]
        out.append(
            (
                name,
                len(buf),
                {
                    **manifest_summary(group),
                    "sequence-number": max(seqs),
                    "min-sequence-number": min(seqs),
                    "added-rows": sum(
                        e.record_count for e in group if e.status == "added"
                    ),
                    "existing-rows": sum(
                        e.record_count for e in group if e.status == "existing"
                    ),
                    # v3: exact row-id budget — only entries WITHOUT an
                    # explicit first_row_id consume inheritance slots,
                    # so rewrites that carry resolved ids don't burn
                    # fresh id space for every existing row
                    **(
                        {
                            "rows-needing-ids": sum(
                                e.record_count
                                for e in group
                                if e.content == "data"
                                and e.first_row_id is None
                            )
                        }
                        if fv >= 3 and not is_delete
                        else {}
                    ),
                },
            )
        )
    if not out:  # empty commit still needs one (data) manifest
        spec = meta.spec
        schema = meta.schema
        name = f"manifest-{_uuid.uuid4().hex}.avro"
        stash = {
            "icepack.schema-ids": "{}",
            **_spec_required_manifest_meta(meta, schema, spec.spec_id, 0),
        }
        buf = write_container(
            _manifest_entry_schema(spec, schema, fv), [], _sync_for(name),
            extra_meta=stash,
            codec=meta.properties.get("write.avro.codec", "null"),
        )
        store.write_bytes(store.join(mdir, name), buf)
        out.append((name, len(buf), manifest_summary([])))
    return out


def _spec_required_manifest_meta(meta, schema, spec_id: int, is_delete: int) -> dict:
    next_id = [meta.last_column_id]

    def alloc():
        next_id[0] += 1
        return next_id[0]

    sj = _schema_json(schema, alloc)
    spec = next(
        (sp for sp in meta.partition_specs if sp.spec_id == spec_id),
        PartitionSpec(spec_id, []),
    )
    fields = []
    for pf in spec.fields:
        src = None
        for s in meta.schemas:
            src = src or s.field_by_id(pf.source_id)
        stype = src.type if src is not None else "string"
        fields.append(
            {
                "name": pf.name,
                "transform": _export_transform(pf.transform, stype),
                "source-id": pf.source_id,
                "field-id": pf.field_id,
            }
        )
    return {
        "schema": json.dumps(sj, separators=(",", ":")),
        "schema-id": str(schema.schema_id),
        "partition-spec": json.dumps(fields, separators=(",", ":")),
        "partition-spec-id": str(spec_id),
        "format-version": str(spec_format_version(meta.properties)),
        "content": "deletes" if is_delete else "data",
    }


def _sync_for(name: str) -> bytes:
    import hashlib

    return hashlib.md5(name.encode()).digest()


def read_spec_manifest(
    mdir: str, name: str, store, meta: TableMetadata
) -> list[DataFile]:
    """Spec manifest → native DataFile entries.  Paths / counts /
    sequence numbers / partition tuples / bounds come from the SPEC
    fields; per-file schema ids from the OCF stash (absent → current
    schema)."""
    buf = store.read_bytes(store.join(mdir, name))
    _schema, recs, ocf_meta = read_container_with_meta(buf)
    spec_id = int(ocf_meta.get("partition-spec-id", b"0").decode())
    stash = json.loads(ocf_meta.get("icepack.schema-ids", b"{}").decode() or "{}")
    spec = next(
        (sp for sp in meta.partition_specs if sp.spec_id == spec_id),
        PartitionSpec(spec_id, []),  # synthetic unpartitioned delete spec
    )
    out = []
    for r in recs:
        df_ = r["data_file"]
        code = df_.get("content", 0)
        # foreign engines may spell paths as file: URIs — decode to an
        # OPENABLE local path (mirrors iceberg_import._snapshot_entries;
        # Hadoop/pyarrow treat %20 literally in raw paths).  Non-file
        # schemes keep their connector spelling; the delete-mask join
        # canonicalizes both sides separately.
        fpath = df_["file_path"]
        if fpath.startswith("file:"):
            fpath = canonical_file_path(fpath)
        # stash-less files are FOREIGN (written by an external engine,
        # or kept foreign across rewrites): schema_id sentinel -1 makes
        # the read path resolve their columns by parquet field ids /
        # name mapping instead of imposing a schema by name.  Stash keys
        # are written by US in the native spelling, so try both.
        sid = stash.get(df_["file_path"])
        if sid is None:
            sid = stash.get(fpath)
        schema_id = sid if sid is not None else -1
        schema = meta.schema_by_id(
            schema_id if schema_id != -1 else meta.current_schema_id
        )
        partition = _native_partition(meta, spec, schema, df_.get("partition") or {})
        stats = _native_stats(schema, df_)
        eq_cols = []
        if code == 2:
            for fid in df_.get("equality_ids") or []:
                f = schema.field_by_id(fid)
                if f is not None:
                    eq_cols.append(f.name)
        content = _CODE_TO_CONTENT.get(code, "data")
        dv_kwargs = {}
        if code == 1 and (
            df_.get("content_offset") is not None
            or str(df_.get("file_format", "")).upper() == "PUFFIN"
        ):
            # v3 deletion vector: content=1 locating a blob inside a
            # Puffin file (referenced_data_file alone is NOT the signal
            # — some writers populate it on plain position deletes)
            content = "deletion-vectors"
            ref = df_.get("referenced_data_file")
            if ref and ref.startswith("file:"):
                ref = canonical_file_path(ref)
            dv_kwargs = {
                "referenced_data_file": ref,
                "content_offset": df_.get("content_offset"),
                "content_size": df_.get("content_size_in_bytes"),
            }
        out.append(
            DataFile(
                path=fpath,
                status=_CODE_TO_STATUS.get(r.get("status", 1), "added"),
                partition=partition,
                spec_id=spec_id,
                schema_id=schema_id,
                record_count=df_.get("record_count", 0),
                file_size_bytes=df_.get("file_size_in_bytes", 0),
                stats=stats,
                sequence_number=r.get("sequence_number") or 0,
                content=content,
                equality_columns=eq_cols,
                first_row_id=df_.get("first_row_id"),
                **dv_kwargs,
            )
        )
    return out


def _native_partition(meta, spec, schema, part: dict) -> dict:
    """Spec-numeric partition tuple → the native lexical encoding
    (the exact inverse of iceberg_export._spec_partition_value)."""
    import datetime as _dt

    out = {}
    for pf in spec.fields:
        v = part.get(pf.name)
        if v is None:
            out[pf.name] = None
            continue
        kind = pf.transform.split("[")[0]
        src = schema.field_by_id(pf.source_id)
        if src is None:
            for s in meta.schemas:
                src = src or s.field_by_id(pf.source_id)
        stype = src.type if src is not None else "string"
        if kind == "year":
            out[pf.name] = 1970 + int(v)
        elif kind == "month":
            m = int(v)
            out[pf.name] = f"{1970 + m // 12:04d}-{m % 12 + 1:02d}"
        elif kind == "day":
            out[pf.name] = (_dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))).isoformat()
        elif kind == "hour":
            h = _dt.datetime(1970, 1, 1) + _dt.timedelta(hours=int(v))
            out[pf.name] = h.strftime("%Y-%m-%d-%H")
        elif kind == "identity" and stype == "date":
            out[pf.name] = (_dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))).isoformat()
        elif kind == "identity" and stype in ("timestamp", "timestamp_ntz"):
            us = int(v)
            out[pf.name] = (
                _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)
            ).isoformat(sep=" ")
        elif kind == "truncate" and isinstance(v, bytes):
            # decimal truncate: avro decimal bytes = the truncated
            # UNSCALED long (big-endian two's-complement) — decode back
            # to the native integer partition domain so tuple pruning
            # keeps working on spec-primary decimal partitions
            out[pf.name] = int.from_bytes(v, "big", signed=True) if v else None
        else:  # identity scalar, truncate, mmh3bucket: value is native
            out[pf.name] = v
    return out


def _native_stats(schema, df_: dict) -> dict:
    lowers = {kv["key"]: kv["value"] for kv in (df_.get("lower_bounds") or [])}
    uppers = {kv["key"]: kv["value"] for kv in (df_.get("upper_bounds") or [])}
    nulls = {kv["key"]: kv["value"] for kv in (df_.get("null_value_counts") or [])}
    values = {kv["key"]: kv["value"] for kv in (df_.get("value_counts") or [])}
    stats: dict = {}
    for f in schema.fields:
        if f.id not in values and f.id not in nulls:
            continue
        lo = _decode_bound(_iceberg_name(f.type), lowers.get(f.id))
        hi = _decode_bound(_iceberg_name(f.type), uppers.get(f.id))
        ent: dict = {}
        if lo is not None:
            ent["min"] = lo
        if hi is not None:
            ent["max"] = hi
        if f.id in nulls:
            ent["nulls"] = nulls[f.id]
        if ent:
            stats[f.name] = ent
    return stats


def _iceberg_name(native_type: str) -> str:
    """Native type string → the iceberg primitive name _decode_bound
    expects."""
    return {
        "bigint": "long",
        "timestamp_ntz": "timestamp",
        "timestamp": "timestamptz",
    }.get(native_type, native_type)


# --------------------------------------------------------- manifest lists


def _is_delete_manifest_summary(s: dict) -> bool:
    """Whether a native manifest summary describes a DELETE-content
    manifest (the same predicate the manifest-list record's ``content``
    code is derived from)."""
    dc = s.get("delete-content-files", 0)
    return bool(dc) and dc == s.get("live-files", -1)


def _summary_int(v) -> int | None:
    try:
        return int(v)
    except (TypeError, ValueError):
        return None


def spec_next_row_id(meta) -> int:
    """The table's v3 ``next-row-id``: the first row id not yet
    assigned to any data manifest.  Walks the snapshot log in sequence
    order using the exact per-snapshot lineage summary written at
    commit (``first-row-id`` / ``assigned-rows``); snapshots that
    predate row-lineage commits fall back to the added-records
    approximation (monotonic and collision-free either way — row-id
    gaps are legal, overlaps are not)."""
    nxt = 0
    for s in sorted(meta.snapshots, key=lambda x: x.sequence_number):
        first = _summary_int(s.summary.get("first-row-id"))
        if first is not None:
            nxt = max(nxt, first + (_summary_int(s.summary.get("assigned-rows")) or 0))
        else:
            nxt += _summary_int(s.summary.get("added-records")) or 0
    return nxt


def assign_first_row_ids(summaries: list[dict], base: int) -> int:
    """Assign manifest-level ``first_row_id`` (Iceberg v3 manifest-list
    field 520) IN PLACE on the native summary dicts: each data manifest
    without one gets the running value starting at *base* (the
    snapshot's ``first-row-id``) and advances it by the manifest's
    ``added_rows_count + existing_rows_count`` — the spec's assignment
    rule, so external v3 readers can run row-id inheritance over the
    tree.  Carried-forward manifests keep the id they were assigned
    when first added (their summaries round-trip through the
    manifest-list stash); delete manifests stay unassigned (the record
    encodes null).  Returns the new next-row-id."""
    nxt = base
    for s in summaries:
        if _is_delete_manifest_summary(s):
            continue
        rows = _summary_int(s.get("rows-needing-ids"))
        if rows is None:  # pre-r12 summary: conservative full budget
            rows = (_summary_int(s.get("added-rows")) or 0) + (
                _summary_int(s.get("existing-rows")) or 0
            )
        first = _summary_int(s.get("first-row-id"))
        if first is not None:
            nxt = max(nxt, first + rows)
            continue
        s["first-row-id"] = nxt
        nxt += rows
    return nxt


def write_spec_manifest_list(
    mdir: str,
    snapshot_id: int,
    sequence_number: int,
    parent_snapshot_id,
    manifests: list[str],
    summaries: list[dict],
    store,
    codec: str = "null",
    format_version: int = 2,
) -> str:
    """Spec manifest list from native descriptors.  ``summaries`` are
    the native per-manifest summary dicts (they carry everything the
    record needs: counts, spec ids, delete flags, added-snapshot-id);
    the full native summaries also ride in the OCF stash for exact
    skip-pruning reconstruction."""
    recs = []
    for name, s in zip(manifests, summaries):
        is_delete = _is_delete_manifest_summary(s)
        spec_ids = s.get("spec-ids") or [0]
        if len(spec_ids) > 1:
            # a spec manifest declares ONE partition-spec-id in its
            # header — an external reader decodes every entry's
            # partition tuple under it.  write_spec_manifests splits
            # entries per spec id before reaching here; a multi-spec
            # summary slipping through would silently mis-decode, so
            # refuse loudly instead of picking spec_ids[0]
            raise ValueError(
                f"manifest {name} summary spans partition specs "
                f"{spec_ids}; spec manifests must be split per spec id"
            )
        rec = {
            "manifest_path": os.path.join(mdir, name),
            "manifest_length": s.get("manifest-length", 0),
            "partition_spec_id": spec_ids[0],
            "content": 1 if is_delete else 0,
            "sequence_number": s.get("sequence-number", sequence_number),
            "min_sequence_number": s.get("min-sequence-number", 0),
            "added_snapshot_id": s.get("added-snapshot-id", snapshot_id),
            "added_files_count": s.get("added-files", 0),
            "existing_files_count": s.get("existing-files", 0),
            "deleted_files_count": s.get("deleted-files", 0),
            "added_rows_count": s.get("added-rows", 0),
            "existing_rows_count": s.get("existing-rows", 0),
            "deleted_rows_count": 0,
            "partitions": None,
        }
        if format_version >= 3:
            # v3 row lineage (spec field 520): data manifests carry
            # their assigned starting row id (assign_first_row_ids at
            # commit); delete manifests are null per spec
            rec["first_row_id"] = (
                None if is_delete else _summary_int(s.get("first-row-id"))
            )
        recs.append(rec)
    name = f"snap-{snapshot_id}-{_uuid.uuid4().hex}.avro"
    stash = {
        "icepack.summaries": json.dumps(
            {m: s for m, s in zip(manifests, summaries)}, separators=(",", ":")
        ),
        "snapshot-id": str(snapshot_id),
        "parent-snapshot-id": str(parent_snapshot_id)
        if parent_snapshot_id is not None
        else "null",
        "sequence-number": str(sequence_number),
        "format-version": str(format_version),
    }
    buf = write_container(
        _manifest_list_schema(format_version),
        recs,
        _sync_for(name),
        extra_meta=stash,
        codec=codec,
    )
    store.write_bytes(store.join(mdir, name), buf)
    return name


def read_spec_manifest_list(mdir: str, name: str, store) -> list[dict]:
    """Spec manifest list → native descriptor dicts ({"manifest-path",
    **summary}), summaries from the OCF stash when present, else a
    conservative (never-skip) reconstruction from the spec record."""
    buf = store.read_bytes(store.join(mdir, name))
    _schema, recs, ocf_meta = read_container_with_meta(buf)
    stash = json.loads(ocf_meta.get("icepack.summaries", b"{}").decode() or "{}")
    out = []
    for r in recs:
        mname = os.path.basename(r["manifest_path"])
        s = stash.get(mname)
        if s is None:
            live = r.get("added_files_count", 0) + r.get("existing_files_count", 0)
            s = {
                "added-files": r.get("added_files_count", 0),
                "existing-files": r.get("existing_files_count", 0),
                "deleted-files": r.get("deleted_files_count", 0),
                "partition-summaries": {},
                "spec-ids": [r.get("partition_spec_id", 0)],
                # no stash → veto skip-pruning: unknown ranges must scan
                "unpartitioned-files": max(1, live),
                "null-partition-values": 0,
                "delete-content-files": live if r.get("content") == 1 else 0,
                "live-files": live,
                "live-bytes": 0,
                "distinct-partitions": live,
                # marks a conservative reconstruction (foreign manifest,
                # never trusted for skipping) so fsck doesn't flag its
                # placeholder values as drift
                "reconstructed": 1,
            }
            if r.get("first_row_id") is not None:
                # v3 row lineage survives a stash-less round trip: the
                # assignment is spec data, not a stash nicety
                s["first-row-id"] = r["first_row_id"]
        out.append(
            {
                "manifest-path": mname,
                "manifest-length": r.get("manifest_length", 0),
                **s,
            }
        )
    return out


# ----------------------------------------------- delete-file spec shaping


def is_spec_shaped_delete(e: DataFile) -> bool:
    """Whether a MOR delete parquet is ALREADY in its spec shape —
    judged by footer content, never by file name: position deletes
    carry the reserved field id 2147483546 on ``file_path``; equality
    deletes carry a field id on every identifier column."""
    import pyarrow.parquet as pq

    if e.content == "deletion-vectors":
        # a v3 DV blob in a Puffin container is never a v2 spec-shaped
        # parquet (and pq.read_schema on a .puffin raises ArrowInvalid)
        return False
    try:
        sch = pq.read_schema(e.path)
    except Exception:  # OSError or pyarrow.ArrowInvalid (non-parquet)
        return False
    if e.content == "position-deletes":
        try:
            md = sch.field("file_path").metadata or {}
        except KeyError:
            return False
        return md.get(b"PARQUET:field_id") == b"2147483546"
    return all(
        (f.metadata or {}).get(b"PARQUET:field_id") is not None for f in sch
    )


def rewrite_delete_file_spec(table, e: DataFile, keep_original: bool = False) -> DataFile:
    """Rewrite a native MOR delete parquet into its SPEC shape
    (position deletes: Spark-URI file_path → canonical raw path,
    sorted by (file_path, pos), reserved field ids
    2147483546/2147483545; equality deletes: identifier columns
    field-id-stamped).  Returns the entry pointing at the rewritten
    file.  The pre-rewrite file is deleted by default (a fresh DML
    write was never referenced by any committed manifest);
    ``keep_original=True`` preserves it — conversion of an EXISTING
    table must keep historical snapshots' native manifests readable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = e.path
    tbl = pq.read_table(src)
    if e.content == "position-deletes":
        paths = [canonical_file_path(p) for p in tbl.column("file_path").to_pylist()]
        poss = tbl.column("pos").to_pylist()
        order = sorted(range(len(paths)), key=lambda i: (paths[i], poss[i]))
        out = pa.table(
            [
                pa.array([paths[i] for i in order], pa.string()),
                pa.array([poss[i] for i in order], pa.int64()),
            ],
            schema=pa.schema(
                [
                    pa.field(
                        "file_path", pa.string(),
                        metadata={b"PARQUET:field_id": b"2147483546"},
                    ),
                    pa.field(
                        "pos", pa.int64(),
                        metadata={b"PARQUET:field_id": b"2147483545"},
                    ),
                ]
            ),
        )
    else:  # equality-deletes
        dschema = table.meta.schema_by_id(e.schema_id)
        fields, arrays = [], []
        for c in e.equality_columns:
            f_old = dschema.field_by_name(c)
            fid = f_old.id if f_old is not None else 0
            col = tbl.column(c)
            arrays.append(col.combine_chunks() if col.num_chunks > 1 else col)
            fields.append(
                pa.field(
                    c, tbl.schema.field(c).type,
                    metadata={b"PARQUET:field_id": str(fid).encode()},
                )
            )
        out = pa.table(arrays, schema=pa.schema(fields))
    dest = os.path.join(
        os.path.dirname(src), f"spec-{os.path.basename(src)}"
    )
    pq.write_table(out, dest)
    if not keep_original:
        os.remove(src)
    e.path = dest
    e.file_size_bytes = os.path.getsize(dest)
    return e
