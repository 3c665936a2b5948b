"""Table metadata model: schemas (stable column IDs), partition specs,
snapshots — the JSON metadata tree of the Iceberg-style table layer.

Mirrors the reference's metadata-file structure
(docs/01-table-format-architecture.md:67-80,
docs/03-metadata-management.md:53-75): format-version, table-uuid,
schemas[] with current-schema-id, partition-specs[] with
default-spec-id, snapshots[] with current-snapshot-id, properties.
Columns are tracked by stable IDs, not names
(docs/06-schema-evolution.md:55-73): rename keeps the ID, drop retires
it, add allocates a fresh one — so data files written under any schema
version remain readable under the current one (ID-based projection in
icepack/scan.py).

Everything here is driver-side pure Python: metadata files are a few
KB of JSON; the data path never touches this module.
"""

from __future__ import annotations

import json
import re
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import types as T

FORMAT_VERSION = 1

# -- type serde: Spark type <-> compact string ------------------------------

_ATOMIC = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
}

#: permitted widenings (docs/06-schema-evolution.md:138-152), keyed by
#: Spark simpleString names (LongType.simpleString() == "bigint")
PROMOTIONS = {
    ("int", "bigint"),
    ("int", "long"),
    ("float", "double"),
    ("int", "double"),
}


def type_to_str(t: T.DataType) -> str:
    return t.simpleString()


#: simpleString spellings (type_to_str emits these: LongType →
#: "bigint") — they MUST resolve without a JVM: the Python Data Source
#: plan/commit/schema runners parse table schemas in processes with no
#: SparkContext, and T._parse_datatype_string needs one (r13: every
#: "bigint" column silently forced the runner to boot a fresh local
#: Spark JVM, ~7 s each).
_ATOMIC.update(
    {
        "bigint": T.LongType(),
        "smallint": T.ShortType(),
        "tinyint": T.ByteType(),
        "void": T.NullType(),
    }
)


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (ignoring <...> and (...) nesting)."""
    out, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c in "<(":
            depth += 1
        elif c in ">)":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return out


def type_from_str(s: str) -> T.DataType:
    s = s.strip()
    if s in _ATOMIC:
        return _ATOMIC[s]
    if s == "time":
        # Iceberg `time` primitive (docs/06-schema-evolution.md:94-110):
        # microseconds since midnight.  Spark 4.1 has a TimeType but its
        # parquet writer rejects it (UNSUPPORTED_TIME_TYPE), so the
        # runtime representation is LongType micros — the same physical
        # encoding Iceberg uses on disk.  The field's metadata type
        # string stays "time" (NestedField.type is stored verbatim), so
        # the logical type round-trips through metadata while every
        # engine reads the column as int64 micros.
        return T.LongType()
    # decimal(p,s), array<...>, map<...>, struct<...> — parsed in pure
    # Python over the grammar type_to_str (simpleString) emits, so a
    # JVM-less runner process can resolve any schema this engine
    # writes; unknown spellings still fall through to Spark's parser
    # (which requires an active context).
    m = re.match(r"^decimal\((\d+),\s*(-?\d+)\)$", s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if s.startswith("array<") and s.endswith(">"):
        return T.ArrayType(type_from_str(s[6:-1]))
    if s.startswith("map<") and s.endswith(">"):
        k, v = _split_top(s[4:-1])
        return T.MapType(type_from_str(k), type_from_str(v))
    if s.startswith("struct<") and s.endswith(">"):
        body = s[7:-1]
        fields = []
        for part in _split_top(body) if body else []:
            name, _, ftype = part.partition(":")
            fields.append(T.StructField(name.strip(), type_from_str(ftype), True))
        return T.StructType(fields)
    return T._parse_datatype_string(s)


@dataclass
class NestedField:
    id: int
    name: str
    type: str  # compact string form
    required: bool = False

    def spark_type(self) -> T.DataType:
        return type_from_str(self.type)

    def to_json(self) -> dict:
        return {"id": self.id, "name": self.name, "type": self.type, "required": self.required}

    @staticmethod
    def from_json(d: dict) -> "NestedField":
        return NestedField(d["id"], d["name"], d["type"], d.get("required", False))


@dataclass
class IceSchema:
    schema_id: int
    fields: list[NestedField]

    def to_struct(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, f.spark_type(), not f.required) for f in self.fields]
        )

    def field_by_name(self, name: str) -> NestedField | None:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    def field_by_id(self, fid: int) -> NestedField | None:
        for f in self.fields:
            if f.id == fid:
                return f
        return None

    def to_json(self) -> dict:
        return {"schema-id": self.schema_id, "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(d: dict) -> "IceSchema":
        return IceSchema(d["schema-id"], [NestedField.from_json(f) for f in d["fields"]])

    @staticmethod
    def from_struct(struct: T.StructType, schema_id: int = 0, first_id: int = 1) -> "IceSchema":
        fields = []
        fid = first_id
        for sf in struct.fields:
            fields.append(NestedField(fid, sf.name, type_to_str(sf.dataType), not sf.nullable))
            fid += 1
        return IceSchema(schema_id, fields)


@dataclass
class PartitionField:
    source_id: int  # column id in the schema
    field_id: int  # partition field id (1000+)
    transform: str  # identity | year | month | day | hour | bucket[N] | truncate[W]
    name: str  # partition column name, e.g. "ts_day"

    def to_json(self) -> dict:
        return {
            "source-id": self.source_id,
            "field-id": self.field_id,
            "transform": self.transform,
            "name": self.name,
        }

    @staticmethod
    def from_json(d: dict) -> "PartitionField":
        return PartitionField(d["source-id"], d["field-id"], d["transform"], d["name"])


@dataclass
class PartitionSpec:
    spec_id: int
    fields: list[PartitionField]

    def to_json(self) -> dict:
        return {"spec-id": self.spec_id, "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(d: dict) -> "PartitionSpec":
        return PartitionSpec(d["spec-id"], [PartitionField.from_json(f) for f in d["fields"]])

    @property
    def is_unpartitioned(self) -> bool:
        return not self.fields


@dataclass
class Snapshot:
    snapshot_id: int
    parent_snapshot_id: int | None
    timestamp_ms: int
    operation: str  # append | overwrite | delete | replace
    manifest_list: str  # path relative to table location
    schema_id: int
    sequence_number: int
    summary: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "snapshot-id": self.snapshot_id,
            "parent-snapshot-id": self.parent_snapshot_id,
            "timestamp-ms": self.timestamp_ms,
            "operation": self.operation,
            "manifest-list": self.manifest_list,
            "schema-id": self.schema_id,
            "sequence-number": self.sequence_number,
            "summary": self.summary,
        }

    @staticmethod
    def from_json(d: dict) -> "Snapshot":
        return Snapshot(
            d["snapshot-id"],
            d.get("parent-snapshot-id"),
            d["timestamp-ms"],
            d["operation"],
            d["manifest-list"],
            d["schema-id"],
            d["sequence-number"],
            d.get("summary", {}),
        )


@dataclass
class SortField:
    """One column of a sort order (Iceberg `sort-orders` spec shape:
    source column ID + direction + null ordering; transform fixed at
    identity — transform sorts can reuse the partition transforms)."""

    source_id: int
    direction: str = "asc"  # "asc" | "desc"
    null_order: str = "nulls-first"

    def to_json(self) -> dict:
        return {
            "source-id": self.source_id,
            "direction": self.direction,
            "null-order": self.null_order,
        }

    @staticmethod
    def from_json(d: dict) -> "SortField":
        return SortField(d["source-id"], d.get("direction", "asc"), d.get("null-order", "nulls-first"))


@dataclass
class SortOrder:
    """Named write order (docs/03-metadata-management.md:53-75 lists
    sort orders among the metadata-file fields).  order_id 0 is the
    Iceberg-reserved "unsorted" order."""

    order_id: int
    fields: list[SortField] = field(default_factory=list)

    def to_json(self) -> dict:
        return {"order-id": self.order_id, "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(d: dict) -> "SortOrder":
        return SortOrder(d["order-id"], [SortField.from_json(f) for f in d.get("fields", [])])


UNSORTED_ORDER = SortOrder(0, [])


@dataclass
class TableMetadata:
    table_uuid: str
    location: str
    last_column_id: int
    schemas: list[IceSchema]
    current_schema_id: int
    partition_specs: list[PartitionSpec]
    default_spec_id: int
    snapshots: list[Snapshot]
    current_snapshot_id: int | None
    properties: dict
    last_sequence_number: int = 0
    last_updated_ms: int = 0
    format_version: int = FORMAT_VERSION
    #: named refs (Iceberg v2, docs/05-snapshots-time-travel.md:141-158):
    #: {name: {"snapshot-id": int, "type": "tag" | "branch"}}.  The main
    #: lineage is implicit (current-snapshot-id); refs never move unless
    #: explicitly advanced (branch commit / fast-forward).
    refs: dict = field(default_factory=dict)
    #: write sort orders (docs/03-metadata-management.md:53-75); id 0 =
    #: unsorted.  The default order is applied by the append write path
    #: and re-applied by compaction (auto-clustering, docs/09:156-168).
    sort_orders: list = field(default_factory=lambda: [UNSORTED_ORDER])
    default_sort_order_id: int = 0
    #: Iceberg StatisticsFile entries (spec ``statistics`` field): one
    #: dict per snapshot with a Puffin stats file —
    #: {"snapshot-id", "statistics-path", "file-size-in-bytes",
    #: "file-footer-size-in-bytes", "blob-metadata": [...]}.  Kept as
    #: plain spec-shaped dicts so both the native and spec codecs carry
    #: them verbatim.
    statistics: list = field(default_factory=list)
    #: Iceberg partition-statistics entries (spec
    #: ``partition-statistics`` field): one dict per snapshot with a
    #: partition-stats parquet — {"snapshot-id", "statistics-path",
    #: "file-size-in-bytes"}.  Spec-shaped dicts, carried verbatim.
    partition_statistics: list = field(default_factory=list)

    # -- accessors ----------------------------------------------------------

    @property
    def sort_order(self) -> SortOrder:
        for o in self.sort_orders:
            if o.order_id == self.default_sort_order_id:
                return o
        return UNSORTED_ORDER

    @property
    def schema(self) -> IceSchema:
        return next(s for s in self.schemas if s.schema_id == self.current_schema_id)

    def schema_by_id(self, sid: int) -> IceSchema:
        return next(s for s in self.schemas if s.schema_id == sid)

    @property
    def spec(self) -> PartitionSpec:
        return next(s for s in self.partition_specs if s.spec_id == self.default_spec_id)

    def spec_by_id(self, sid: int) -> PartitionSpec:
        return next(s for s in self.partition_specs if s.spec_id == sid)

    @property
    def current_snapshot(self) -> Snapshot | None:
        if self.current_snapshot_id is None:
            return None
        return next(s for s in self.snapshots if s.snapshot_id == self.current_snapshot_id)

    def snapshot_by_id(self, sid: int) -> Snapshot | None:
        for s in self.snapshots:
            if s.snapshot_id == sid:
                return s
        return None

    def main_ancestry_ids(self) -> set:
        """Snapshot ids on MAIN's parent chain (current → root)."""
        out: set = set()
        s = self.current_snapshot
        while s is not None and s.snapshot_id not in out:
            out.add(s.snapshot_id)
            s = (
                self.snapshot_by_id(s.parent_snapshot_id)
                if s.parent_snapshot_id is not None
                else None
            )
        return out

    def snapshot_as_of(self, timestamp_ms: int) -> Snapshot | None:
        """Latest MAIN-ancestry snapshot with timestamp-ms <= requested
        (docs/05-snapshots-time-travel.md:57-79).  Restricted to main's
        parent chain: branch commits (WAP staging, open multi-statement
        transactions) carry timestamps too, and resolving into them
        would leak rows nobody has published — a branch is readable
        only by NAME (``as_of(ref=...)``), never by accident of time."""
        anc = self.main_ancestry_ids()
        eligible = [
            s
            for s in self.snapshots
            if s.timestamp_ms <= timestamp_ms and s.snapshot_id in anc
        ]
        return max(eligible, key=lambda s: s.timestamp_ms) if eligible else None

    def ref(self, name: str) -> dict:
        if name not in self.refs:
            raise ValueError(f"unknown ref {name!r} (have: {sorted(self.refs)})")
        return self.refs[name]

    def copy_with(self, **overrides) -> "TableMetadata":
        """New metadata version = previous + overrides; every field not
        overridden carries forward (so adding a metadata field can never
        be silently dropped by a commit path)."""
        import dataclasses

        return dataclasses.replace(self, **overrides)

    # -- serde --------------------------------------------------------------

    def to_json(self) -> dict:
        return {
            "format-version": self.format_version,
            "table-uuid": self.table_uuid,
            "location": self.location,
            "last-column-id": self.last_column_id,
            "last-sequence-number": self.last_sequence_number,
            "last-updated-ms": self.last_updated_ms,
            "schemas": [s.to_json() for s in self.schemas],
            "current-schema-id": self.current_schema_id,
            "partition-specs": [s.to_json() for s in self.partition_specs],
            "default-spec-id": self.default_spec_id,
            "snapshots": [s.to_json() for s in self.snapshots],
            "current-snapshot-id": self.current_snapshot_id,
            "properties": self.properties,
            "refs": self.refs,
            "sort-orders": [o.to_json() for o in self.sort_orders],
            "default-sort-order-id": self.default_sort_order_id,
            "statistics": self.statistics,
            "partition-statistics": self.partition_statistics,
        }

    @staticmethod
    def from_json(d: dict) -> "TableMetadata":
        return TableMetadata(
            table_uuid=d["table-uuid"],
            location=d["location"],
            last_column_id=d["last-column-id"],
            schemas=[IceSchema.from_json(s) for s in d["schemas"]],
            current_schema_id=d["current-schema-id"],
            partition_specs=[PartitionSpec.from_json(s) for s in d["partition-specs"]],
            default_spec_id=d["default-spec-id"],
            snapshots=[Snapshot.from_json(s) for s in d["snapshots"]],
            current_snapshot_id=d["current-snapshot-id"],
            properties=d.get("properties", {}),
            last_sequence_number=d.get("last-sequence-number", 0),
            last_updated_ms=d.get("last-updated-ms", 0),
            format_version=d.get("format-version", FORMAT_VERSION),
            refs=d.get("refs", {}),
            sort_orders=[SortOrder.from_json(o) for o in d.get("sort-orders", [])]
            or [UNSORTED_ORDER],
            default_sort_order_id=d.get("default-sort-order-id", 0),
            statistics=d.get("statistics", []),
            partition_statistics=d.get("partition-statistics", []),
        )

    def dumps(self) -> str:
        return json.dumps(self.to_json(), indent=1)

    @staticmethod
    def loads(s: str) -> "TableMetadata":
        return TableMetadata.from_json(json.loads(s))

    @staticmethod
    def new(location: str, schema: IceSchema, spec: PartitionSpec, properties: dict | None = None) -> "TableMetadata":
        return TableMetadata(
            table_uuid=str(uuid.uuid4()),
            location=location,
            last_column_id=max((f.id for f in schema.fields), default=0),
            schemas=[schema],
            current_schema_id=schema.schema_id,
            partition_specs=[spec],
            default_spec_id=spec.spec_id,
            snapshots=[],
            current_snapshot_id=None,
            properties=dict(properties or {}),
            last_updated_ms=int(time.time() * 1000),
        )
