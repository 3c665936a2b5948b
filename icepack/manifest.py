"""Manifests, manifest lists, and per-file statistics.

The reference tracks data files in Avro manifests with per-column
min/max/null-count stats (docs/03-metadata-management.md:94-109,
docs/01-table-format-architecture.md:91-99); one manifest list per
snapshot summarizes manifests with partition ranges
(docs/03-metadata-management.md:77-92).

Our realization (stdlib-only, no Avro dependency):
- manifest file  = JSONL, one ``DataFile`` entry per line
  (``metadata/manifest-<uuid>.jsonl``);
- manifest list  = JSON array of manifest descriptors
  (``metadata/snap-<snapshot-id>.manifest-list.json``).

Stats are harvested from the Parquet footers the writer already
produced (``pyarrow.parquet.ParquetFile.metadata``) — a pure metadata
read, no data scan.  Driver-side loop here; at warehouse scale the
same harvest runs distributed (mapPartitions over file paths), and
manifests are themselves readable as DataFrames (spark.read.json) for
the metadata tables.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import math
import os
import uuid
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from .storage import LOCAL, MetadataStore


def _enc(v, widen: int = 0):
    """JSON-encode a stats/partition value order-preservingly.

    ``widen`` handles decimal.Decimal bounds (parquet footers hand
    decimal stats back as Decimal, which JSON can't carry): the value
    becomes a float, nudged one ULP toward -inf (widen=-1, a min
    bound) or +inf (widen=+1, a max bound) whenever the conversion is
    inexact — the published range may only ever WIDEN, so the pruner
    never drops a file whose true decimal bound was rounded past the
    predicate.  widen=0 (partition values) refuses inexact decimals
    outright (None → unknown, file kept)."""
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return None  # binary bounds: not tracked (keep-file semantics)
    if isinstance(v, float) and (v != v):  # NaN
        return None
    if isinstance(v, _decimal.Decimal):
        try:
            f = float(v)
        except (OverflowError, ValueError):
            return None
        if f != f or f in (float("inf"), float("-inf")):
            return None
        d = _decimal.Decimal(f)
        if d == v:
            return f
        if widen == 0:
            return None
        if widen < 0 and d > v:
            return math.nextafter(f, -math.inf)
        if widen > 0 and d < v:
            return math.nextafter(f, math.inf)
        return f
    return v


@dataclass
class DataFile:
    path: str  # absolute path
    status: str  # added | existing | deleted
    partition: dict  # {partition-field-name: value}
    spec_id: int
    schema_id: int
    record_count: int
    file_size_bytes: int
    stats: dict = field(default_factory=dict)  # {col: {min,max,nulls}}
    sequence_number: int = 0
    #: "data" or "equality-deletes" (merge-on-read delete files,
    #: docs/08-acid-transactions.md:112-116,167-187)
    content: str = "data"
    #: for equality-delete files: the identifier columns whose values
    #: the file contains
    equality_columns: list = field(default_factory=list)
    #: Iceberg v3 deletion-vector entries (content "deletion-vectors"):
    #: ``path`` is the shared Puffin file; these three locate THIS data
    #: file's blob inside it (spec fields referenced_data_file /
    #: content_offset / content_size_in_bytes).  None on every other
    #: content kind.  NOTE: DV entries are the one content kind whose
    #: ``path`` is NOT unique per entry — identity is
    #: (path, content_offset).
    referenced_data_file: str | None = None
    content_offset: int | None = None
    content_size: int | None = None
    #: Iceberg v3 row lineage: the file's starting ``_row_id``.  None =
    #: not yet resolved (readers inherit it from the manifest's
    #: field-520 assignment); an explicit value survives manifest
    #: rewrites verbatim so row ids stay stable across metadata-only
    #: maintenance.
    first_row_id: int | None = None

    def to_json(self) -> dict:
        d = {
            "path": self.path,
            "status": self.status,
            "partition": self.partition,
            "spec-id": self.spec_id,
            "schema-id": self.schema_id,
            "record-count": self.record_count,
            "file-size-bytes": self.file_size_bytes,
            "stats": self.stats,
            "sequence-number": self.sequence_number,
            "content": self.content,
            "equality-columns": self.equality_columns,
        }
        if self.referenced_data_file is not None:
            d["referenced-data-file"] = self.referenced_data_file
            d["content-offset"] = self.content_offset
            d["content-size-in-bytes"] = self.content_size
        if self.first_row_id is not None:
            d["first-row-id"] = self.first_row_id
        return d

    @staticmethod
    def from_json(d: dict) -> "DataFile":
        return DataFile(
            d["path"],
            d["status"],
            d.get("partition", {}),
            d.get("spec-id", 0),
            d.get("schema-id", 0),
            d["record-count"],
            d["file-size-bytes"],
            d.get("stats", {}),
            d.get("sequence-number", 0),
            d.get("content", "data"),
            d.get("equality-columns", []),
            d.get("referenced-data-file"),
            d.get("content-offset"),
            d.get("content-size-in-bytes"),
            d.get("first-row-id"),
        )


def harvest_stats(path: str) -> tuple[int, int, dict]:
    """(record_count, file_size, per-column {min,max,nulls}) from the
    parquet footer.  Missing/undecodable stats → column omitted (the
    pruner keeps files with unknown stats).

    Unknown is STICKY across row groups: once any row group lacks
    min/max (NaN-bearing doubles, stats disabled) or yields an
    unencodable/incomparable bound, the column's file-level range stays
    unknown.  Letting a later row group's values overwrite the unknown
    marker would publish a range NARROWER than the data — and a
    too-narrow range makes the pruner drop files containing matching
    rows (found by the manifest-skip conservativeness property test,
    which hit the same flaw in partition summaries)."""
    md = pq.ParquetFile(path).metadata
    ncols = md.num_columns
    agg: dict[str, dict] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(ncols):
            c = g.column(ci)
            name = c.path_in_schema
            if "." in name:  # nested: no flat stats
                continue
            s = c.statistics
            if s is None:
                bad.add(name)
                cur = agg.setdefault(name, {"min": None, "max": None, "nulls": None})
                cur["nulls"] = None
                continue
            cur = agg.setdefault(name, {"min": None, "max": None, "nulls": 0})
            try:
                # pyarrow raises ArrowNotImplementedError for stats it
                # can't logically decode (e.g. Spark's INT32/INT64-backed
                # decimals) — recover those from the RAW physical value
                # (the unscaled int) + the column's decimal logical type;
                # anything else stays unknown (file kept)
                has_mm = s.has_min_max
                mn, mx = (s.min, s.max) if has_mm else (None, None)
            except Exception:  # noqa: BLE001 — undecodable stats
                mn = mx = None
                has_mm = False
                try:
                    lt = s.logical_type
                    if (
                        s.has_min_max
                        and lt.type == "DECIMAL"
                        and isinstance(s.min_raw, int)
                    ):
                        sc = json.loads(lt.to_json())["scale"]
                        mn = _decimal.Decimal(s.min_raw).scaleb(-sc)
                        mx = _decimal.Decimal(s.max_raw).scaleb(-sc)
                        has_mm = True
                except Exception:  # noqa: BLE001 — raw form unusable too
                    has_mm = False
            if has_mm:
                cur["min"] = _merge(cur["min"], _enc(mn, widen=-1), True, name, bad)
                cur["max"] = _merge(cur["max"], _enc(mx, widen=1), False, name, bad)
            else:
                bad.add(name)
            if cur["nulls"] is not None:
                cur["nulls"] = (cur["nulls"] or 0) + (s.null_count or 0)
    for name in bad:
        agg[name]["min"] = agg[name]["max"] = None
    return md.num_rows, os.path.getsize(path), agg


def _merge(old, new, take_min: bool, key, bad: set):
    """Range-merge one bound; an unencodable value (None) or an
    incomparable pair marks ``key`` unknown in ``bad`` — the caller
    nulls the whole range at the end (sticky, never resurrected)."""
    if new is None:
        bad.add(key)
        return old
    if old is None:
        return new
    try:
        return min(old, new) if take_min else max(old, new)
    except TypeError:
        bad.add(key)
        return None


# -- manifest IO ------------------------------------------------------------


def write_manifest(
    metadata_dir: str, entries: list[DataFile], store: MetadataStore = LOCAL
) -> tuple[str, int]:
    """Write one manifest (JSONL); returns (path relative to metadata
    dir, byte length — recorded in the manifest list per the Iceberg
    manifest-list schema's ``manifest_length``).

    Manifests are immutable and uniquely named, so a plain atomic PUT
    (``replace_text``) suffices — no CAS needed below the version doc."""
    name = f"manifest-{uuid.uuid4().hex}.jsonl"
    text = "".join(json.dumps(e.to_json()) + "\n" for e in entries)
    store.replace_text(store.join(metadata_dir, name), text)
    return name, len(text.encode())


def read_manifest(
    metadata_dir: str, name: str, store: MetadataStore = LOCAL
) -> list[DataFile]:
    text = store.read_text(store.join(metadata_dir, name))
    return [DataFile.from_json(json.loads(line)) for line in text.splitlines() if line.strip()]


def write_manifest_list(
    metadata_dir: str,
    snapshot_id: int,
    manifest_names: list[str],
    manifests_meta: list[dict],
    store: MetadataStore = LOCAL,
) -> str:
    name = f"snap-{snapshot_id}.manifest-list.json"
    store.replace_text(
        store.join(metadata_dir, name),
        json.dumps(
            [
                {"manifest-path": m, **meta}
                for m, meta in zip(manifest_names, manifests_meta)
            ],
            indent=1,
        ),
    )
    return name


def read_manifest_list(
    metadata_dir: str, name: str, store: MetadataStore = LOCAL
) -> list[dict]:
    return json.loads(store.read_text(store.join(metadata_dir, name)))


def manifest_summary(entries: list[DataFile]) -> dict:
    """Partition-range + count summary stored in the manifest list —
    the phase-1 pruning input (docs/09-query-performance.md:19-31): a
    scan consults these ranges to SKIP whole manifests without reading
    their entries (table.plan_files / scanplan), so planning cost is
    O(candidate manifests), not O(all file entries).

    Skip-safety bookkeeping: ``spec-ids`` (a manifest is skippable only
    if the projected predicate excludes the ranges under EVERY spec its
    entries use), ``unpartitioned-files`` / ``null-partition-values``
    (entries the ranges can't describe — their presence vetoes the
    skip), and live file/byte/partition counts so a skipped manifest
    still contributes to scan-report totals."""
    parts: dict[str, dict] = {}
    part_bad: set[str] = set()
    added = existing = deleted = 0
    live = live_bytes = unpartitioned = nullvals = delete_content = 0
    tuples = set()
    spec_ids = set()
    for e in entries:
        if e.status == "added":
            added += 1
        elif e.status == "deleted":
            deleted += 1
        else:
            existing += 1
        if e.status != "deleted":
            live += 1
            live_bytes += e.file_size_bytes
            tuples.add(tuple(sorted((k, _enc(v)) for k, v in e.partition.items())))
            spec_ids.add(e.spec_id)
            if not e.partition:
                unpartitioned += 1
            # raw nulls AND values the ranges can't encode (binary, NaN)
            # both veto the skip — judged on the ENCODED value
            if any(_enc(v) is None for v in e.partition.values()):
                nullvals += 1
            if e.content != "data":
                delete_content += 1
        for k, v in e.partition.items():
            cur = parts.setdefault(k, {"min": None, "max": None})
            cur["min"] = _merge(cur["min"], _enc(v), True, k, part_bad)
            cur["max"] = _merge(cur["max"], _enc(v), False, k, part_bad)
    for k in part_bad:  # sticky unknown: mixed-type ranges prune nothing
        parts[k] = {"min": None, "max": None}
    return {
        "added-files": added,
        "existing-files": existing,
        "deleted-files": deleted,
        "partition-summaries": parts,
        "spec-ids": sorted(spec_ids),
        "unpartitioned-files": unpartitioned,
        "null-partition-values": nullvals,
        "delete-content-files": delete_content,
        "live-files": live,
        "live-bytes": live_bytes,
        "distinct-partitions": len(tuples),
    }
