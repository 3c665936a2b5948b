"""Property-based round-trip sweeps for the spec-primary codec
(icepack/specio.py): randomized native TableMetadata documents and
manifest entries must survive dump→load / write→read EXACTLY — the
primary tree has no second copy to fall back on, so any lossy edge the
grid tests miss is a correctness hole.

Needs only an idle SparkSession (native type strings parse through
Spark's DDL parser) — no jobs run, which keeps hundreds of cases cheap.
"""

import datetime as dt
import json

from hypothesis import given, settings, strategies as st

from icepack.manifest import DataFile
from icepack.metadata import (
    IceSchema,
    NestedField,
    PartitionField,
    PartitionSpec,
    Snapshot,
    TableMetadata,
)
from icepack.specio import (
    dump_spec_metadata,
    load_spec_metadata,
    looks_like_spec_metadata,
    read_spec_manifest,
    write_spec_manifests,
)

_TYPES = [
    "boolean", "int", "bigint", "float", "double", "date",
    "timestamp", "timestamp_ntz", "string", "binary", "decimal(10,2)",
    "array<double>", "map<string,int>", "array<array<string>>",
    "struct<a:int,b:string>",
]

_names = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)


@st.composite
def _schemas(draw):
    n = draw(st.integers(1, 6))
    names = draw(
        st.lists(_names, min_size=n, max_size=n, unique=True)
    )
    fields = [
        NestedField(i + 1, names[i], draw(st.sampled_from(_TYPES)), draw(st.booleans()))
        for i in range(n)
    ]
    return IceSchema(0, fields)


@st.composite
def _metas(draw):
    schema = draw(_schemas())
    # partition over a spec-expressible column when one exists
    pfields = []
    cands = [
        f for f in schema.fields
        if f.type in (
            "int", "bigint", "string", "date", "timestamp_ntz", "decimal(10,2)"
        )
    ]
    if cands and draw(st.booleans()):
        f = draw(st.sampled_from(cands))
        tr = draw(
            st.sampled_from(
                {
                    "int": ["identity", "truncate[10]", "mmh3bucket[8]"],
                    "bigint": ["identity", "truncate[10]", "mmh3bucket[8]"],
                    "string": ["identity", "truncate[3]", "mmh3bucket[8]"],
                    "date": ["identity", "year", "month", "day"],
                    "timestamp_ntz": ["year", "month", "day", "hour"],
                    # decimal truncate: native value is the truncated
                    # UNSCALED long (spec arithmetic, r10)
                    "decimal(10,2)": ["truncate[10]"],
                }[f.type]
            )
        )
        name = f.name if tr == "identity" else f"{f.name}_{tr.split('[')[0]}"
        pfields.append(PartitionField(f.id, 1000, tr, name))
    specs = [PartitionSpec(0, pfields)]
    if pfields:
        specs.append(PartitionSpec(1, []))
    snaps = []
    n_snap = draw(st.integers(0, 3))
    parent = None
    for i in range(n_snap):
        sid = 1000 + i
        snaps.append(
            Snapshot(
                snapshot_id=sid,
                parent_snapshot_id=parent,
                timestamp_ms=1700000000000 + i,
                operation=draw(
                    st.sampled_from(["append", "overwrite", "delete", "replace", "rollback"])
                ),
                manifest_list=f"snap-{sid}.avro",
                schema_id=0,
                sequence_number=i + 1,
                summary={"added-data-files": str(i)},
            )
        )
        parent = sid
    refs = {}
    if snaps and draw(st.booleans()):
        refs["audit"] = {"snapshot-id": snaps[0].snapshot_id, "type": "branch"}
        refs["v1"] = {"snapshot-id": snaps[-1].snapshot_id, "type": "tag"}
    return TableMetadata(
        table_uuid="8c5f9e1a-0000-4000-8000-000000000001",
        location="/tmp/prop-table",
        last_column_id=max(f.id for f in schema.fields),
        schemas=[schema],
        current_schema_id=0,
        partition_specs=specs,
        default_spec_id=0,
        snapshots=snaps,
        current_snapshot_id=snaps[-1].snapshot_id if snaps else None,
        properties={"format.spec-primary": "true"},
        last_sequence_number=len(snaps),
        last_updated_ms=1700000000123,
        refs=refs,
    )


@settings(max_examples=120, deadline=None)
@given(_metas())
def test_metadata_dump_load_roundtrip(spark, meta):
    text = dump_spec_metadata(meta, "/tmp/prop-table/metadata")
    d = json.loads(text)
    assert looks_like_spec_metadata(d)
    back = load_spec_metadata(text)
    assert back.table_uuid == meta.table_uuid
    assert back.last_column_id == meta.last_column_id
    assert back.current_schema_id == meta.current_schema_id
    assert back.default_spec_id == meta.default_spec_id
    assert back.current_snapshot_id == meta.current_snapshot_id
    assert back.last_sequence_number == meta.last_sequence_number
    # schemas: field identity (id, name, type, required)
    for s0, s1 in zip(meta.schemas, back.schemas):
        assert [(f.id, f.name, f.type, f.required) for f in s0.fields] == [
            (f.id, f.name, f.type, f.required) for f in s1.fields
        ]
    # specs round-trip incl. transform spellings (bucket↔mmh3bucket)
    assert [sp.to_json() for sp in back.partition_specs] == [
        sp.to_json() for sp in meta.partition_specs
    ]
    # snapshots: identity, lineage, operation, sequence
    assert [
        (s.snapshot_id, s.parent_snapshot_id, s.operation, s.sequence_number,
         s.manifest_list, s.schema_id)
        for s in back.snapshots
    ] == [
        (s.snapshot_id, s.parent_snapshot_id, s.operation, s.sequence_number,
         s.manifest_list, s.schema_id)
        for s in meta.snapshots
    ]
    assert back.refs == meta.refs
    # second generation must be stable too (load→dump→load fixpoint)
    back2 = load_spec_metadata(dump_spec_metadata(back, "/tmp/prop-table/metadata"))
    assert back2.current_snapshot_id == back.current_snapshot_id
    assert [s.to_json() for s in back2.schemas] == [s.to_json() for s in back.schemas]


class _MemStoreShim:
    """Minimal store for write/read_spec_manifests (bytes in a dict)."""

    def __init__(self):
        self.objs = {}

    def join(self, *parts):
        return "/".join(parts)

    def write_bytes(self, path, data):
        self.objs[path] = data

    def read_bytes(self, path):
        return self.objs[path]


_PVALS = {
    "identity": st.one_of(st.none(), st.integers(-10**6, 10**6)),
}


@st.composite
def _entries(draw, meta):
    n = draw(st.integers(1, 8))
    schema = meta.schema
    out = []
    for i in range(n):
        part = {}
        for pf in meta.spec.fields:
            kind = pf.transform.split("[")[0]
            src = schema.field_by_id(pf.source_id)
            if draw(st.booleans()):
                part[pf.name] = None
            elif kind == "year":
                part[pf.name] = draw(st.integers(1970, 2100))
            elif kind == "month":
                part[pf.name] = f"{draw(st.integers(1970, 2100)):04d}-{draw(st.integers(1, 12)):02d}"
            elif kind == "day":
                part[pf.name] = draw(
                    st.dates(dt.date(1970, 1, 1), dt.date(2100, 1, 1))
                ).isoformat()
            elif kind == "hour":
                d0 = draw(st.dates(dt.date(1970, 1, 1), dt.date(2100, 1, 1)))
                part[pf.name] = f"{d0.isoformat()}-{draw(st.integers(0, 23)):02d}"
            elif kind == "truncate" and src.type == "string":
                part[pf.name] = draw(st.text("abc", min_size=0, max_size=3))
            elif kind == "truncate":
                w = int(pf.transform[len("truncate["):-1])
                part[pf.name] = draw(st.integers(-10**6, 10**6)) // w * w
            elif kind == "mmh3bucket":
                part[pf.name] = draw(st.integers(0, 7))
            elif kind == "identity" and src.type == "date":
                part[pf.name] = draw(
                    st.dates(dt.date(1970, 1, 1), dt.date(2100, 1, 1))
                ).isoformat()
            elif kind == "identity" and src.type == "string":
                part[pf.name] = draw(st.text("abcde", min_size=0, max_size=6))
            else:  # identity integral
                part[pf.name] = draw(st.integers(-10**6, 10**6))
        stats = {}
        for f in schema.fields:
            if f.type in ("int", "bigint") and draw(st.booleans()):
                lo = draw(st.integers(-10**9, 10**9))
                stats[f.name] = {
                    "min": lo,
                    "max": lo + draw(st.integers(0, 1000)),
                    "nulls": draw(st.integers(0, 5)),
                }
            elif f.type == "string" and draw(st.booleans()):
                stats[f.name] = {"min": "a", "max": "zz", "nulls": 0}
        out.append(
            DataFile(
                path=f"/tmp/prop-table/data/f{i}.parquet",
                status=draw(st.sampled_from(["added", "existing"])),
                partition=part,
                spec_id=meta.default_spec_id,
                schema_id=0,
                record_count=draw(st.integers(0, 10**6)),
                file_size_bytes=draw(st.integers(0, 10**9)),
                stats=stats,
                sequence_number=draw(st.integers(1, 50)),
            )
        )
    return out


@st.composite
def _meta_and_entries(draw):
    meta = draw(_metas())
    return meta, draw(_entries(meta))


@settings(max_examples=80, deadline=None)
@given(_meta_and_entries())
def test_manifest_write_read_roundtrip(spark, me):
    meta, entries = me
    store = _MemStoreShim()
    import copy

    original = copy.deepcopy(entries)
    written = write_spec_manifests("/m", entries, meta, store)
    got = []
    for name, _mlen, _summary in written:
        got.extend(read_spec_manifest("/m", name, store, meta))
    by_path_want = {e.path: e for e in original}
    by_path_got = {e.path: e for e in got}
    assert set(by_path_got) == set(by_path_want)
    for p, want in by_path_want.items():
        g = by_path_got[p]
        assert g.status == want.status
        assert g.record_count == want.record_count
        assert g.file_size_bytes == want.file_size_bytes
        assert g.sequence_number == want.sequence_number
        assert g.schema_id == want.schema_id
        assert g.spec_id == want.spec_id
        assert g.partition == want.partition, (want.partition, g.partition)
        # stats: integer bounds and null counts round-trip exactly;
        # string bounds too (full values, never truncated prefixes)
        for col, st_ in want.stats.items():
            assert col in g.stats
            for k in ("min", "max", "nulls"):
                if st_.get(k) is not None:
                    assert g.stats[col].get(k) == st_[k], (col, k)


# ------------------------------------------------ path canonicalization
# Two real bugs this round traced to path-spelling drift (ADVICE r6
# high; the percent-encoded tombstone resurrection) — property-pin the
# ONE canonicalizer every join now routes through.

from hypothesis import given, settings, strategies as st

_path_chars = st.text(
    alphabet=st.characters(
        codec="utf-8",
        blacklist_characters="/\x00%",
        blacklist_categories=("Cs",),
    ),
    min_size=1,
    max_size=12,
)
_posix_paths = st.lists(_path_chars, min_size=1, max_size=4).map(
    lambda segs: "/" + "/".join(segs)
)


@settings(max_examples=200, deadline=None)
@given(_posix_paths)
def test_canonical_idempotent_and_uri_roundtrip(p):
    from urllib.parse import quote

    from icepack.iceberg_import import canonical_file_path as canon

    # raw POSIX paths pass through untouched
    assert canon(p) == p
    # idempotent: canonicalizing a canonical path changes nothing
    assert canon(canon(p)) == canon(p)
    # every file:-URI spelling of the same path decodes back to it
    for spelled in (
        "file:" + quote(p, safe="/"),
        "file://" + quote(p, safe="/"),
        "file:///" + quote(p, safe="/").lstrip("/"),
        "file:" + quote(p, safe="/-._~!$&'()*+,;=:@"),
    ):
        assert canon(spelled) == p, spelled


@settings(max_examples=100, deadline=None)
@given(_posix_paths)
def test_canonical_raw_percent_is_literal(p):
    """A RAW path containing a literal %xx must NOT percent-decode
    (decoding it would alias two distinct files)."""
    from icepack.iceberg_import import canonical_file_path as canon

    raw = p + "%20x"
    assert canon(raw) == raw


# ---------------------------------------------- v3 row-id assignment


@st.composite
def _summary_lists(draw):
    """Randomized native manifest-summary lists: a mix of fresh data
    manifests (no assignment yet), carried manifests (assigned in some
    earlier commit), rewritten manifests (explicit per-entry ids,
    rows-needing-ids 0), and delete manifests."""
    n = draw(st.integers(min_value=0, max_value=12))
    out = []
    for _ in range(n):
        kind = draw(st.sampled_from(["fresh", "carried", "rewritten", "delete"]))
        added = draw(st.integers(min_value=0, max_value=10_000))
        existing = draw(st.integers(min_value=0, max_value=10_000))
        s = {"added-rows": added, "existing-rows": existing}
        if kind == "delete":
            live = draw(st.integers(min_value=1, max_value=50))
            s["delete-content-files"] = live
            s["live-files"] = live
        elif kind == "carried":
            s["first-row-id"] = draw(st.integers(min_value=0, max_value=10**9))
        elif kind == "rewritten":
            s["first-row-id"] = draw(st.integers(min_value=0, max_value=10**9))
            s["rows-needing-ids"] = 0
        else:  # fresh
            s["rows-needing-ids"] = draw(
                st.sampled_from([added + existing, added, None])
            )
            if s["rows-needing-ids"] is None:
                del s["rows-needing-ids"]
        out.append((kind, s))
    return out


@given(_summary_lists(), st.integers(min_value=0, max_value=10**9))
@settings(max_examples=300, deadline=None)
def test_assign_first_row_ids_invariants(kinds_summaries, base):
    """The v3 manifest-list assignment must be: (1) total on data
    manifests — every non-delete summary ends with a first-row-id;
    (2) stable — pre-assigned summaries keep their value verbatim;
    (3) non-overlapping — fresh assignments' [first, first+budget)
    ranges are disjoint from each other; (4) monotone — the returned
    next-row-id covers every assignment it made or observed;
    (5) idempotent — a second pass changes nothing."""
    import copy

    from icepack.specio import assign_first_row_ids

    summaries = [s for _k, s in kinds_summaries]
    pre = {
        i: s["first-row-id"]
        for i, s in enumerate(summaries)
        if "first-row-id" in s
    }
    nxt = assign_first_row_ids(summaries, base)

    fresh_ranges = []
    for i, (kind, s) in enumerate(kinds_summaries):
        if kind == "delete":
            assert "first-row-id" not in s  # deletes stay unassigned
            continue
        assert s.get("first-row-id") is not None  # (1) total
        if i in pre:
            assert s["first-row-id"] == pre[i]  # (2) stable
        else:
            budget = s.get(
                "rows-needing-ids", s["added-rows"] + s["existing-rows"]
            )
            fresh_ranges.append((s["first-row-id"], s["first-row-id"] + budget))
            assert s["first-row-id"] >= base
        assert nxt >= s["first-row-id"]  # (4) monotone cover
    fresh_ranges.sort()
    for (a1, b1), (a2, _b2) in zip(fresh_ranges, fresh_ranges[1:]):
        assert b1 <= a2  # (3) disjoint fresh ranges

    snapshot = copy.deepcopy(summaries)
    nxt2 = assign_first_row_ids(summaries, base)
    assert summaries == snapshot and nxt2 >= nxt  # (5) idempotent
