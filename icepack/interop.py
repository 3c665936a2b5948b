"""Multi-engine snapshot export (SURVEY.md docs/11 parity,
docs/11-multi-engine-compatibility.md:16-42).

The docs' interop story is that an Iceberg table is READABLE BY ANY
ENGINE because the table is just metadata over parquet.  The inbound
direction already exists (``add_files`` adopts DuckDB-written parquet,
tests/test_interop.py); this module is the outbound direction:
:func:`duckdb_snapshot_sql` renders any snapshot — including one with
live merge-on-read delete files and schema-evolved (renamed/widened)
columns — as ONE self-contained DuckDB SQL string over the raw storage
files.  No icepack code runs on the consumer side: the SQL embeds the
file lists, the per-schema-version column mappings (Iceberg's
ID-based evolution, docs/06:75-91), and the sequence-number-scoped
delete anti-joins (docs/08:167-187).  What Spark's scan path does with
DataFrames, the export does with SQL — same semantics, second engine.

Correspondence (kept in lockstep with table.py `_read_with_deletes`):
- position deletes:  Spark joins on (``_metadata.file_path``,
  ``_metadata.row_index``); the SQL uses ``filename=true,
  file_row_number=true`` and matches stored spellings through an
  inline (spelling → raw) VALUES map covering raw paths and the
  percent-encoded ``file:`` URI forms Spark writes.
- equality deletes: anti-join on the delete file's equality columns,
  null-safe (``IS NOT DISTINCT FROM``), matching Spark's null-safe
  ``left_anti`` on column names.
- sequencing: a delete file applies only to data files with a LOWER
  commit sequence number — rows appended after the delete never match.
"""

from __future__ import annotations

from .table import IceTable
from .metadata import Snapshot


#: max deletion-vector positions a self-contained SQL render will
#: inline as VALUES.  PAST THE CAP THE RENDER REFUSES LOUDLY (raises
#: ValueError naming the remedy) — it never silently truncates: a
#: truncated mask would resurrect deleted rows in the external engine,
#: which is a correctness failure, not a degraded mode.  Hot tables
#: should ``rewrite_position_deletes()`` first so the render reads the
#: tombstones by path instead of inlining them.
DV_RENDER_MAX_POSITIONS = 200_000


def _sql_list(paths: list[str]) -> str:
    inner = ", ".join("'" + p.replace("'", "''") + "'" for p in paths)
    return f"[{inner}]"


def _ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def duckdb_snapshot_sql(
    table: IceTable, snapshot: Snapshot | None = None
) -> str:
    """Render a snapshot as one DuckDB query over the raw parquet files.

    Returns SQL producing exactly ``table.toDF(snapshot=...)`` —
    row-for-row, current-schema column names — runnable by any DuckDB
    (or, with trivial dialect swaps, Trino/ClickHouse) that can reach
    the storage paths."""
    snap = snapshot or table.meta.current_snapshot
    current = table.meta.schema
    all_live = table.live_files(snap, content="all")
    data = [f for f in all_live if f.content == "data"]
    deletes = [
        f
        for f in all_live
        if f.content in ("equality-deletes", "position-deletes")
    ]
    # v3 deletion-vectors: DuckDB cannot read Puffin, so the render
    # DECODES each blob here and inlines the (raw data path, pos)
    # pairs as VALUES.  This is the export/oracle leg only — bounded
    # and refused past a cap (a table that hot should export via
    # rewrite_position_deletes() back to parquet tombstones first).
    dv_pairs: list[tuple[str, int]] = []
    dv_targets: set[str] = set()
    dv_entries = [f for f in all_live if f.content == "deletion-vectors"]
    if dv_entries:
        from .roaring import read_dv_blob

        for e in dv_entries:
            with open(e.path, "rb") as fh:
                fh.seek(int(e.content_offset))
                blob = fh.read(int(e.content_size))
            dv_targets.add(e.referenced_data_file)
            dv_pairs.extend(
                (e.referenced_data_file, int(p)) for p in read_dv_blob(blob)
            )
            if len(dv_pairs) > DV_RENDER_MAX_POSITIONS:
                raise ValueError(
                    f"snapshot has >{DV_RENDER_MAX_POSITIONS} "
                    "deletion-vector positions — too large to inline in a "
                    "self-contained SQL render; run "
                    "rewrite_position_deletes() to fold the DVs into "
                    "parquet tombstones (which the render reads by path) "
                    "and export that snapshot"
                )
    if not data:
        cols = ", ".join(
            f"NULL AS {_ident(f.name)}" for f in current.fields
        )
        return f"SELECT {cols} WHERE FALSE"

    # group data files exactly like the Spark scan: by (schema version,
    # set of applicable delete files)
    groups: dict[tuple[int, tuple[str, ...]], list] = {}
    for f in data:
        applicable = tuple(
            sorted(
                d.path for d in deletes if f.sequence_number < d.sequence_number
            )
        )
        groups.setdefault((f.schema_id, applicable), []).append(f)
    by_path = {d.path: d for d in deletes}

    parts = []
    for (sid, applicable), group in sorted(groups.items()):
        old = table.meta.schema_by_id(sid)
        sel = []
        for cf in current.fields:
            of = old.field_by_id(cf.id)
            duck_type = _duck_type(cf.spark_type().simpleString())
            if of is None:  # column added after these files were written
                sel.append(f"CAST(NULL AS {duck_type}) AS {_ident(cf.name)}")
            elif of.name != cf.name or of.type != cf.type:
                # ID-based rename and/or widening: metadata-only in
                # Iceberg, a SELECT alias/cast for any other engine
                sel.append(
                    f"CAST({_ident(of.name)} AS {duck_type}) AS {_ident(cf.name)}"
                )
            else:
                sel.append(_ident(cf.name))
        pos_paths = [
            p for p in applicable if by_path[p].content == "position-deletes"
        ]
        group_dv = dv_targets & {f.path for f in group}
        need_pos = bool(pos_paths) or bool(group_dv)
        opts = ", filename=true, file_row_number=true" if need_pos else ""
        q = (
            f"SELECT {', '.join(sel)}\n"
            f"FROM read_parquet({_sql_list([f.path for f in group])}{opts}) AS d"
        )
        conds = []
        if pos_paths:
            # Native MOR delete files store Spark's _metadata.file_path
            # URI — PERCENT-ENCODED ('file:/a/sp%20ace/...'); a plain
            # 'file:' || filename concat never matches a spaced path
            # and the render would resurrect deleted rows.  Spec-
            # primary tables and adopted foreign trees store canonical
            # RAW paths instead, and a tree can hold BOTH.  So the
            # match goes through an inline (spelling → raw) VALUES map
            # built from the group's known data files: each file
            # contributes its raw spelling and its percent-encoded
            # Spark URI — every spelling the engine ever writes, decoded
            # in Python where encoding rules are exact, not in SQL.
            from urllib.parse import quote

            vals = []
            # Java's URI encoder keeps more chars literal than urllib's
            # default ('+', '=', ...) — emit both encodings so either
            # writer's spelling matches; duplicate spellings dedupe.
            java_safe = "/-._~!$&'()*+,;=:@"
            for f in group:
                raw = f.path.replace("'", "''")
                spellings = {
                    raw,
                    ("file:" + quote(f.path, safe="/")).replace("'", "''"),
                    ("file:" + quote(f.path, safe=java_safe)).replace("'", "''"),
                }
                vals.extend(f"('{sp}', '{raw}')" for sp in sorted(spellings))
            conds.append(
                "NOT EXISTS (SELECT 1 FROM "
                f"read_parquet({_sql_list(pos_paths)}) AS pd\n"
                f"    JOIN (VALUES {', '.join(vals)}) AS pv(spelling, raw)"
                " ON pd.file_path = pv.spelling\n"
                "    WHERE pv.raw = d.filename"
                " AND pd.pos = d.file_row_number)"
            )
        if group_dv:
            # DV targets are raw manifest paths — exactly what DuckDB's
            # ``filename`` column yields for local files, so no
            # spelling map is needed on this arm
            pair_vals = ", ".join(
                f"('{fp.replace(chr(39), chr(39) * 2)}', {p})"
                for fp, p in dv_pairs
                if fp in group_dv
            )
            if pair_vals:  # 0-cardinality foreign blobs: no condition
                conds.append(
                    "NOT EXISTS (SELECT 1 FROM "
                    f"(VALUES {pair_vals}) AS dv(fp, p)\n"
                    "    WHERE dv.fp = d.filename"
                    " AND dv.p = d.file_row_number)"
                )
        # equality deletes key on FIELD IDs: the delete file stores the
        # names current at delete time; the data side `d` exposes this
        # GROUP's schema-version names — resolve both through the id.
        # A field the group's files predate reads as NULL on the data
        # side (null-safe compare handles it).
        eq_groups: dict[tuple, list[str]] = {}
        for p in applicable:
            dd = by_path[p]
            if dd.content == "equality-deletes":
                dschema = table.meta.schema_by_id(dd.schema_id)
                resolved = []
                for c in dd.equality_columns:
                    f_old = dschema.field_by_name(c)
                    f_grp = old.field_by_id(f_old.id) if f_old else None
                    resolved.append((c, f_grp.name if f_grp else None))
                eq_groups.setdefault(tuple(resolved), []).append(p)
        for eq_map, paths in sorted(eq_groups.items()):
            on = " AND ".join(
                f"ed.{_ident(dc)} IS NOT DISTINCT FROM "
                + (f"d.{_ident(gc)}" if gc is not None else "NULL")
                for dc, gc in eq_map
            )
            conds.append(
                "NOT EXISTS (SELECT 1 FROM "
                f"read_parquet({_sql_list(paths)}) AS ed\n    WHERE {on})"
            )
        if conds:
            q += "\nWHERE " + "\n  AND ".join(conds)
        parts.append(q)
    return "\nUNION ALL BY NAME\n".join(parts)


def _duck_type(spark_simple: str) -> str:
    """DuckDB spelling of a Spark simpleString type (scalar subset used
    by table schemas; extend as schemas grow)."""
    s = spark_simple.lower()
    m = {
        "bigint": "BIGINT",
        "int": "INTEGER",
        "smallint": "SMALLINT",
        "tinyint": "TINYINT",
        "double": "DOUBLE",
        "float": "FLOAT",
        "string": "VARCHAR",
        "boolean": "BOOLEAN",
        "date": "DATE",
        "timestamp": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP",
        "binary": "BLOB",
    }
    if s in m:
        return m[s]
    if s.startswith("decimal"):
        return "DECIMAL" + s[7:]
    if s.startswith("array<"):
        return _duck_type(s[6:-1]) + "[]"
    raise NotImplementedError(f"no DuckDB mapping for type {spark_simple!r}")
