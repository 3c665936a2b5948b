"""Versioned SQL views over the warehouse (Iceberg VIEW spec).

The reference's lakehouse patterns define views over Iceberg tables
(docs/12-lakehouse-patterns.md:168-172 — the unified hot+cold
``CREATE VIEW``), and real multi-engine stacks persist them in the
PUBLIC Iceberg view spec: a ``view-metadata.json`` document holding
the full VERSION HISTORY of the definition — each version pins its
SQL representation(s), output schema, and timestamp, with a
version-log recording every current-version change.  A view is
"metadata time travel" for logic the way snapshots are for data.

This module realizes that spec shape on the same storage seam tables
use:

- layout mirrors tables: ``<location>/metadata/v<N>.metadata.json`` +
  ``version-hint.text``; commits go through ``create_exclusive`` (the
  put-if-absent CAS every table commit uses), so two concurrent
  REPLACEs linearize and the loser retries from the winner's state.
- each REPLACE appends a version (``versions`` + ``version-log``) and
  bumps ``current-version-id`` — old definitions stay queryable:
  ``view.toDF(version_id=1)`` runs the ORIGINAL SQL.
- the output schema of every version is resolved AT DEFINITION TIME
  (Iceberg requires a schema per view version — late-binding names
  with an early-bound contract) and stored in the metadata's
  ``schemas`` list; REPLACE refuses silently-breaking column drops
  unless ``allow_incompatible=True`` (the spec leaves evolution
  policy to the engine; refusing loudly matches this engine's
  DML posture).

Execution is Spark-native: the stored SQL runs through
``spark.sql(...)`` against whatever relations the session has
registered (warehouse tables register as temp views — SURVEY §3.2),
so Catalyst sees ONE composed plan; there is no view-side
materialization or caching layer.
"""

from __future__ import annotations

import json
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .metadata import IceSchema
from .session import local_df
from .storage import LOCAL, MetadataStore


class IceView:
    """Handle over a versioned view tree (load via :meth:`load`)."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        store: MetadataStore = LOCAL,
        resolver: Callable[[str], DataFrame] | None = None,
    ):
        self.spark = spark
        self.location = store.canonical(location)
        self.store = store
        #: how stored SQL becomes a DataFrame.  Default: ``spark.sql``
        #: (relations must be registered in the session); IceSQL passes
        #: its own SELECT path so view bodies resolve warehouse table
        #: names exactly like any other statement.
        self.resolver = resolver or spark.sql
        self._mdir = store.join(self.location, "metadata")
        self._version = 0
        self.meta: dict = {}
        self.refresh()

    # ------------------------------------------------------------ create

    @staticmethod
    def create(
        spark: SparkSession,
        location: str,
        sql: str,
        properties: dict | None = None,
        store: MetadataStore = LOCAL,
        dialect: str = "spark",
        resolver: Callable[[str], DataFrame] | None = None,
        extra_representations: list | None = None,
    ) -> "IceView":
        """CREATE VIEW: resolve the SQL's output schema now, write
        version 1.  Refuses a location that already holds a view.
        ``extra_representations``: [(dialect, sql)] alternates stored
        alongside (only the primary dialect's schema is resolved)."""
        mdir = store.join(store.canonical(location), "metadata")
        if store.exists(store.join(mdir, "version-hint.text")):
            raise ValueError(f"view already exists at {location}")
        schema = IceSchema.from_struct(
            (resolver or spark.sql)(sql).schema, schema_id=0
        )
        now = int(time.time() * 1000)
        meta = {
            "view-uuid": str(uuid.uuid4()),
            "format-version": 1,
            "location": store.canonical(location),
            "schemas": [schema.to_json()],
            "current-version-id": 1,
            "versions": [
                _version_json(1, now, 0, sql, dialect, extra_representations)
            ],
            "version-log": [{"timestamp-ms": now, "version-id": 1}],
            "properties": dict(properties or {}),
        }
        store.mkdirs(mdir)
        store.create_exclusive(
            store.join(mdir, "v1.metadata.json"), json.dumps(meta, indent=1)
        )
        store.replace_text(store.join(mdir, "version-hint.text"), "1")
        return IceView(spark, location, store, resolver=resolver)

    @staticmethod
    def load(
        spark: SparkSession,
        location: str,
        store: MetadataStore = LOCAL,
        resolver: Callable[[str], DataFrame] | None = None,
    ) -> "IceView":
        return IceView(spark, location, store, resolver=resolver)

    def refresh(self) -> "IceView":
        hint = self.store.join(self._mdir, "version-hint.text")
        if not self.store.exists(hint):
            raise FileNotFoundError(f"no view at {self.location}")
        self._version = int(self.store.read_text(hint).strip())
        self.meta = json.loads(
            self.store.read_text(
                self.store.join(self._mdir, f"v{self._version}.metadata.json")
            )
        )
        return self

    # ----------------------------------------------------------- queries

    def _version_entry(self, version_id: int | None) -> dict:
        vid = version_id or self.meta["current-version-id"]
        for v in self.meta["versions"]:
            if v["version-id"] == vid:
                return v
        raise ValueError(f"view has no version {vid}")

    def sql_for(
        self, version_id: int | None = None, dialect: str | None = None
    ) -> str:
        """The stored SQL of a version.  ``dialect`` selects among the
        version's representations (None = the first, i.e. primary)."""
        v = self._version_entry(version_id)
        for rep in v["representations"]:
            if rep["type"] == "sql" and (
                dialect is None or rep.get("dialect") == dialect
            ):
                return rep["sql"]
        raise ValueError(
            f"version {v['version-id']} has no SQL representation"
            + (f" for dialect {dialect!r}" if dialect else "")
        )

    def toDF(self, version_id: int | None = None) -> DataFrame:
        """Execute the (current or historical) definition."""
        return self.resolver(self.sql_for(version_id))

    def schema_for(self, version_id: int | None = None):
        v = self._version_entry(version_id)
        for s in self.meta["schemas"]:
            if s.get("schema-id") == v["schema-id"]:
                return IceSchema.from_json(s)
        raise ValueError(f"no schema {v['schema-id']} in view metadata")

    def versions(self) -> DataFrame:
        """Version history as a DataFrame (the DESCRIBE surface)."""
        rows = [
            (
                v["version-id"],
                v["timestamp-ms"],
                v["schema-id"],
                next(
                    r["sql"] for r in v["representations"] if r["type"] == "sql"
                ),
                v["version-id"] == self.meta["current-version-id"],
            )
            for v in self.meta["versions"]
        ]
        return local_df(self.spark, 
            rows,
            "version_id int, timestamp_ms long, schema_id int,"
            " sql string, is_current boolean",
        )

    # ----------------------------------------------------------- replace

    def replace(
        self,
        sql: str,
        dialect: str = "spark",
        allow_incompatible: bool = False,
        max_retries: int = 5,
        extra_representations: list | None = None,
    ) -> int:
        """CREATE OR REPLACE: append a NEW version (history retained)
        and point current-version-id at it.  CAS-committed: a
        concurrent replace forces a reload-and-retry, so version ids
        never collide and the log is linear.

        Unless ``allow_incompatible``, refuses a definition that DROPS
        or retypes a column the current version exposes — downstream
        readers bound to the view's contract would break silently."""
        new_schema = IceSchema.from_struct(self.resolver(sql).schema)
        for _ in range(max_retries):
            self.refresh()
            if not allow_incompatible:
                cur = self.schema_for()
                new_by_name = {
                    f.name: f.type for f in new_schema.fields
                }
                lost = [
                    f.name
                    for f in cur.fields
                    if new_by_name.get(f.name) != f.type
                ]
                if lost:
                    raise ValueError(
                        "replace would drop/retype columns the current "
                        f"version exposes: {lost}; pass "
                        "allow_incompatible=True to force"
                    )
            now = int(time.time() * 1000)
            vid = max(v["version-id"] for v in self.meta["versions"]) + 1
            sid = max(s["schema-id"] for s in self.meta["schemas"]) + 1
            new_schema.schema_id = sid
            meta = dict(self.meta)
            meta["schemas"] = self.meta["schemas"] + [new_schema.to_json()]
            meta["versions"] = self.meta["versions"] + [
                _version_json(vid, now, sid, sql, dialect, extra_representations)
            ]
            meta["version-log"] = self.meta["version-log"] + [
                {"timestamp-ms": now, "version-id": vid}
            ]
            meta["current-version-id"] = vid
            try:
                self.store.create_exclusive(
                    self.store.join(
                        self._mdir, f"v{self._version + 1}.metadata.json"
                    ),
                    json.dumps(meta, indent=1),
                )
            except FileExistsError:
                # lost the race.  If the winner wrote its doc but died
                # BEFORE moving the hint, every later replace would
                # loop forever on the same collision — finish the
                # winner's commit (the hint update is idempotent: it
                # just points at the already-written doc), then rebase.
                doomed = self.store.join(
                    self._mdir, f"v{self._version + 1}.metadata.json"
                )
                try:
                    json.loads(self.store.read_text(doomed))
                except Exception:
                    pass  # mid-write or unreadable: plain retry
                else:
                    hint = self.store.join(self._mdir, "version-hint.text")
                    if int(self.store.read_text(hint).strip()) < self._version + 1:
                        self.store.replace_text(hint, str(self._version + 1))
                continue
            self.store.replace_text(
                self.store.join(self._mdir, "version-hint.text"),
                str(self._version + 1),
            )
            self.refresh()
            return vid
        raise RuntimeError("view replace gave up after CAS retries")


def _version_json(
    vid: int,
    now: int,
    schema_id: int,
    sql: str,
    dialect: str,
    extra: list | None = None,
) -> dict:
    """One view version.  ``extra`` adds further SQL representations —
    the spec allows one per dialect, so a view can carry e.g. both a
    ``spark`` and a ``duckdb`` spelling and each engine resolves its
    own (the multi-engine story views exist for)."""
    reps = [{"type": "sql", "sql": sql, "dialect": dialect}]
    for d, q in extra or ():
        if d == dialect:
            raise ValueError(f"duplicate representation for dialect {d!r}")
        reps.append({"type": "sql", "sql": q, "dialect": d})
    return {
        "version-id": vid,
        "timestamp-ms": now,
        "schema-id": schema_id,
        "summary": {"engine-name": "icepack"},
        "representations": reps,
        "default-namespace": [],
    }
