"""Catalog: name → table-location resolution (SURVEY.md S2/S4/S5,
docs/04-catalog-systems.md).

A warehouse directory is the catalog (CREATE EXTERNAL VOLUME maps to
the warehouse path, docs/01:174-180); each table lives under
``<warehouse>/<namespace>/<name>`` with its own version-hint pointer —
the commit pointer, not the catalog, is the source of truth (matching
the reference's external-catalog mode).  A Glue/REST catalog
integration (docs/04:58-93) would implement this same interface over a
network service; out of scope offline, the seam is this class.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .storage import MetadataStore, store_for, unbind
from .table import IceTable


class Catalog:
    def __init__(
        self, spark: SparkSession, warehouse: str, store: MetadataStore | None = None
    ):
        #: metadata store for table metadata and named catalog objects
        #: (storage.py); local FS by default.  Directory-tree operations
        #: (trash/undrop, namespace walks) stay local-FS — a networked
        #: catalog (restcat.py, gluecat.py) replaces this class, not
        #: this store.
        self.store = store_for(warehouse, store)
        self.spark = spark
        self.warehouse = self.store.canonical(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)

    def _loc(self, name: str) -> str:
        # "db.schema.table" → warehouse/db/schema/table
        return os.path.join(self.warehouse, *name.split("."))

    def create_table(
        self,
        name: str,
        schema: T.StructType,
        partition_by: list[tuple[str, str]] | None = None,
        properties: dict | None = None,
    ) -> IceTable:
        loc = self._loc(name)
        # any surviving version file means the table exists (v1 alone
        # is not enough: the metadata-retention knob may have pruned it)
        if self.store.glob(self.store.join(loc, "metadata", "v*.metadata.json")):
            raise ValueError(f"table {name} already exists")
        return IceTable.create(
            self.spark, loc, schema, partition_by, properties, store=self.store
        )

    def load_table(self, name: str) -> IceTable:
        return IceTable.load(self.spark, self._loc(name), store=self.store)

    def table_exists(self, name: str) -> bool:
        mdir = self.store.join(self._loc(name), "metadata")
        return self.store.exists(mdir) or self.store.exists(
            self.store.join(mdir, "v1.metadata.json")
        )

    def drop_table(self, name: str, purge: bool = False) -> None:
        """DROP TABLE.  Without ``purge`` the table directory moves to
        the warehouse trash so UNDROP can restore it within retention
        (docs/01-table-format-architecture.md:80: the snapshots array
        enables "Time Travel queries and UNDROP operations"); with
        ``purge`` it is deleted immediately."""
        import shutil
        import time as _time

        loc = self._loc(name)
        unbind(loc)  # a table reborn at this path must re-resolve its store
        if purge:
            shutil.rmtree(loc, ignore_errors=True)
            return
        if not os.path.exists(loc):
            return
        trash = os.path.join(
            self.warehouse, ".trash", f"{name}-{int(_time.time() * 1000)}"
        )
        os.makedirs(os.path.dirname(trash), exist_ok=True)
        os.rename(loc, trash)

    def undrop_table(self, name: str) -> IceTable:
        """UNDROP TABLE: restore the most recently dropped copy."""
        tdir = os.path.join(self.warehouse, ".trash")
        candidates = sorted(
            (d for d in os.listdir(tdir) if d.rsplit("-", 1)[0] == name)
            if os.path.isdir(tdir)
            else []
        )
        if not candidates:
            raise ValueError(f"no dropped table {name!r} in trash")
        loc = self._loc(name)
        if os.path.exists(loc):
            raise ValueError(f"table {name!r} already exists; cannot undrop over it")
        os.makedirs(os.path.dirname(loc), exist_ok=True)
        os.rename(os.path.join(tdir, candidates[-1]), loc)
        return self.load_table(name)

    def purge_trash(self, older_than_ms: int | None = None) -> list[str]:
        """Empty the UNDROP trash (retention sweep — the external-
        catalog cleanup duty docs/01:80 assigns to tooling)."""
        import shutil
        import time as _time

        tdir = os.path.join(self.warehouse, ".trash")
        if not os.path.isdir(tdir):
            return []
        cutoff = older_than_ms if older_than_ms is not None else int(_time.time() * 1000)
        removed = []
        for d in sorted(os.listdir(tdir)):
            try:
                ts = int(d.rsplit("-", 1)[1])
            except (IndexError, ValueError):
                continue
            if ts <= cutoff:
                shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
                removed.append(d)
        return removed

    def list_tables(self, namespace: str = "") -> list[str]:
        base = os.path.join(self.warehouse, *namespace.split(".")) if namespace else self.warehouse
        out = []
        for root, dirs, _files in os.walk(base):
            if root == self.warehouse and ".trash" in dirs:
                dirs.remove(".trash")  # dropped-but-restorable tables
            if "metadata" in dirs and os.path.exists(
                os.path.join(root, "metadata", "version-hint.json")
            ):
                out.append(os.path.relpath(root, self.warehouse).replace(os.sep, "."))
                dirs.clear()
        return sorted(out)

    def register_view(self, name: str, view_name: str | None = None) -> None:
        """Expose a table to spark.sql as a temp view (the analyzer-side
        half of catalog resolution)."""
        df = self.load_table(name).toDF()
        df.createOrReplaceTempView(view_name or name.replace(".", "_"))

    # -- named catalog objects (docs/01:174-180, docs/04:58-93) -------------
    #
    # EXTERNAL VOLUME and CATALOG INTEGRATION are Snowflake's named
    # binding objects between tables and storage / external catalogs.
    # Offline they are persisted property bags the DDL can create, list
    # and describe, and that CREATE ICEBERG TABLE resolves by name —
    # the exact API seam where a networked implementation (S3 volume,
    # Glue/REST catalog client) would plug in.

    def _objects_dir(self, kind: str) -> str:
        return os.path.join(self.warehouse, "_objects", kind)

    def _put_object(self, kind: str, name: str, props: dict, replace: bool) -> dict:
        d = self._objects_dir(kind)
        self.store.mkdirs(d)
        p = self.store.join(d, f"{name}.json")
        if self.store.exists(p) and not replace:
            raise ValueError(f"{kind} {name!r} exists")
        self.store.write_json_atomic(p, props)
        return props

    def _get_object(self, kind: str, name: str) -> dict:
        p = self.store.join(self._objects_dir(kind), f"{name}.json")
        if not self.store.exists(p):
            raise ValueError(f"unknown {kind} {name!r}")
        return self.store.read_json(p)

    def _list_objects(self, kind: str) -> list[str]:
        d = self._objects_dir(kind)
        return sorted(
            os.path.basename(p)[:-5]
            for p in self.store.glob(self.store.join(d, "*.json"))
        )

    def create_external_volume(
        self, name: str, storage_locations: list[dict], replace: bool = False
    ) -> dict:
        """CREATE EXTERNAL VOLUME (docs/01:174-180): ``storage_locations``
        is a list of dicts (NAME / STORAGE_PROVIDER / STORAGE_BASE_URL /
        role ARNs...)."""
        return self._put_object(
            "external_volumes",
            name,
            {"name": name, "storage_locations": storage_locations},
            replace,
        )

    def get_external_volume(self, name: str) -> dict:
        return self._get_object("external_volumes", name)

    def list_external_volumes(self) -> list[str]:
        return self._list_objects("external_volumes")

    def create_catalog_integration(
        self, name: str, properties: dict, replace: bool = False
    ) -> dict:
        """CREATE CATALOG INTEGRATION (docs/04:58-93): Glue/REST
        connection property bag (CATALOG_SOURCE, CATALOG_URI, ...).
        Stored and resolvable; the networked client behind it is out of
        scope offline (SURVEY §2.1 S5)."""
        return self._put_object(
            "catalog_integrations", name, {"name": name, **properties}, replace
        )

    def get_catalog_integration(self, name: str) -> dict:
        return self._get_object("catalog_integrations", name)

    def list_catalog_integrations(self) -> list[str]:
        return self._list_objects("catalog_integrations")
