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

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .table import IceTable


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = os.path.abspath(warehouse)
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
        if os.path.exists(os.path.join(loc, "metadata", "v1.metadata.json")):
            raise ValueError(f"table {name} already exists")
        return IceTable.create(self.spark, loc, schema, partition_by, properties)

    def load_table(self, name: str) -> IceTable:
        return IceTable.load(self.spark, self._loc(name))

    def table_exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._loc(name), "metadata"))

    def drop_table(self, name: str, purge: bool = False) -> None:
        """DROP TABLE.  Without ``purge`` the table directory moves to
        the warehouse trash so UNDROP can restore it within retention
        (docs/01-table-format-architecture.md:80: the snapshots array
        enables "Time Travel queries and UNDROP operations"); with
        ``purge`` it is deleted immediately."""
        import shutil
        import time as _time

        loc = self._loc(name)
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
