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

    def drop_table(self, name: str) -> None:
        import shutil

        shutil.rmtree(self._loc(name), ignore_errors=True)

    def list_tables(self, namespace: str = "") -> list[str]:
        base = os.path.join(self.warehouse, *namespace.split(".")) if namespace else self.warehouse
        out = []
        for root, dirs, _files in os.walk(base):
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
