"""icepack — a PySpark-native lakehouse analytics engine.

Capability surface of the reference (`jrkinley/snowflake-apache-iceberg`,
an Iceberg-on-Snowflake documentation repo) rebuilt Spark-first:

- ``icepack.queries``  — the relational / window / streaming / LLM-ext
  operator battery (DataFrame + SQL, oracle-checked);
- ``icepack.table``    — the Iceberg-style table layer (snapshots, time
  travel, hidden partitioning, ACID commits, DML, maintenance);
- ``icepack.streaming``— Structured-Streaming ingestion into tables.
"""

from __future__ import annotations

__version__ = "0.1.0"


def __getattr__(name):
    # lazy exports: importing icepack must not drag pyspark in before
    # the caller has a session (and keeps the driver contract light)
    if name == "IceTable":
        from .table import IceTable

        return IceTable
    if name == "Catalog":
        from .catalog import Catalog

        return Catalog
    if name == "col":
        from .expr import col

        return col
    if name == "IceSQL":
        from .sql import IceSQL

        return IceSQL
    if name == "export_iceberg":
        from .iceberg_export import export_iceberg

        return export_iceberg
    if name == "read_iceberg":
        from .iceberg_import import read_iceberg

        return read_iceberg
    if name == "S3Store":
        from .s3store import S3Store

        return S3Store
    raise AttributeError(name)
