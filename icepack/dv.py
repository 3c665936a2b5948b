"""Spark-side deletion-vector plumbing (Iceberg v3, docs/08 MOR story).

:mod:`icepack.roaring` is the pure-bytes codec; this module is the
distributed layer on top of it:

- :func:`dv_positions_df` — decode DV blobs into a ``(file_path, pos)``
  DataFrame IN EXECUTORS (one task per blob batch, Arrow-batched
  ``mapInPandas``): a table with thousands of deletion vectors never
  materializes its deleted positions on the driver.  The output feeds
  the same broadcast anti-join the v2 position-delete path uses.
- :func:`build_dv_blobs` — the reverse direction: a ``(file_path,
  pos)`` tombstone DataFrame grouped per target data file into framed
  ``deletion-vector-v1`` blob bytes, built by ``applyInPandas`` so the
  bitmap construction for a million files fans out across the cluster.
  Only the FINISHED blobs (roaring-compressed, ~KBs per file) travel
  to the driver for Puffin assembly — positions never do.

DV Puffin files live in the table's ``data/`` directory next to the
parquet they mask, so they are Spark/executor-reachable by plain path
exactly like the data files (the metadata ``store`` seam is for the
metadata tree, not the data dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Iceberg reserved field ids for position-delete identity
#: (spec "Reserved field IDs"): 2147483546 = file_path, 2147483545 = pos.
FILE_PATH_FIELD_ID = 2147483546
POS_FIELD_ID = 2147483545

#: Puffin blob type from the Iceberg v3 spec.
DV_BLOB_TYPE = "deletion-vector-v1"

#: Total serialized DV bytes under which :func:`dv_positions_df`
#: decodes on the DRIVER instead of planting a Python stage.  The DV
#: anti-join BROADCASTS the decoded positions anyway (they reach the
#: driver as a built hash relation regardless), so the gate only moves
#: a ~ms roaring decode across the boundary — and removes the ~0.5 s
#: fixed JVM↔Python stage latency the executor lane pays per scan
#: (guide §4: the boundary costs, not the bytes).  Past the gate —
#: where a broadcast would also stop being the right join — the
#: executor lane is unchanged.
import os as _os

DV_DRIVER_DECODE_MAX_BYTES = int(
    _os.environ.get("ICEPACK_DV_DRIVER_DECODE_MAX_BYTES", str(8 * 1024 * 1024))
)


def dv_positions_df(spark: SparkSession, entries) -> DataFrame:
    """Decode deletion-vector manifest entries → ``(file_path, pos)``.

    ``entries`` are ``DataFile`` rows with content ``deletion-vectors``
    (identity = (path, content_offset)).  Decoding happens in
    executors — or on the driver below
    ``DV_DRIVER_DECODE_MAX_BYTES`` total blob bytes (see above);
    ``file_path`` is the entry's ``referenced_data_file``
    (the raw manifest spelling of the target data file)."""
    refs = [
        (e.path, int(e.content_offset), int(e.content_size), e.referenced_data_file)
        for e in entries
    ]
    from .session import local_df

    if sum(r[2] for r in refs) <= DV_DRIVER_DECODE_MAX_BYTES:
        import pandas as pd

        from .roaring import read_dv_blob

        frames = []
        for puffin, off, ln, fp in refs:
            with open(puffin, "rb") as fh:
                fh.seek(off)
                data = fh.read(ln)
            pos = read_dv_blob(data)
            frames.append(
                pd.DataFrame({"file_path": fp, "pos": pos.astype("int64")})
            )
        if not frames:
            return spark.createDataFrame([], "file_path string, pos long")
        return spark.createDataFrame(
            pd.concat(frames, ignore_index=True), "file_path string, pos long"
        )

    sdf = local_df(
        spark, refs, "puffin string, offset long, length long, file_path string"
    )
    if len(refs) > 1:
        sdf = sdf.repartition(min(len(refs), 32))

    def _decode(batches):
        import pandas as pd

        from icepack.roaring import read_dv_blob

        for pdf in batches:
            for puffin, off, ln, fp in pdf.itertuples(index=False):
                with open(puffin, "rb") as fh:
                    fh.seek(int(off))
                    data = fh.read(int(ln))
                pos = read_dv_blob(data)
                yield pd.DataFrame(
                    {"file_path": fp, "pos": pos.astype("int64")}
                )

    return sdf.mapInPandas(_decode, "file_path string, pos long")


def write_dv_puffins(
    table, blobs, snapshot_id: int, max_puffin_bytes: int = 64 * 1024 * 1024
):
    """Collected ``build_dv_blobs`` rows → Puffin files on disk + their
    ``deletion-vectors`` manifest entries.

    Shared by the maintenance consolidation
    (:func:`icepack.maintenance.write_deletion_vectors`) and the v3 DML
    write path (:func:`icepack.dml._write_dv_entries`) so both produce
    byte-identical framing.  Only finished roaring blobs (~KBs/file)
    are in memory here; batches flush past ``max_puffin_bytes`` so one
    call over a million-file table writes a bounded series of container
    files rather than one unbounded buffer."""
    import os
    import uuid as _uuid

    from .manifest import DataFile
    from .puffin import write_puffin

    entries: list[DataFile] = []
    batch: list = []
    batch_bytes = 0

    def _flush():
        nonlocal batch, batch_bytes
        if not batch:
            return
        puffin = write_puffin(
            [
                {
                    "type": DV_BLOB_TYPE,
                    "fields": [POS_FIELD_ID],
                    "snapshot-id": snapshot_id,
                    "sequence-number": table.meta.last_sequence_number,
                    "data": r["blob"],
                    "properties": {
                        "referenced-data-file": r["file_path"],
                        "cardinality": str(r["cardinality"]),
                    },
                }
                for r in batch
            ]
        )
        # an add_files-adopted table may never have written a native
        # data/ dir (its parquet lives externally) — create it on
        # first DV write
        ddir = os.path.join(table.location, "data")
        os.makedirs(ddir, exist_ok=True)
        path = os.path.join(ddir, f"dv-{_uuid.uuid4().hex}.puffin")
        with open(path, "wb") as fh:
            fh.write(puffin)
        off = len(b"PFA1")
        for r in batch:
            entries.append(
                DataFile(
                    path=path,
                    status="added",
                    partition={},
                    spec_id=table.meta.default_spec_id,
                    schema_id=table.meta.current_schema_id,
                    record_count=int(r["cardinality"]),
                    file_size_bytes=len(puffin),
                    content="deletion-vectors",
                    referenced_data_file=r["file_path"],
                    content_offset=off,
                    content_size=len(r["blob"]),
                )
            )
            off += len(r["blob"])
        batch, batch_bytes = [], 0

    for r in sorted(blobs, key=lambda r: r["file_path"]):
        if batch_bytes + len(r["blob"]) > max_puffin_bytes and batch:
            _flush()
        batch.append(r)
        batch_bytes += len(r["blob"])
    _flush()
    return entries


def build_dv_blobs(tombstones: DataFrame) -> DataFrame:
    """``(file_path, pos)`` tombstones → one framed DV blob per file.

    Returns ``(file_path, blob binary, cardinality long)``; the group
    key is whatever spelling ``file_path`` already carries (callers
    canonicalize/join to raw manifest paths BEFORE grouping)."""

    def _to_blob(pdf):
        import numpy as np
        import pandas as pd

        from icepack.roaring import dv_blob_bytes

        pos = np.unique(pdf["pos"].to_numpy())
        return pd.DataFrame(
            {
                "file_path": [pdf["file_path"].iloc[0]],
                "blob": [dv_blob_bytes(pos)],
                "cardinality": [len(pos)],
            }
        )

    return tombstones.groupBy("file_path").applyInPandas(
        _to_blob, "file_path string, blob binary, cardinality long"
    )
