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

#: Decoded-CARDINALITY companion gate (r13 verdict: roaring run
#: containers compress brutally well, so a few serialized bytes can
#: decode to millions of positions — the bytes gate alone under-counts
#: what the driver would materialize).  The blob cardinality is pinned
#: in each DV entry's ``record_count`` at write time, so the check is
#: exact and free; an entry with no usable count fails the gate.
DV_DRIVER_DECODE_MAX_ROWS = int(
    _os.environ.get("ICEPACK_DV_DRIVER_DECODE_MAX_ROWS", str(4_000_000))
)

#: Row bound under which DV BITMAP CONSTRUCTION (the reverse direction:
#: tombstone rows → roaring blobs) may run driver-side.  The metadata
#: gives an exact upper bound before any job runs (delete-file
#: record counts / planned-file record counts), so the gate never
#: guesses; past it the ``build_dv_blobs`` applyInPandas lane runs
#: unchanged — at 100 TB tombstone volumes that distributed lane is
#: the only correct shape, the driver lane exists because a Python
#: executor stage costs ~0.5 s of fixed boundary latency that dwarfs
#: the ~ms bitmap build at metadata-scale inputs (guide §4).
DV_DRIVER_BUILD_MAX_ROWS = int(
    _os.environ.get("ICEPACK_DV_DRIVER_BUILD_MAX_ROWS", str(4_000_000))
)


def driver_decodable(entries) -> bool:
    """True when the DV entries are small enough (serialized bytes AND
    decoded cardinality) to decode driver-side."""
    total_bytes = 0
    total_rows = 0
    for e in entries:
        total_bytes += int(e.content_size or 0)
        rc = e.record_count
        if rc is None or int(rc) <= 0:
            return False  # unknown cardinality: stay in the executor lane
        total_rows += int(rc)
    return (
        total_bytes <= DV_DRIVER_DECODE_MAX_BYTES
        and total_rows <= DV_DRIVER_DECODE_MAX_ROWS
    )


def dv_positions_pandas(entries):
    """Driver-side decode of DV entries → one pandas ``(file_path,
    pos)`` frame, or None when the entries exceed the driver gates.
    The callers that would broadcast the decoded positions anyway
    (DV-masked scans, small-table consolidation) use this to keep the
    ~ms roaring decode out of a fixed-latency Python executor stage."""
    if not driver_decodable(entries):
        return None
    import pandas as pd

    from .roaring import read_dv_blob

    frames = []
    for e in entries:
        with open(e.path, "rb") as fh:
            fh.seek(int(e.content_offset))
            data = fh.read(int(e.content_size))
        pos = read_dv_blob(data)
        frames.append(
            pd.DataFrame(
                {"file_path": e.referenced_data_file, "pos": pos.astype("int64")}
            )
        )
    if not frames:
        return pd.DataFrame({"file_path": pd.Series([], dtype=object),
                             "pos": pd.Series([], dtype="int64")})
    return pd.concat(frames, ignore_index=True)


def dv_positions_df(spark: SparkSession, entries) -> DataFrame:
    """Decode deletion-vector manifest entries → ``(file_path, pos)``.

    ``entries`` are ``DataFile`` rows with content ``deletion-vectors``
    (identity = (path, content_offset)).  Decoding happens in
    executors — or on the driver below the
    ``DV_DRIVER_DECODE_MAX_BYTES`` / ``DV_DRIVER_DECODE_MAX_ROWS``
    gates (see above); ``file_path`` is the entry's
    ``referenced_data_file`` (the raw manifest spelling of the target
    data file)."""
    entries = list(entries)
    from .session import local_df

    pdf = dv_positions_pandas(entries)
    if pdf is not None:
        if not len(pdf):
            return spark.createDataFrame([], "file_path string, pos long")
        return spark.createDataFrame(pdf, "file_path string, pos long")
    refs = [
        (e.path, int(e.content_offset), int(e.content_size), e.referenced_data_file)
        for e in entries
    ]

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


def build_dv_blob_rows(pdf) -> list:
    """Driver-side twin of :func:`build_dv_blobs` for gated small
    inputs: a pandas ``(file_path, pos)`` frame → ``[{file_path, blob,
    cardinality}]``.  Bytes are identical by construction (same
    ``np.unique`` + ``dv_blob_bytes`` per file as the applyInPandas
    lane — pinned by tests) so the two lanes can never disagree; the
    caller chooses the lane by a bounded row-count gate, exactly like
    the decode direction above."""
    import numpy as np

    from .roaring import dv_blob_bytes

    out = []
    for fp, grp in pdf.groupby("file_path", sort=True):
        pos = np.unique(grp["pos"].to_numpy(dtype="int64"))
        out.append(
            {
                "file_path": fp,
                "blob": dv_blob_bytes(pos),
                "cardinality": int(len(pos)),
            }
        )
    return out


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
