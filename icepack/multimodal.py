"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched decode / feature-extract / resize / frame-sample stages
(driver mandate, SURVEY.md §2.13 X5).

Design for 100 TB of images/audio/video:
- payloads are ``binary`` columns with a ``media`` struct (mime,
  width/height/duration, byte length) — metadata travels in the
  manifest-visible columns so planning can prune on it without
  touching bytes;
- every transform is ``mapInPandas`` (Arrow batches in/out, one
  Python worker per partition — never per-row UDF round trips);
- batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  so a partition of large blobs doesn't materialize at once.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
``decode_image`` raises ``NotImplementedError`` unless a deterministic
fake decoder is requested — the Spark-side plumbing (schemas, batch
iteration, partitioning) is real and tested either way
(tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried next to every payload column
MEDIA_STRUCT = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy_bucket", T.IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", mime: str = "text/plain") -> DataFrame:
    """Fixture adapter: pack a string column as an opaque binary payload
    + media struct (stand-in for image/audio bytes — the pipeline
    downstream never assumes it's text)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ),
    )


def decode_image(payload: bytes, fake: bool = False):
    """Decode an image payload.  Real decoding needs an image codec
    (not installed here); ``fake=True`` derives a deterministic 2×2
    'pixel' grid from the bytes so downstream stages are exercisable."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake=True for the deterministic stub decoder"
        )
    b = payload or b"\x00"
    s = sum(b)
    return [[b[0], b[len(b) // 3]], [b[(2 * len(b)) // 3], s % 256]]


def extract_features(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: per-blob
    byte statistics (stand-ins for embedding/CLIP-style features).
    Arrow-batched; runs wherever the partition lives.

    The worker closure is deliberately SELF-CONTAINED (no references to
    this module's globals): cloudpickle serializes module functions by
    reference, and the engine must run even when the driver imported it
    by file path — executors then have no ``icepack`` on sys.path."""
    if not fake_decode:
        # fail fast on the driver, not per-task on executors
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "only the deterministic stub decoder (fake_decode=True) runs here"
        )
    out_cols = [f.name for f in FEATURE_SCHEMA.fields]  # plain list → pickled by value

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def _decode(b):  # nested = pickled by value; mirrors decode_image(fake=True)
            b = b or b"\x00"
            s = sum(b)
            return [[b[0], b[len(b) // 3]], [b[(2 * len(b)) // 3], s % 256]]

        for pdf in batches:
            rows = []
            for doc_id, mime, blob in zip(pdf["doc_id"], pdf["mime"], pdf["payload"]):
                grid = _decode(blob)
                flat = [v for row in grid for v in row]
                n = len(blob) if blob is not None else 0
                mean = (sum(blob) / n) if n else 0.0
                rows.append(
                    {
                        "doc_id": doc_id,
                        "mime": mime,
                        "n_bytes": n,
                        # raw double — round once, after aggregation
                        # (round-inside-agg is the float-drift gotcha)
                        "byte_mean": mean,
                        "byte_entropy_bucket": int(sum(flat)) % 16,
                    }
                )
            yield _pd.DataFrame(rows, columns=out_cols)

    flat = df.select("doc_id", F.col("media.mime").alias("mime"), "payload")
    return flat.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over opaque payloads: emit one row per N-byte
    window (the video-frame-sampling shape: one input row → many
    output rows, mapInPandas as a generator)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                blob = blob or b""
                for i in range(0, len(blob), every_n_bytes):
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_no": i // every_n_bytes,
                            "frame_bytes": blob[i : i + every_n_bytes],
                        }
                    )
            yield pd.DataFrame(out, columns=["doc_id", "frame_no", "frame_bytes"])

    return df.select("doc_id", "payload").mapInPandas(_sample, schema=schema)


def resize_grid(df: DataFrame) -> DataFrame:
    """'Resize' stage: decode (stub) → average-pool the 2×2 pixel grid
    to 1×1 — the image-downsample shape (shrink before featurization so
    downstream stages move fewer bytes).  Chained mapInPandas: decode
    and pool happen in ONE Arrow pass, no intermediate materialization."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("pooled", T.DoubleType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def _decode(b):  # mirrors decode_image(fake=True); pickled by value
            b = b or b"\x00"
            s = sum(b)
            return [[b[0], b[len(b) // 3]], [b[(2 * len(b)) // 3], s % 256]]

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                grid = _decode(blob)
                flat = [v for row in grid for v in row]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "out_w": 1,
                        "out_h": 1,
                        "pooled": round(sum(flat) / len(flat), 4),
                    }
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "out_w", "out_h", "pooled"])

    return df.select("doc_id", "payload").mapInPandas(_resize, schema=schema)


def checksum_payloads(df: DataFrame) -> DataFrame:
    """``mapInArrow`` integrity pass: per-blob CRC32 + byte length,
    computed directly on the Arrow buffers (SURVEY §2.12's arrow-native
    table-function surface).  Unlike the pandas stages above, the
    payload bytes are never copied into Python objects: offsets are
    read from the Arrow offsets buffer and ``zlib.crc32`` consumes a
    ``memoryview`` slice of the shared data buffer — the right shape
    for a 100 TB "verify every blob" sweep where per-value ``bytes``
    materialization would double memory traffic.  Verified against
    Spark's JVM-side ``crc32`` in tests/test_multimodal.py."""
    import pyarrow as pa

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("crc32", T.LongType()),
        ]
    )

    def _crc(batches):
        import numpy as _np
        import pyarrow as _pa
        import zlib as _zlib

        for rb in batches:
            doc = rb.column(0)
            arr = rb.column(1)
            n = len(arr)
            odtype = _np.int64 if _pa.types.is_large_binary(arr.type) else _np.int32
            offs = _np.frombuffer(arr.buffers()[1], dtype=odtype)[
                arr.offset : arr.offset + n + 1
            ]
            data = memoryview(arr.buffers()[2])
            valid = (
                _np.ones(n, dtype=bool)
                if arr.null_count == 0
                else arr.is_valid().to_numpy(zero_copy_only=False)
            )
            lens, crcs = [], []
            for i in range(n):
                if valid[i]:
                    s, e = int(offs[i]), int(offs[i + 1])
                    lens.append(e - s)
                    crcs.append(_zlib.crc32(data[s:e]))
                else:
                    lens.append(0)
                    crcs.append(_zlib.crc32(b""))
            yield _pa.RecordBatch.from_arrays(
                [doc, _pa.array(lens, _pa.int64()), _pa.array(crcs, _pa.int64())],
                names=["doc_id", "n_bytes", "crc32"],
            )

    return df.select("doc_id", "payload").mapInArrow(_crc, schema=out_schema)


def audio_chunks(df: DataFrame, chunk_samples: int = 256) -> DataFrame:
    """Audio leg of the multimodal plumbing: split an opaque audio
    payload into fixed-length sample windows and compute per-window
    energy (mean of squared samples) — the shape every audio pipeline
    needs before VAD / feature extraction (one input row → many chunk
    rows, Arrow-batched).

    The DECODE is a deterministic stand-in (payload bytes read as
    unsigned 8-bit PCM; a real build lazy-imports soundfile/librosa
    here — not in this container).  Everything Spark-side is real:
    output schema, mapInPandas generator fan-out, numpy vectorized
    energy, and the last short window keeps its true sample count."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("energy", T.DoubleType()),
        ]
    )

    def _chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(blob or b"", dtype=np.uint8)
                for ci in range(0, len(samples), chunk_samples):
                    w = samples[ci : ci + chunk_samples].astype(np.float64)
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "chunk_idx": ci // chunk_samples,
                            "n_samples": len(w),
                            # ints < 2^53 throughout -> bit-exact double
                            "energy": float(np.mean(w * w)),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_idx", "n_samples", "energy"]
            )

    return df.select("doc_id", "payload").mapInPandas(_chunks, schema=schema)
