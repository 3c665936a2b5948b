"""Multimodal plumbing: binary payload columns + mapInPandas stages
(SURVEY.md §2.13 X5)."""

import pytest
from pyspark.sql import functions as F

from icepack.io import load
from icepack.multimodal import (
    attach_binary_payload,
    decode_image,
    extract_features,
    sample_frames,
)

from tests.conftest import SF_DIR


def _docs(spark):
    return attach_binary_payload(load(spark, SF_DIR, "documents"))


def test_payload_schema(spark):
    df = _docs(spark)
    types = dict(df.dtypes)
    assert types["payload"] == "binary"
    assert types["media"].startswith("struct<mime:string,n_bytes:bigint")
    row = df.select("media.n_bytes", F.octet_length("payload").alias("n")).first()
    assert row["n_bytes"] == row["n"]


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc", fake=False)


def test_feature_extraction_distributed(spark):
    df = _docs(spark).repartition(4)
    feats = extract_features(df)
    rows = feats.collect()
    assert len(rows) == df.count()
    byid = {r["doc_id"]: r for r in rows}
    # deterministic: recompute one row driver-side
    sample = df.select("doc_id", "payload").first()
    blob = bytes(sample["payload"])
    assert byid[sample["doc_id"]]["n_bytes"] == len(blob)
    assert byid[sample["doc_id"]]["byte_mean"] == sum(blob) / len(blob)
    assert 0 <= byid[sample["doc_id"]]["byte_entropy_bucket"] < 16


def test_frame_sampling_one_to_many(spark):
    df = _docs(spark)
    frames = sample_frames(df, every_n_bytes=64)
    n_docs = df.count()
    assert frames.count() > n_docs  # one row in → many out
    # frame counts match ceil(n_bytes/64) exactly
    got = frames.groupBy("doc_id").agg(F.count("*").alias("n_frames"))
    want = df.select("doc_id", F.ceil(F.col("media.n_bytes") / 64).cast("long").alias("n_frames"))
    joined = got.alias("g").join(want.alias("w"), "doc_id")
    assert joined.filter(F.col("g.n_frames") != F.col("w.n_frames")).count() == 0
    # reassembling frames reproduces the payload byte length
    total = frames.agg(F.sum(F.octet_length("frame_bytes"))).first()[0]
    want_total = df.agg(F.sum("media.n_bytes")).first()[0]
    assert total == want_total

def test_resize_grid_matches_decoder(spark):
    """resize = avg-pool of the stub-decoded grid, verified against a
    driver-side recomputation for every row."""
    from icepack.io import load
    from icepack.multimodal import attach_binary_payload, decode_image, resize_grid

    d = attach_binary_payload(load(spark, SF_DIR, "documents").limit(20))
    got = {r["doc_id"]: r["pooled"] for r in resize_grid(d).collect()}
    for r in d.select("doc_id", "payload").collect():
        grid = decode_image(bytes(r["payload"]), fake=True)
        flat = [v for row in grid for v in row]
        assert got[r["doc_id"]] == round(sum(flat) / len(flat), 4)


def test_checksum_payloads_matches_jvm_crc32(spark):
    """The mapInArrow zero-copy CRC must agree byte-for-byte with
    Spark's built-in crc32 (JVM, codegen) on the same payloads."""
    from pyspark.sql import functions as F

    from icepack.io import load
    from icepack.multimodal import attach_binary_payload, checksum_payloads

    d = attach_binary_payload(load(spark, SF_DIR, "documents"))
    ours = checksum_payloads(d)
    jvm = d.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.crc32("payload").alias("crc32"),
    )
    assert ours.exceptAll(jvm).count() == 0 and jvm.exceptAll(ours).count() == 0


def test_audio_chunks_shape_and_energy(spark):
    """audio_chunks: fixed 256-sample windows, short tail keeps its
    true count, energies match a numpy recompute, and every payload
    byte lands in exactly one chunk."""
    import numpy as np

    from icepack.multimodal import attach_binary_payload, audio_chunks

    d = attach_binary_payload(load(spark, SF_DIR, "documents").limit(20))
    ch = audio_chunks(d).collect()
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r.doc_id, []).append(r)
    texts = {r.doc_id: r.text for r in load(spark, SF_DIR, "documents").limit(20).collect()}
    assert set(by_doc) == set(texts)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        blob = texts[doc_id].encode()
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        assert sum(r.n_samples for r in rows) == len(blob)
        assert all(r.n_samples == 256 for r in rows[:-1])
        for r in rows:
            w = np.frombuffer(
                blob[r.chunk_idx * 256 : r.chunk_idx * 256 + 256], dtype=np.uint8
            ).astype(np.float64)
            assert abs(r.energy - float(np.mean(w * w))) < 1e-12
