"""The multiplicity-collapse rewrites in x2/x13/x22 are ADAPTIVE: a
corpus-level duplication stat (rows / approx-distinct) decides whether
the exact-duplicate pre-grouping runs.  Both paths must be row-identical
— this builds a deliberately duplicate-saturated fixture (every doc 3×
under fresh ids, the sf1-ladder shape) and pins collapsed == direct for
each query, plus the gate itself on both corpus shapes.
"""

import os

import pytest
from pyspark.sql import functions as F

from icepack.io import load
from icepack.queries import llm
from tests.conftest import SF_DIR, rows_sorted

COPIES = 3
OFFSET = 1_000_000_000


@pytest.fixture(scope="module")
def dup_sf(tmp_path_factory):
    """An sf dir whose documents/embeddings are COPIES×-replicated with
    offset ids and identical payloads (the ladder's worst case)."""
    out = str(tmp_path_factory.mktemp("dupsf") / "sf0.001")
    os.makedirs(out)
    from icepack.session import get_session

    spark = get_session("icepack-tests", cpus=8)
    for name, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
        df = load(spark, SF_DIR, name)
        parts = [
            df.withColumn(key, (F.col(key) + F.lit(i * OFFSET)).cast(dict(df.dtypes)[key]))
            for i in range(COPIES)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.parquet(f"{out}/{name}.parquet")
    yield out


def _both_paths(monkeypatch, spark, sf, fn):
    """Run fn with the collapse forced ON (ratio gate passes: the
    fixture is genuinely duplicated) and forced OFF, caches cleared."""
    monkeypatch.setattr(llm, "_DUP_RATIO_CACHE", {})
    monkeypatch.setattr(llm, "_COLLAPSE_AT", 1.5)
    collapsed = rows_sorted(fn(spark, sf))
    monkeypatch.setattr(llm, "_DUP_RATIO_CACHE", {})
    monkeypatch.setattr(llm, "_COLLAPSE_AT", float("inf"))
    direct = rows_sorted(fn(spark, sf))
    return collapsed, direct


def test_duplication_ratio_gate(spark, dup_sf):
    llm._DUP_RATIO_CACHE.clear()
    base = llm._duplication_ratio(
        load(spark, SF_DIR, "documents"), "text", ("t1",)
    )
    dup = llm._duplication_ratio(
        load(spark, dup_sf, "documents"), "text", ("t2",)
    )
    # sf0.001 documents contain SOME duplicates by construction, but
    # nowhere near the replicated fixture's ≥3× saturation
    assert dup > base
    assert dup == pytest.approx(COPIES * base, rel=0.1)
    # memoized: a second call must not launch a job (poison the df)
    assert llm._duplication_ratio(None, "text", ("t2",)) == dup
    # embeddings: the ratio works on ARRAY keys too
    llm._DUP_RATIO_CACHE.clear()
    edup = llm._duplication_ratio(
        load(spark, dup_sf, "embeddings"), "embedding", ("t3",)
    )
    assert edup == pytest.approx(COPIES, rel=0.1)


def test_x2_collapse_equals_direct(spark, dup_sf, monkeypatch):
    collapsed, direct = _both_paths(
        monkeypatch, spark, dup_sf, llm.x2_jaccard_pairs
    )
    assert collapsed == direct
    assert len(collapsed) > 0


def test_x13_collapse_equals_direct(spark, dup_sf, monkeypatch):
    collapsed, direct = _both_paths(
        monkeypatch, spark, dup_sf, llm.x13_embedding_neardup
    )
    assert collapsed == direct
    # replicated vectors guarantee within-group 1.0 pairs exist
    assert any(r[2] == 1.0 for r in collapsed)


def test_x22_collapse_equals_direct(spark, dup_sf, monkeypatch):
    collapsed, direct = _both_paths(
        monkeypatch, spark, dup_sf, llm.x22_contamination
    )
    assert collapsed == direct


def test_x48_gram_matches_jvm_fold(spark):
    """r13: x48's within-bucket pair scoring moved from a bucket
    self-join with interpreted zip_with cosines to one numpy gram
    matrix per bucket (applyInPandas).  BLAS and the sequential JVM
    fold may differ in the last ulp, but every comparison the query
    makes happens after round(·,6) (ranking) or round(·,4) (output) —
    pin that the two computations agree EXHAUSTIVELY at those
    roundings, for every within-bucket pair of the real fixtures."""
    import collections

    import numpy as np

    from icepack.io import load

    for sfd in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        e = load(spark, sfd, "embeddings")
        planes, _ = llm._x48_corpus_planes(e, sfd)
        b = e.select(
            "vec_id",
            "embedding",
            llm._x48_bucket_col(planes).alias("bucket"),
            F.sqrt(llm._dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        )
        # the pre-r13 formulation: bucket self-join, per-pair JVM fold
        a = b.select(
            "bucket",
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("ea"),
            F.col("nrm").alias("na"),
        )
        c = b.select(
            "bucket",
            F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("eb"),
            F.col("nrm").alias("nb"),
        )
        jvm = (
            a.join(c, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "bucket",
                "id_a",
                "id_b",
                F.round(
                    llm._dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
                ).alias("r6"),
                F.round(
                    llm._dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 4
                ).alias("r4"),
            )
            .collect()
        )
        by_bucket = collections.defaultdict(list)
        for r in e.select(
            "vec_id", "embedding", llm._x48_bucket_col(planes).alias("bucket")
        ).collect():
            by_bucket[r["bucket"]].append((r["vec_id"], r["embedding"]))
        np_vals = {}
        for bkt, lst in by_bucket.items():
            lst.sort()
            ids = np.array([x[0] for x in lst])
            V = np.asarray([x[1] for x in lst], dtype=np.float64)
            G = V @ V.T
            nrm = np.sqrt(np.diag(G))
            cos = G / np.outer(nrm, nrm)
            ia, ib = np.triu_indices(len(ids), k=1)
            for x, y, cv in zip(ids[ia], ids[ib], cos[ia, ib]):
                np_vals[(bkt, int(x), int(y))] = (
                    float(np.round(cv, 6)),
                    float(np.round(cv, 4)),
                )
        assert len(jvm) == len(np_vals) > 0
        for r in jvm:
            nv = np_vals[(r["bucket"], r["id_a"], r["id_b"])]
            assert nv == (r["r6"], r["r4"]), (sfd, r, nv)


def test_x48_collapsed_equals_direct_on_replicated_corpus(spark):
    """x48's multiplicity collapse (r7): on a 5x-replicated embeddings
    corpus the collapsed reconstruction must reproduce the direct
    within-bucket top-3 EXACTLY (same ids, same rounded cosines) — the
    candidate-superset argument in the docstring, pinned."""
    from icepack.io import load
    from icepack.queries import llm

    e = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    parts = [
        e.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000))
        for i in range(5)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    direct = sorted(map(tuple, llm._x48_topk_direct(u).collect()))
    coll = sorted(map(tuple, llm._x48_topk_collapsed(u).collect()))
    assert direct == coll and len(direct) > 0


def test_x47_collapse_equals_direct(spark, dup_sf, monkeypatch):
    # substring dedup: collapsed path mines distinct texts only and
    # marks multiplicity>1 docs fully covered — must equal the direct
    # gram mining row-for-row, including docs shorter than the gram
    # size (no grams -> dup_tokens 0 even when duplicated)
    collapsed, direct = _both_paths(
        monkeypatch, spark, dup_sf, llm.x47_substring_dedup
    )
    assert collapsed == direct
    assert len(collapsed) > 0
    # on the replicated fixture every gram-bearing doc is fully covered
    full = [r for r in collapsed if r[1] >= 8]
    assert full and all(r[2] == r[1] for r in full)


def test_x56_collapse_equals_direct(spark, dup_sf, monkeypatch):
    # containment: the cap applies to the multiplicity-weighted total
    # (== raw posting length), same-text pairs score kept/n_sh — both
    # must make collapsed == direct row-for-row on the 3x fixture
    collapsed, direct = _both_paths(
        monkeypatch, spark, dup_sf, llm.x56_containment_dedup
    )
    assert collapsed == direct


def test_x48_plane_count_scales_with_distinct_corpus(spark):
    """r9: SemDeDup blocking is data-aware past the frozen regime —
    plane count grows with the (distinct) corpus so expected bucket
    depth stays bounded and total pair work is ~linear in rows, the
    unique-corpus ladder's asymptote requirement.  The frozen 4 planes
    are a strict PREFIX of every larger plane set (two runs at one
    corpus size always agree), the oracle regime (<= 4096 distinct)
    keeps exactly the frozen planes, and the direct and collapsed
    paths share one bucketing (sized by DISTINCT count) so their
    pinned equivalence survives the growth."""
    from icepack.queries import llm

    assert llm._x48_planes(500) == llm._LSH_PLANES
    assert llm._x48_planes(4096) == llm._LSH_PLANES
    for n in (10_000, 100_000, 1_000_000):
        ps = llm._x48_planes(n)
        assert ps[:4] == llm._LSH_PLANES  # deterministic prefix
        assert 2 ** len(ps) >= n / llm._X48_FROZEN_MAX  # depth bound
        assert len(ps) >= len(llm._x48_planes(n // 10))  # monotone
    # equivalence with a shared non-default plane set: 5x-replicated
    # corpus, both paths bucketed by the same 5-plane function
    from pyspark.sql import functions as F

    base = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                F.sin(F.col("id") * (j + 1) + 1).cast("float")
                for j in range(64)  # planes are 64-dim
            ]
        ).alias("embedding"),
    )
    parts = [base]
    for i in range(1, 5):
        parts.append(
            base.withColumn("vec_id", F.col("vec_id") + F.lit(1000 * i))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    planes = llm._x48_planes(5000)  # 5 planes
    assert len(planes) == 5
    direct = sorted(map(tuple, llm._x48_topk_direct(u, planes).collect()))
    coll = sorted(map(tuple, llm._x48_topk_collapsed(u, planes).collect()))
    assert direct == coll and len(direct) > 0


def test_np_round_half_up_matches_spark_round(spark):
    """ADVICE r13: x48's in-scorer ranking key must round HALF_UP like
    Spark's round(), not banker's — pin the helper against Spark itself
    on exact half-boundary values where the two rules differ."""
    import numpy as np

    from icepack.queries.llm import _np_round_half_up

    vals = [0.1234565, 0.1234575, -0.1234565, 0.9999995, 1.5e-07,
            2.5e-07, 0.7071067811865476, 0.123456, -0.9999995]
    got = _np_round_half_up(np.array(vals), 6)
    sdf = spark.createDataFrame([(v,) for v in vals], "v double")
    from pyspark.sql import functions as F

    want = [r[0] for r in sdf.select(F.round("v", 6)).collect()]
    assert got.tolist() == want
    # and banker's rounding demonstrably differs on at least one input
    assert np.round(np.array(vals), 6).tolist() != want
