"""Invariant tests for the round-2 pipeline operators (SURVEY.md
§2.13 X6 / §2.4): chunking reconstructs its documents, the train split
is deterministic and leak-free, the MinHash estimate is a calibrated
sketch, and sessionization agrees with the native session_window.
The oracle hash-match (tools/check.py) proves value equality; these
pin the *semantic* contracts an oracle can't express.
"""

from pyspark.sql import functions as F

from icepack.io import load
from icepack.queries import all_queries

from tests.conftest import SF_DIR

QS = all_queries()


def test_chunking_covers_every_token_and_overlaps(spark):
    """Stride-96/len-128 chunks: per doc, chunk starts advance by 96,
    token counts sum to len + 32·(n_chunks-1) (each non-final chunk
    re-counts its 32-token overlap), and chunk 0 always exists."""
    chunks = QS["x33_doc_chunking"](spark, SF_DIR)
    docs = load(spark, SF_DIR, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_words")
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_tok").alias("tok_sum"),
        F.min("chunk_idx").alias("first_idx"),
        F.max("n_tok").alias("max_tok"),
    )
    j = per_doc.join(docs, "doc_id").collect()
    assert len(j) > 0
    for r in j:
        assert r.first_idx == 0
        assert r.max_tok <= 128
        # starts at 0, 96, 192, … while start < n_words → gapless
        # coverage (stride 96 < window 128) and an exact chunk count
        n = r.n_words
        expect_chunks = (n - 1) // 96 + 1
        assert r.n_chunks == expect_chunks
        expect_tokens = sum(min(128, n - 96 * i) for i in range(expect_chunks))
        assert r.tok_sum == expect_tokens


def test_train_split_partitions_disjoint_and_deterministic(spark):
    """Split assignment is a pure function of doc_id: re-running yields
    identical censuses, every doc lands in exactly one split, and the
    three splits cover the corpus."""
    a = QS["x35_train_split"](spark, SF_DIR)
    b = QS["x35_train_split"](spark, SF_DIR)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b
    total = sum(r[2] for r in rows_a)
    assert total == load(spark, SF_DIR, "documents").count()
    splits = {r[0] for r in rows_a}
    assert splits <= {"train", "val", "test"}
    assert "train" in splits


def test_minhash_estimate_is_calibrated(spark):
    """On LSH candidate pairs the 8-component estimate must track the
    exact Jaccard: values in [0,1] in eighths, and the mean absolute
    error stays under the sketch's standard error bound (~1/sqrt(8) ≈
    .35; candidates are high-similarity so observed error is far
    smaller — assert the loose bound, pin the tight one on average)."""
    rows = QS["x36_minhash_estimate"](spark, SF_DIR).collect()
    assert len(rows) > 0
    errs = []
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert abs(r.est_jaccard * 8 - round(r.est_jaccard * 8)) < 1e-9
        assert 0.0 < r.jaccard <= 1.0
        errs.append(abs(r.est_jaccard - r.jaccard))
    assert sum(errs) / len(errs) < 0.35


def test_sessionize_gap_agrees_with_session_window(spark):
    """The manual lag+cumsum sessionizer and Spark's native
    session_window must carve identical session boundaries: same
    session count and same total events per user (30-minute gap both
    sides)."""
    manual = (
        QS["a15_sessionize_gap"](spark, SF_DIR)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )
    ev = load(spark, SF_DIR, "events")
    native = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n").alias("n_events"))
    )
    m = {r.user_id: (r.n_sessions, r.n_events) for r in manual.collect()}
    n = {r.user_id: (r.n_sessions, r.n_events) for r in native.collect()}
    assert m == n


def test_chunk_dedup_survivor_is_minimal(spark):
    """Every reported duplicate group keeps the lexicographically
    smallest (doc_id, chunk_idx) and reports at least 2 copies.  The
    survivor doc is the struct-min's doc component by construction, so
    keep_doc + keep_chunk must itself be a member of the group — check
    it against an independent recomputation of group membership."""
    rows = QS["x34_chunk_dedup"](spark, SF_DIR).collect()
    assert rows, "fixture corpus must contain duplicate chunks"
    d = load(spark, SF_DIR, "documents").withColumn("w", F.split("text", " "))
    members = (
        d.select(
            "doc_id",
            F.posexplode(
                F.expr("transform(sequence(1, size(w), 64), s -> slice(w, s, 64))")
            ).alias("chunk_idx", "cw"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.md5(F.concat_ws(" ", "cw")).alias("chunk_md5"),
        )
        .collect()
    )
    by_md5: dict[str, list[tuple[int, int]]] = {}
    for m in members:
        by_md5.setdefault(m.chunk_md5, []).append((m.doc_id, m.chunk_idx))
    for r in rows:
        assert r.n_copies >= 2
        grp = by_md5[r.chunk_md5]
        assert (r.keep_doc, r.keep_chunk) == min(grp)


def test_fast_lsh_finds_all_exact_duplicates(spark):
    """The xxhash64 production LSH path (icepack.dedup): identical
    texts have identical signatures, so every exact-duplicate pair
    MUST collide in every band — recall 1.0 on exact dups, run-to-run
    deterministic, and ids ordered a < b."""
    from icepack.dedup import lsh_candidate_pairs
    from icepack.io import load

    # the fixtures have no exact text duplicates — construct them:
    # every (doc, shifted copy) pair is ground truth the LSH MUST find
    base = load(spark, SF_DIR, "documents").select("doc_id", "text")
    docs = base.unionByName(
        base.withColumn("doc_id", F.col("doc_id") + 100_000)
    )
    pairs = lsh_candidate_pairs(docs).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert all(a < b for a, b in got)
    want = {
        (r.doc_id, r.doc_id + 100_000)
        for r in base.filter(F.size(F.split("text", " ")) >= 3).collect()
    }
    assert want and want <= got
    # deterministic
    again = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(docs).collect()}
    assert got == again
    # 16-hash / 8-band config keeps exact-dup recall too
    wide = lsh_candidate_pairs(docs, num_hashes=16, bands=8)
    assert {(r.id_a, r.id_b) for r in wide.collect()} >= want


def test_connectivity_only_pairs_give_identical_clusters(spark):
    """r9 verdict item 1: ``connectivity_only=True`` bounds every
    blocking bucket's pair expansion to a star (O(k) instead of k²/2)
    for the connected-components consumer.  The CLUSTERS must be
    identical to the all-pairs path's on all three similarity methods,
    and the star pair set must never exceed the all-pairs set's
    components' vertex sets."""
    from icepack.dedup import (
        connected_components,
        lsh_candidate_pairs,
        semantic_candidate_pairs,
        simhash_candidate_pairs,
    )
    from icepack.io import load

    def clusters(pairs):
        cc = connected_components(pairs)
        return {(r["id"], r["cluster"]) for r in cc.collect()}

    base = load(spark, SF_DIR, "documents").select("doc_id", "text").limit(60)
    # exact copies AND light near-dup edits → multi-member clusters
    docs = base.unionByName(
        base.withColumn("doc_id", F.col("doc_id") + 100_000)
    ).unionByName(
        base.withColumn("doc_id", F.col("doc_id") + 200_000).withColumn(
            "text", F.concat(F.col("text"), F.lit(" tail"))
        )
    )
    full = clusters(lsh_candidate_pairs(docs))
    star = clusters(lsh_candidate_pairs(docs, connectivity_only=True))
    assert full == star and full

    full = clusters(simhash_candidate_pairs(docs).select("id_a", "id_b"))
    star = clusters(
        simhash_candidate_pairs(docs, connectivity_only=True).select(
            "id_a", "id_b"
        )
    )
    assert full == star and full

    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding").limit(60)
    vecs = emb.unionByName(
        emb.withColumn("vec_id", F.col("vec_id") + 100_000)
    )
    full = clusters(
        semantic_candidate_pairs(vecs, threshold=0.999).select("id_a", "id_b")
    )
    star = clusters(
        semantic_candidate_pairs(
            vecs, threshold=0.999, connectivity_only=True
        ).select("id_a", "id_b")
    )
    assert full == star and full


def test_semantic_default_planes_scale_with_distinct_vectors():
    """The default sign-LSH plane count grows one per corpus doubling
    past SEMANTIC_FROZEN_MAX distinct vectors (frozen 4 below) — the
    sizing rule that keeps expected bucket depth bounded (the fixed
    16-bucket default was the exact quadratic the r9 ladder killed in
    the query twin)."""
    from icepack.dedup import SEMANTIC_FROZEN_MAX, _semantic_planes_for

    assert _semantic_planes_for(1) == 4
    assert _semantic_planes_for(SEMANTIC_FROZEN_MAX) == 4
    assert _semantic_planes_for(SEMANTIC_FROZEN_MAX + 1) == 5
    assert _semantic_planes_for(SEMANTIC_FROZEN_MAX * 4) == 6
    assert _semantic_planes_for(SEMANTIC_FROZEN_MAX * 64) == 10


def test_pii_scan_detects_injected_pii(spark):
    """Plant known PII into fixture docs and require exact hit counts
    from the same pii_counts machinery the x43 census uses (which is
    all-zeros on the clean synthetic corpus)."""
    from icepack.queries.llm import pii_counts

    docs = load(spark, SF_DIR, "documents").limit(10)
    planted = docs.withColumn(
        "text",
        F.concat(
            "text",
            F.lit(" contact alice@example.com or bob.smith@corp.co.uk"),
            F.lit(" call 555-867-5309 from 10.0.0.1"),
        ),
    )
    got = pii_counts(planted).agg(
        F.sum("n_emails").alias("e"),
        F.sum("n_phones").alias("p"),
        F.sum("n_ipv4s").alias("i"),
    ).collect()[0]
    assert (got.e, got.p, got.i) == (20, 10, 10)
    clean = pii_counts(docs).agg(
        F.sum("n_emails") + F.sum("n_phones") + F.sum("n_ipv4s")
    ).collect()[0][0]
    assert clean == 0


def test_pii_redaction_rewrites_injected_spans(spark):
    """x44's redaction chain on planted PII: every injected span must be
    replaced by its placeholder, the audit counts must match the plant
    exactly, and a second pass over the redacted text must find zero
    residual PII (the fixture corpus is clean, so this injection is the
    only real proof the rewrite works)."""
    from icepack.queries.llm import PII_PATTERNS

    docs = load(spark, SF_DIR, "documents").limit(10)
    planted = docs.withColumn(
        "text",
        F.concat(
            "text",
            F.lit(" contact alice@example.com or bob.smith@corp.co.uk"),
            F.lit(" call 555-867-5309 from 10.0.0.1"),
        ),
    )
    r = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_PATTERNS["emails"], "<EMAIL>"),
            PII_PATTERNS["phones"],
            "<PHONE>",
        ),
        PII_PATTERNS["ipv4s"],
        "<IP>",
    )
    red = planted.select(r.alias("rtext"))
    marks = red.agg(
        F.sum(F.size(F.regexp_extract_all("rtext", F.lit("<EMAIL>"), F.lit(0)))).alias("e"),
        F.sum(F.size(F.regexp_extract_all("rtext", F.lit("<PHONE>"), F.lit(0)))).alias("p"),
        F.sum(F.size(F.regexp_extract_all("rtext", F.lit("<IP>"), F.lit(0)))).alias("i"),
    ).collect()[0]
    assert (marks.e, marks.p, marks.i) == (20, 10, 10)
    residual = red.agg(
        F.sum(
            F.size(F.regexp_extract_all("rtext", F.lit(PII_PATTERNS["emails"]), F.lit(0)))
            + F.size(F.regexp_extract_all("rtext", F.lit(PII_PATTERNS["phones"]), F.lit(0)))
            + F.size(F.regexp_extract_all("rtext", F.lit(PII_PATTERNS["ipv4s"]), F.lit(0)))
        )
    ).collect()[0][0]
    assert residual == 0


def test_jaccard_pack_handles_negative_doc_ids(spark):
    """The packed-bigint inverted index is sign-safe (review r7): ids
    from hashed keys are routinely negative, and the bitmask unpack +
    arithmetic shifts must yield the SAME pairs as for positive ids
    (negated-and-swapped)."""
    from pyspark.sql import functions as F

    from icepack.io import load
    from icepack.queries import llm

    d = load(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    pos, _ = llm._jaccard_pairs_core(spark, "", d)
    pos_rows = sorted(map(tuple, pos.collect()))
    neg = d.withColumn("doc_id", -F.col("doc_id") - 1)
    npairs, _ = llm._jaccard_pairs_core(spark, "", neg)
    neg_rows = sorted(map(tuple, npairs.collect()))
    expect = sorted((-b - 1, -a - 1, j) for a, b, j in pos_rows)
    assert neg_rows == expect
