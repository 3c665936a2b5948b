"""LLM-data-pipeline extension operators (SURVEY.md §2.13).

Dedup (exact, n-gram Jaccard, MinHash+LSH, SimHash), embedding
similarity search (brute-force + bucketed ANN), text analysis
(tokens/quality/fingerprint), and multimodal-column plumbing — all over
the ``documents`` / ``embeddings`` fixtures.

Portability tricks for the DuckDB oracle:
- hashes go through ``md5`` (identical hex in both engines) and string
  ``MIN`` (lexicographic in both) — never engine-native hash functions;
- array indexing is 1-based in DuckDB and 0-based in Spark SQL ``[]``;
  both sides are written index-explicit;
- cosine/norm math casts float→double *before* multiplying and rounds
  the output, so float-order noise can't flip the value hash.

Scale: every operator is a pure DataFrame pipeline (shuffle on
shingle/band/bucket keys).  Pair generation is always blocked (LSH
bands, IVF buckets) — never an unblocked O(n²) cross join — except the
explicitly-bounded brute-force baselines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from . import REGISTRY, query

def _shingle_rows(
    spark: SparkSession,
    sf: str,
    distinct: bool,
    carry: tuple = (),
    where=None,
    docs: DataFrame | None = None,
    hashed: bool = False,
) -> DataFrame:
    """(doc_id, sh) rows of 3-word shingles — and, when ``distinct``,
    the per-doc distinct-shingle count ``n_sh``.  ``carry`` names
    per-doc columns to thread through the pipeline (cheaper than a
    join-back against documents, which would broadcast a corpus-sized
    side at scale).

    Built as posexplode(words) + ONE sliding-frame window rather than
    explode(transform(...)): a generator whose child is an expensive
    array expression re-evaluates that expression per OUTPUT row (~10×
    slower here, measured); the window form computes each shingle once.
    A single collect_list over ROWS BETWEEN CURRENT AND 2 FOLLOWING
    replaces the earlier pair of lead() frames — one frame buffer
    instead of two offset frames in the WindowExec, measured ~10%
    faster on the window stage (r6 VERDICT item 2).  The window reuses
    the doc_id repartitioning, so the only added cost is a sort within
    partitions.  documents also arrives as one small parquet file =
    ONE scan partition, hence the explicit fan-out (free at 100 TB
    where the scan is already parallel)."""
    from pyspark.sql import Window as W

    d = docs if docs is not None else load(spark, sf, "documents")
    if where is not None:
        # pre-window filter → reaches the parquet scan (a post-pipeline
        # filter can't push below a non-key window)
        d = d.filter(where)
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    we = d.select("doc_id", *carry, F.posexplode(F.split("text", " ")).alias("pos", "w"))
    win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.currentRow, 2)
    # ``hashed``: every inverted-index consumer keys on xxhash64(sh)
    # anyway — hashing AT THE WINDOW OUTPUT makes the per-doc distinct
    # aggregation dedupe 8-byte longs instead of ~25-byte strings
    # (~15% on this stage, measured; bit-identical results, n_sh now
    # counts distinct hashes — a 2^-64 per-doc collision tolerance the
    # hash-keyed exchanges already accept)
    sh_col = F.array_join("t", " ")
    if hashed:
        sh_col = F.xxhash64(sh_col)
    sh = (
        we.withColumn("t", F.collect_list("w").over(win))
        .filter(F.size("t") == 3)
        .select("doc_id", *carry, sh_col.alias("sh"))
    )
    if distinct:
        # NOT .distinct() + count window: those re-shuffle by (doc_id,
        # sh) and then AGAIN by doc_id (3 exchanges total).  The stream
        # is already hash-partitioned by doc_id, so a groupBy(doc_id)
        # collapses to a partial-only aggregate — dedup + per-doc count
        # with zero additional exchanges (per-doc shingle lists are
        # bounded by document length, so collect_list is safe).
        sh = (
            sh.groupBy("doc_id", *carry)
            .agg(F.array_distinct(F.collect_list("sh")).alias("shs"))
            .select(
                "doc_id", *carry, F.size("shs").alias("n_sh"), F.explode("shs").alias("sh")
            )
        )
    return sh


#: collapse only pays when duplicates are saturated enough to beat the
#: extra exchange it introduces; approx_count_distinct is ±2-3%, so the
#: threshold sits far from 1.0
_COLLAPSE_AT = 1.5

_DUP_RATIO_CACHE: dict = {}
_CORPUS_ROWS_CACHE: dict = {}


def _duplication_ratio(df: DataFrame, key, cache_key) -> float:
    """Corpus duplication stat (rows / approx-distinct keys): the gate
    for the multiplicity-collapse rewrites in x2/x13/x22.  A unique
    corpus must not pay the collapse's extra exchange (r5 paid it
    unconditionally: x13 sf0.1 regressed 2.1× to buy the sf1 win);
    a duplicate-saturated one must keep it.

    Cost when not cached: ONE narrow scan pass — count and
    approx_count_distinct are both map-side-combinable, so the exchange
    moves one HLL sketch per partition, never rows.  Memoized per
    (sf_dir, table.column): the bench fixtures are immutable parquet —
    this is the table-level stat a warehouse keeps (for IceTables the
    cache key would carry the snapshot id)."""
    from ..table import IceTable

    if isinstance(df, IceTable):
        # warehouse table: the PERSISTED snapshot-keyed stat is the
        # source of truth (icepack/stats.py) — answered from metadata
        # bounds across sessions, never from this session memo
        return df.duplication_ratio(key, threshold=_COLLAPSE_AT)
    if cache_key in _DUP_RATIO_CACHE:
        return _DUP_RATIO_CACHE[cache_key]
    r = df.agg(
        F.count(F.lit(1)).alias("n"), F.approx_count_distinct(key).alias("d")
    ).first()
    ratio = float(r["n"]) / max(float(r["d"]), 1.0)
    _DUP_RATIO_CACHE[cache_key] = ratio
    _CORPUS_ROWS_CACHE[cache_key] = int(r["n"])  # free byproduct: row count
    return ratio


def _corpus_rows(df: DataFrame, cache_key) -> int:
    """Corpus row count, memoized per (sf_dir, table.column) — filled
    for free by :func:`_duplication_ratio`'s single-scan profile when
    that ran first; one COUNT job otherwise."""
    if cache_key not in _CORPUS_ROWS_CACHE:
        _CORPUS_ROWS_CACHE[cache_key] = df.count()
    return _CORPUS_ROWS_CACHE[cache_key]


def _text_groups(d: DataFrame) -> DataFrame:
    """Exact-duplicate text groups keyed by a 128-bit content hash (two
    independent xxhash64 seeds): the exchange KEY is 16 bytes instead
    of the whole document — at 100 TB a full-text key is the widest
    possible exchange.  The text itself travels once per distinct value
    as the aggregation VALUE (``first``), not as the comparison key;
    a collision would need both 64-bit hashes to collide at once."""
    return d.groupBy(
        F.xxhash64("text").alias("_h1"),
        F.xxhash64(F.lit(1), "text").alias("_h2"),
    ).agg(
        F.min("doc_id").alias("rep"),
        F.sort_array(F.collect_list("doc_id")).alias("members"),
        F.first("text").alias("text"),
    )


#: DuckDB-side shingle CTE (same trigram set, 1-based indexing).
_SQL_SHINGLES = """
    WITH sh_tbl AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(range(1, greatest(len(w) - 1, 1)),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
    )
"""


@query(
    "x1_exact_dedup",
    oracle="""
    SELECT doc_id, lang, dup_key FROM (
      SELECT doc_id, lang, substr(text, 1, 12) AS dup_key,
             ROW_NUMBER() OVER (PARTITION BY substr(text, 1, 12)
                                ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def x1_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup, keep-first: hash-partition on the dup key, rank,
    keep rn=1.  One shuffle on the key; at 100 TB the key would be
    xxhash64(full text) — here a 12-char prefix so the fixture actually
    contains duplicates."""
    from pyspark.sql import Window as W

    d = load(spark, sf, "documents")
    w = W.partitionBy("dup_key").orderBy("doc_id")
    return (
        d.withColumn("dup_key", F.substring("text", 1, 12))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "dup_key")
    )


#: (doc_id, n_sh) pack width for the inverted-index exchanges: doc_id
#: rides the high 38 bits (|doc_id| < 2^37 — ~10x a 100 TB corpus at
#: 5 KB/doc; NEGATIVE ids from hashed keys are fine, the unpack is an
#: arithmetic shift and n_sh extraction is a BITMASK, which two's
#: complement keeps exact), n_sh the low 25 (33M distinct shingles/doc
#: = a ~200 MB single document, far past anything a row-shuffled text
#: column can carry).
_PACK = 1 << 25
_PACK_MASK = _PACK - 1


def _jaccard_pairs_core(spark: SparkSession, sf: str, docs: DataFrame):
    """Inverted-index Jaccard over the given (doc_id, text) docs:
    returns (pairs-with-jaccard≥0.8, shingle rows) — shared by x2's
    direct and multiplicity-collapsed paths.

    (doc_id, n_sh) travels PACKED into one bigint through the two wide
    exchanges (8 bytes instead of a 16-byte struct; primitive-array
    collect_list + long comparisons instead of struct field access in
    the pair expansion — measured ~20% faster end-to-end).  array_sort
    on the packed longs is doc_id-major (doc_id sits in the high bits),
    so id_a < id_b still holds by construction."""
    ex = _shingle_rows(spark, sf, distinct=True, docs=docs, hashed=True)
    packed = ex.select(
        "sh", (F.shiftleft(F.col("doc_id"), 25) + F.col("n_sh")).alias("dn")
    )
    buckets = (
        packed.groupBy("sh")
        .agg(F.array_sort(F.collect_list("dn")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                # PPJoin-style length filter INSIDE the expansion:
                # jaccard >= 0.8 (or its lower bound) is impossible
                # unless min(n_a, n_b) >= 0.8 * max(n_a, n_b) — the
                # best case is full containment, where J = min/max —
                # so size-incompatible pairs drop before they reach
                # the pair-count shuffle (2.7x fewer rows through the
                # widest exchange at sf0.1; only removes pairs the
                # final >= 0.8 filter would discard anyway).
                f"flatten(transform(sequence(1, size(ds) - 1),"
                f" i -> filter(transform(slice(ds, i + 1, size(ds) - i),"
                f" y -> struct(ds[i-1] AS a, y AS b)),"
                f" p -> least(p.a & {_PACK_MASK}, p.b & {_PACK_MASK})"
                f" >= 0.8 * greatest(p.a & {_PACK_MASK}, p.b & {_PACK_MASK}))))"
            )
        ).alias("p")
    )
    counts = pairs.groupBy("p.a", "p.b").agg(F.count("*").alias("common"))
    n_a = F.col("a").bitwiseAND(F.lit(_PACK_MASK)).cast("double")
    n_b = F.col("b").bitwiseAND(F.lit(_PACK_MASK)).cast("double")
    jac = F.col("common").cast("double") / (n_a + n_b - F.col("common"))
    rep_pairs = counts.filter(jac >= 0.8).select(
        # exact unpack: arithmetic shift, not double division (which
        # loses low bits once doc_id nears the 38-bit ceiling)
        F.shiftright(F.col("a"), 25).alias("id_a"),
        F.shiftright(F.col("b"), 25).alias("id_b"),
        F.round(jac, 4).alias("jaccard"),
    )
    return rep_pairs, ex


@query(
    "x2_jaccard_pairs",
    oracle=_SQL_SHINGLES
    + """
    , ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh_tbl),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh_tbl),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.id_a, p.id_b,
           ROUND(CAST(p.common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.common), 4) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.id_a = sa.doc_id
    JOIN sizes sb ON p.id_b = sb.doc_id
    WHERE CAST(p.common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.common) >= 0.8
    """,
)
def x2_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """n-gram Jaccard near-dup via an inverted index: group shingle
    rows by shingle, expand each posting list's pairs in-place, count
    commons, Jaccard ≥ 0.8.

    groupBy+expand, NOT a self-join: a self-join recomputes the whole
    shingle pipeline for both sides (no exchange reuse — AQE broadcasts
    one side, and broadcasting an exploded derived table is exactly
    what must not happen at 100 TB), measured 2× slower.  Here the
    pipeline executes once and the only wide ops are two hash
    shuffles: by shingle (posting lists), then by pair (common
    counts).  n_sh travels inside the posting structs so no size
    lookup join is needed.  At 100 TB the posting lists would first
    drop ultra-frequent shingles (stop-shingles) to bound the pair
    expansion; the MinHash variant below is the designed scale path.

    Shingle identity never reaches the output, so the shuffle key is
    xxhash64(shingle) — 8 bytes instead of a ~25-byte string through
    the widest exchange (~20% faster here, more at scale; a 64-bit
    collision would only nudge one pair's `common` count).

    MULTIPLICITY COLLAPSE (the 100 TB duplicate-saturation path,
    ADAPTIVE since r6): when the corpus-level duplication stat says
    duplicates are saturated (see ``_duplication_ratio``), the pipeline
    first groups EXACT-duplicate texts to one representative (one
    linear shuffle on a 16-byte content hash — ``_text_groups``), runs
    the quadratic pair expansion on representatives only, then expands
    the small result back to doc-id pairs (cross pairs inherit the rep
    pair's jaccard; within-group pairs are jaccard 1.0 by
    construction).  On a K×-duplicated corpus this turns the K² term
    in the pair SHUFFLE into pure output materialization — measured on
    the sf1 ladder (10× replicated texts, SCALE.md).  A unique corpus
    skips the collapse entirely and pays zero extra exchanges."""
    d = load(spark, sf, "documents")
    ratio = _duplication_ratio(d, "text", (sf, "documents.text"))
    return _adaptive_jaccard_pairs(spark, sf, d, ratio)


def jaccard_pairs_for_table(table) -> "DataFrame":
    """x2's adaptive pipeline over a WAREHOUSE documents table: the
    collapse gate answers from the table's persisted snapshot-keyed
    NDV statistic (icepack/stats.py — computed once, reused by every
    later session with zero extra scans while the bracket holds),
    instead of the per-fixture-path session memo the parquet bench
    queries use."""
    ratio = table.duplication_ratio("text", threshold=_COLLAPSE_AT)
    return _adaptive_jaccard_pairs(
        table.spark, "", table.toDF().select("doc_id", "text"), ratio
    )


def _adaptive_jaccard_pairs(spark, sf, d, ratio: float) -> "DataFrame":
    """Shared x2 body: direct inverted-index path for unique corpora,
    multiplicity-collapsed path once ``ratio`` crosses the gate."""
    if ratio < _COLLAPSE_AT:
        rep_pairs, _ = _jaccard_pairs_core(spark, sf, d.select("doc_id", "text"))
        return rep_pairs
    groups = _text_groups(d)
    reps = groups.select(F.col("rep").alias("doc_id"), "text")
    rep_pairs, ex = _jaccard_pairs_core(spark, sf, reps)
    # expand representative pairs back to all duplicate members (the
    # rep-pair result is output-sized, so these joins are tiny)
    mem = groups.select("rep", "members")
    cross = (
        rep_pairs.join(
            mem.select(F.col("rep").alias("id_a"), F.col("members").alias("ma")),
            "id_a",
        )
        .join(
            mem.select(F.col("rep").alias("id_b"), F.col("members").alias("mb")),
            "id_b",
        )
        .select(F.explode("ma").alias("x"), "mb", "jaccard")
        .select("x", F.explode("mb").alias("y"), "jaccard")
        .select(
            F.least("x", "y").alias("id_a"),
            F.greatest("x", "y").alias("id_b"),
            "jaccard",
        )
    )
    # exact-duplicate groups: every member pair is jaccard 1.0 — but
    # only for texts that HAVE shingles (<3 words produce no pairs in
    # the expanded formulation either)
    shingled = ex.select(F.col("doc_id").alias("rep")).distinct()
    within = (
        groups.filter(F.size("members") > 1)
        .join(shingled, "rep")
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(members) - 1),"
                    " i -> transform(slice(members, i + 1, size(members) - i),"
                    " y -> struct(members[i-1] AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", F.lit(1.0).alias("jaccard"))
    )
    return cross.unionByName(within)


@query(
    "x21_repetition_ratio",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id, lang,
             CASE WHEN len(w) < 3 THEN 0.0
                  ELSE 1.0 - CAST(len(list_distinct(list_transform(
                               range(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS DOUBLE)
                           / (len(w) - 2)
             END AS rep
      FROM t
    )
    SELECT lang,
           ROUND(AVG(rep), 4) AS avg_rep,
           ROUND(MAX(rep), 4) AS max_rep,
           COUNT(*) FILTER (rep > 0.05) AS n_repetitive
    FROM g GROUP BY lang
    """,
)
def x21_repetition_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document repetition (a Gopher/RefinedWeb-style quality
    rule): fraction of a doc's word-trigrams that are duplicates of an
    earlier trigram in the SAME doc.  Everything per-row is
    higher-order array functions (transform/sequence/array_distinct) —
    zero shuffles and zero Python until the tiny per-lang aggregate, so
    at 100 TB this is a single codegen'd scan pass."""
    d = load(spark, sf, "documents").withColumn("w", F.split("text", " "))
    n = F.size("w")
    grams = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("w", i), F.element_at("w", i + 1), F.element_at("w", i + 2)
        ),
    )
    # CaseWhen evaluates the matched branch only, guarding the
    # sequence() call against n<3 (where 1-based indexing would fail)
    rep = F.when(n < 3, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(grams)).cast("double") / (n - 2)
    )
    return (
        d.withColumn("rep", rep)
        .groupBy("lang")
        .agg(
            F.round(F.avg("rep"), 4).alias("avg_rep"),
            F.round(F.max("rep"), 4).alias("max_rep"),
            F.sum((F.col("rep") > 0.05).cast("long")).alias("n_repetitive"),
        )
    )


def _contamination_core(
    spark: SparkSession, sf: str, eval_docs: DataFrame, train_docs: DataFrame
) -> DataFrame:
    """(train_id, eval_id, common≥3) shared trigram counts: eval side
    shingled small and BROADCAST, train side streams through the hash
    join without ever shuffling — shared by x22's direct and
    multiplicity-collapsed paths."""
    ev = _shingle_rows(
        spark, sf, distinct=True, docs=eval_docs, hashed=True
    ).select("sh", F.col("doc_id").alias("eval_id"))
    tr = _shingle_rows(
        spark, sf, distinct=True, docs=train_docs, hashed=True
    ).select("sh", F.col("doc_id").alias("train_id"))
    return (
        tr.join(F.broadcast(ev), "sh")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= 3)
    )


@query(
    "x22_contamination",
    oracle="""
    WITH sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(w) - 1, 1)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
      FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)
    ),
    ev AS (SELECT doc_id, s FROM sh WHERE source = 'src0'),
    tr AS (SELECT doc_id, s FROM sh WHERE source <> 'src0')
    SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id, COUNT(*) AS common
    FROM tr JOIN ev ON tr.s = ev.s
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)
def x22_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark-contamination screen: flag training docs sharing ≥3
    distinct word-trigrams with any doc of the held-out set (source
    'src0' stands in for an eval benchmark).

    The eval side is a FIXED benchmark suite — at 100 TB it stays
    benchmark-sized while the train corpus grows without bound, so the
    scale-correct plan is: build the eval shingle set small (filter
    pushed to its scan), BROADCAST it, and stream every train shingle
    through the broadcast hash join — the train corpus never shuffles
    at all; the only exchange is the (train,eval) pair count, bounded
    by eval hits.  (The earlier inverted-index spelling grouped the
    whole corpus by shingle; measured 40% slower here and needlessly
    shuffles the 100 TB side.)  The shingle string never surfaces —
    join on its xxhash64 instead (8-byte keys).

    MULTIPLICITY COLLAPSE (r5, ADAPTIVE since r6 — as in x2/x13): when
    the corpus duplication stat warrants it, exact-duplicate texts on
    BOTH sides group to representatives (16-byte content-hash keys,
    ``_text_groups``) before shingling; the (train, eval) pairs expand
    back from the output-sized result — on a duplicate-saturated
    corpus the join and count run once per distinct text, not once per
    copy.  A unique corpus skips the collapse and its exchange."""
    d = load(spark, sf, "documents")
    if _duplication_ratio(d, "text", (sf, "documents.text")) < _COLLAPSE_AT:
        return _contamination_core(
            spark,
            sf,
            d.filter(F.col("source") == "src0").select("doc_id", "text"),
            d.filter(F.col("source") != "src0").select("doc_id", "text"),
        )
    eg = _text_groups(d.filter(F.col("source") == "src0"))
    tg = _text_groups(d.filter(F.col("source") != "src0"))
    rep_pairs = _contamination_core(
        spark,
        sf,
        eg.select(F.col("rep").alias("doc_id"), "text"),
        tg.select(F.col("rep").alias("doc_id"), "text"),
    )
    return (
        rep_pairs.join(
            tg.select(F.col("rep").alias("train_id"), F.col("members").alias("mt")),
            "train_id",
        )
        .join(
            F.broadcast(
                eg.select(F.col("rep").alias("eval_id"), F.col("members").alias("me"))
            ),
            "eval_id",
        )
        .select(F.explode("mt").alias("train_id"), "me", "common")
        .select("train_id", F.explode("me").alias("eval_id"), "common")
    )


@query(
    "x24_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, lang, unnest(string_split_regex(text, '')) AS c FROM documents
    ),
    cc AS (SELECT doc_id, lang, c, COUNT(*) AS n FROM chars WHERE c <> '' GROUP BY 1, 2, 3),
    tot AS (SELECT doc_id, SUM(n) AS total FROM cc GROUP BY 1),
    per_doc AS (
      SELECT cc.doc_id, cc.lang,
             ROUND(-SUM((n / total) * log2(n / total)), 6) AS h
      FROM cc JOIN tot ON cc.doc_id = tot.doc_id GROUP BY 1, 2
    )
    SELECT lang,
           ROUND(AVG(h), 4) AS avg_entropy,
           ROUND(MIN(h), 4) AS min_entropy,
           COUNT(*) FILTER (h < 3.8) AS n_low_entropy
    FROM per_doc GROUP BY lang
    """,
)
def x24_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    gibberish/boilerplate detector (low entropy = repeated or
    templated text, abnormally high = random noise).  Char counts
    aggregate in one (doc_id, char) shuffle; the per-doc entropy is a
    higher-order `aggregate` over the collected count list (stays in
    the doc_id partitioning — no window, no second wide exchange), and
    only the tiny per-lang rollup shuffles again."""
    d = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    chars = d.select("doc_id", "lang", F.explode(F.split("text", "")).alias("c")).filter(
        F.col("c") != ""
    )
    cc = chars.groupBy("doc_id", "lang", "c").agg(F.count("*").alias("n"))
    per_doc = cc.groupBy("doc_id", "lang").agg(
        F.collect_list("n").alias("ns"), F.sum("n").alias("total")
    )
    p = lambda n: n.cast("double") / F.col("total")
    h = F.round(
        -F.aggregate(
            "ns", F.lit(0.0), lambda acc, n: acc + p(n) * F.log2(p(n))
        ),
        6,
    )
    return (
        per_doc.withColumn("h", h)
        .groupBy("lang")
        .agg(
            F.round(F.avg("h"), 4).alias("avg_entropy"),
            F.round(F.min("h"), 4).alias("min_entropy"),
            F.sum((F.col("h") < 3.8).cast("long")).alias("n_low_entropy"),
        )
    )


#: one-base-hash MinHash (datasketch-style): H = 28-bit md5 prefix per
#: shingle, then 8 affine permutations (A[s]*H + B[s]) mod M.  ONE md5
#: per shingle instead of 8 — the Spark pipeline and the DuckDB oracle
#: are both generated from these constants.
_MH_A = [769, 1031, 1543, 2053, 3079, 6151, 12289, 24593]
_MH_B = [
    12582917, 25165843, 50331653, 100663319,
    201326611, 402653189, 805306457, 1610612741,
]
_MH_M = 2147483647

_SQL_MINHASH_BANDS = (
    _SQL_SHINGLES
    + """
    , ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh_tbl),
    hv AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 7))::BIGINT AS h FROM ex),
    mh AS (
      SELECT doc_id,
             """
    + ",\n             ".join(
        f"MIN(({a} * h + {b}) % {_MH_M}) AS h{s}"
        for s, (a, b) in enumerate(zip(_MH_A, _MH_B))
    )
    + """
      FROM hv GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band, CAST(h0 AS VARCHAR) || '_' || CAST(h1 AS VARCHAR) AS bkey FROM mh UNION ALL
      SELECT doc_id, 1 AS band, CAST(h2 AS VARCHAR) || '_' || CAST(h3 AS VARCHAR) AS bkey FROM mh UNION ALL
      SELECT doc_id, 2 AS band, CAST(h4 AS VARCHAR) || '_' || CAST(h5 AS VARCHAR) AS bkey FROM mh UNION ALL
      SELECT doc_id, 3 AS band, CAST(h6 AS VARCHAR) || '_' || CAST(h7 AS VARCHAR) AS bkey FROM mh
    )
"""
)


def _seed_min(s: int):
    # NOT `lambda x, s=s`: pyspark reads lambda arity, and a 2-arg
    # lambda becomes an (element, index) lambda — the default arg
    # would silently bind the index Column, not the seed
    a, b = _MH_A[s], _MH_B[s]
    return F.array_min(
        F.transform("hv", lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_MH_M))
    ).alias(f"h{s}")


def _minhash_sigs(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, h0..h7) MinHash signatures — the shared front half of
    the LSH dedup path (x3) and the estimate-vs-exact audit (x36).
    Computed entirely per row: shingle array via transform(sequence),
    ONE md5 per shingle to a 28-bit base hash, then the 8 signature
    mins as affine permutations of that base — zero shuffles before
    banding."""
    d = load(spark, sf, "documents").withColumn("w", F.split("text", " "))
    shingles = F.transform(
        F.sequence(F.lit(1), F.size("w") - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("w", i), F.element_at("w", i + 1), F.element_at("w", i + 2)
        ),
    )
    base = F.transform(
        shingles, lambda x: F.conv(F.substring(F.md5(x), 1, 7), 16, 10).cast("long")
    )
    docs = d.filter(F.size("w") >= 3).select("doc_id", base.alias("hv"))
    return docs.select("doc_id", *[_seed_min(s) for s in range(8)])


@query(
    "x3_minhash_lsh",
    oracle=_SQL_MINHASH_BANDS
    + """
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    """,
)
def x3_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash + LSH banding (8 hashes, 4 bands × 2 rows): candidate
    pairs are docs colliding on any band key.  This is the 100 TB dedup
    path: cost is O(docs × shingles) + a join on band keys (bounded
    buckets), never O(n²).

    The signature is computed entirely PER ROW — shingle array via
    transform(sequence), ONE md5 per shingle to a 28-bit base hash,
    then the 8 signature mins as affine permutations of that base
    (the standard one-base-hash MinHash, cf. datasketch) — so the
    pre-band pipeline has ZERO shuffles (the explode + groupBy(doc_id)
    spelling shuffles every shingle row twice; measured ~2× slower
    steady-state here and unboundedly worse at scale).  CollapseProject
    keeps the shared hash array materialized once per row, not once
    per seed (non-cheap expression referenced 8×, so Catalyst won't
    inline it).  Docs with <3 words have no shingles and drop out,
    matching the oracle's empty unnest."""
    mh = _minhash_sigs(spark, sf)
    bands = mh.select(
        "doc_id",
        F.expr(
            "stack(4, 0, concat(h0, '_', h1), 1, concat(h2, '_', h3),"
            " 2, concat(h4, '_', h5), 3, concat(h6, '_', h7)) AS (band, bkey)"
        ),
    )
    # pair generation per bucket via collect_list, not a self-join: the
    # minhash pipeline executes ONCE, and LSH bucket sizes are bounded
    # (that's the point of banding), so the in-bucket pair expansion is
    # small.  ids arrive sorted → id_a < id_b by construction.
    buckets = (
        bands.groupBy("band", "bkey")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(ids) - 1),"
                " i -> transform(slice(ids, i + 1, size(ids) - i),"
                " y -> struct(ids[i-1] AS id_a, y AS id_b))))"
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


_X4_BIT_SUMS = ",\n             ".join(
    f"SUM(((h >> {j}) & 1) * 2 - 1) AS b{j}" for j in range(48)
)
_X4_RECOMBINE = "\n           + ".join(
    f"(CASE WHEN b{j} > 0 THEN (1::BIGINT << {j}) ELSE 0 END)" for j in range(48)
)


@query(
    "x4_simhash",
    oracle=f"""
    WITH words AS (
      SELECT doc_id,
             ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 12))::BIGINT AS h
      FROM documents
    ),
    bits AS (
      SELECT doc_id,
             {_X4_BIT_SUMS}
      FROM words GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({_X4_RECOMBINE} AS BIGINT) AS simhash
    FROM bits
    """,
)
def x4_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """48-bit SimHash over word md5s — the md5 hex prefix makes the
    hash portable, so the whole bit-twiddle has an exact DuckDB oracle
    (generated column-per-bit SQL).  Invariants additionally
    pytest-checked: identical word multisets hash identically,
    near-identical docs land within small Hamming distance.  Fully
    distributed: explode words, one conditional-sum aggregation per
    bit, recombine."""
    return _simhash_df(spark, sf)


def _simhash_df(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, simhash) — shared by x4 (the fingerprint itself) and
    x54 (the banded-Hamming near-dup join over it)."""
    d = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    # 48-bit word hash from the first 12 hex chars of md5 (fits a long)
    h = F.conv(F.substring(F.md5("w"), 1, 12), 16, 10).cast("long")
    words = words.withColumn("h", h)
    bit_sums = words.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright("h", j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
            for j in range(48)
        ]
    )
    sim = None
    for j in range(48):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.cast("long").alias("simhash"))


# --- embedding similarity ---------------------------------------------------

#: dot(a, b) over 64-dim float lists, computed in double, both engines.
_SQL_DOT = (
    "list_sum(list_transform(range(1, 65),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


#: embedding vectors are fixed 64-dim across every fixture SF (the
#: oracle's range(1, 65) hardcodes the same width)
_EMB_DIM = 64


def _dot(a, b):
    """Compact dot product: aggregate(zip_with(...)) higher-order form.

    Interpreted (no whole-stage codegen), but the expression tree is
    ~20 nodes.  r13 measured the alternatives: a 64-term unrolled tree
    IS ~3× faster per row in a plain scan Project, but wherever the
    optimizer DUPLICATES the expression (join keys cloned into inferred
    isnotnull filters, sort keys into projections) the big tree
    multiplies analyzer/optimizer time 4-6× (x5/x39 plan construction),
    and inside a join's codegen consume path it ran ~2× SLOWER than
    this form (JIT bailout on the huge generated method).  Every
    remaining _dot site is per-ROW (n evaluations, never n²), so the
    compact tree wins overall; the one quadratic site (x48's
    within-bucket pairs) scores whole buckets in numpy instead
    (:func:`_x48_rep_pairs`)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@query(
    "x5_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.label,
             {_SQL_DOT.format(a='e.embedding', b='q.qv')}
             / (sqrt({_SQL_DOT.format(a='e.embedding', b='e.embedding')})
                * sqrt({_SQL_DOT.format(a='q.qv', b='q.qv')})) AS cos
      FROM embeddings e CROSS JOIN q
    )
    SELECT vec_id, label, ROUND(cos, 4) AS cos_sim
    FROM scored
    ORDER BY ROUND(cos, 6) DESC, vec_id
    LIMIT 10
    """,
)
def x5_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-k (the exact baseline): broadcast the
    1-row query vector, score with JVM-side higher-order functions
    (zip_with/aggregate — no Python in the loop), TakeOrderedAndProject
    for the top-k.  Scales linearly; the bucketed ANN variant below is
    the sub-linear path."""
    e = load(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = e.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        (
            _dot(F.col("embedding"), F.col("qv"))
            / (
                F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(_dot(F.col("qv"), F.col("qv")))
            )
        ).alias("cos"),
    )
    return (
        scored.orderBy(F.round("cos", 6).desc(), F.asc("vec_id"))
        .select("vec_id", "label", F.round("cos", 4).alias("cos_sim"))
        .limit(10)
    )


@query(
    "x6_ann_bucketed",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding,
             CAST(embedding[1] > 0 AS INT) * 2 + CAST(embedding[2] > 0 AS INT) AS bucket
      FROM embeddings
    ),
    q AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0),
    scored AS (
      SELECT b.vec_id, b.label,
             {_SQL_DOT.format(a='b.embedding', b='q.qv')}
             / (sqrt({_SQL_DOT.format(a='b.embedding', b='b.embedding')})
                * sqrt({_SQL_DOT.format(a='q.qv', b='q.qv')})) AS cos
      FROM b JOIN q ON b.bucket = q.qb
    )
    SELECT vec_id, label, ROUND(cos, 4) AS cos_sim
    FROM scored ORDER BY ROUND(cos, 6) DESC, vec_id LIMIT 5
    """,
)
def x6_ann_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style ANN: a coarse quantizer (sign of the first two dims →
    4 cells) assigns every vector to a bucket; search only the query's
    bucket.  At 100 TB the quantizer would be k-means centroids and the
    table partitioned by bucket so a probe touches one partition."""
    e = load(spark, sf, "embeddings")
    bucket = (F.element_at("embedding", 1) > 0).cast("int") * 2 + (
        F.element_at("embedding", 2) > 0
    ).cast("int")
    b = e.withColumn("bucket", bucket)
    q = b.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qb")
    )
    scored = b.join(F.broadcast(q), b.bucket == q.qb).select(
        "vec_id",
        "label",
        (
            _dot(F.col("embedding"), F.col("qv"))
            / (
                F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(_dot(F.col("qv"), F.col("qv")))
            )
        ).alias("cos"),
    )
    return (
        scored.orderBy(F.round("cos", 6).desc(), F.asc("vec_id"))
        .select("vec_id", "label", F.round("cos", 4).alias("cos_sim"))
        .limit(5)
    )


@query(
    "x7_text_quality",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(len(w)), 4) AS avg_tokens,
           ROUND(AVG(CAST(len(list_filter(w, x -> x IN ('the', 'data', 'a')))
                       AS DOUBLE) / len(w)), 4) AS avg_stop_ratio,
           ROUND(AVG(CAST(len(list_distinct(w)) AS DOUBLE) / len(w)), 4)
             AS avg_uniq_ratio
    FROM (SELECT lang, string_split(text, ' ') AS w FROM documents)
    GROUP BY lang
    """,
)
def x7_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Quality scoring: token count, stopword ratio, distinct-token
    ratio — per-language aggregates.  All higher-order array functions,
    zero Python."""
    d = load(spark, sf, "documents").withColumn("w", F.split("text", " "))
    n = F.size("w")
    stop = F.size(F.filter("w", lambda x: x.isin("the", "data", "a")))
    uniq = F.size(F.array_distinct("w"))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(n), 4).alias("avg_tokens"),
        F.round(F.avg(stop.cast("double") / n), 4).alias("avg_stop_ratio"),
        F.round(F.avg(uniq.cast("double") / n), 4).alias("avg_uniq_ratio"),
    )


@query(
    "x8_fingerprint",
    oracle="""
    SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fingerprint,
           COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
    FROM documents GROUP BY 1
    """,
)
def x8_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprinting: md5 over the sorted distinct word set —
    docs with identical vocabularies collide (a cheap container-level
    dedup signal)."""
    d = load(spark, sf, "documents")
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " ")))))
    return d.groupBy(fp.alias("fingerprint")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc")
    )


@query(
    "x9_binary_meta",
    oracle="""
    SELECT lang, COUNT(*) AS n,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes
    FROM documents GROUP BY lang
    """,
)
def x9_binary_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal plumbing: treat payloads as opaque bytes + typed
    metadata.  Here text→utf8 bytes stands in for image/audio blobs;
    the decode/feature UDF pipeline lives in
    icepack/multimodal.py (mapInPandas over binary columns, stubbed
    decode)."""
    d = load(spark, sf, "documents")
    blob = F.encode("text", "utf-8")
    return d.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum(F.octet_length(blob)).cast("bigint").alias("total_bytes"),
        F.max(F.octet_length(blob)).cast("bigint").alias("max_bytes"),
    )


@query(
    "x11_token_regex",
    oracle="""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT)
             AS n_tokens,
           CAST(MAX(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT)
             AS max_tokens
    FROM documents GROUP BY lang
    """,
)
def x11_token_regex(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-ish regex tokenization (word/number pieces) — token counting
    entirely in JVM regexp, no Python."""
    d = load(spark, sf, "documents")
    toks = F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), 0))
    return d.groupBy("lang").agg(
        F.sum(toks).cast("bigint").alias("n_tokens"),
        F.max(toks).cast("bigint").alias("max_tokens"),
    )


@query(
    "x12_lang_id",
    oracle="""
    SELECT lang,
           CASE
             WHEN len(list_filter(string_split(text, ' '),
                      w -> w IN ('the', 'data', 'query'))) * 5
                  >= len(string_split(text, ' ')) THEN 'en-like'
             ELSE 'other'
           END AS predicted,
           COUNT(*) AS n
    FROM documents GROUP BY 1, 2
    """,
)
def x12_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID heuristic: n-gram/stopword evidence ratio → label.
    (A real LID model swaps in as a pandas_udf over the same shape; the
    classification plumbing — per-doc score → label → distribution —
    is what's exercised.)"""
    d = load(spark, sf, "documents").withColumn("w", F.split("text", " "))
    hits = F.size(F.filter("w", lambda x: x.isin("the", "data", "query")))
    pred = F.when(hits * 5 >= F.size("w"), F.lit("en-like")).otherwise(F.lit("other"))
    return d.groupBy("lang", pred.alias("predicted")).agg(F.count("*").alias("n"))


@query(
    "x13_embedding_neardup",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             CAST(embedding[1] > 0 AS INT) * 2 + CAST(embedding[2] > 0 AS INT) AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_SQL_DOT.format(a='a.embedding', b='b.embedding')}
             / (sqrt({_SQL_DOT.format(a='a.embedding', b='a.embedding')})
                * sqrt({_SQL_DOT.format(a='b.embedding', b='b.embedding')})), 4) AS cos_sim
    FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_SQL_DOT.format(a='a.embedding', b='b.embedding')}
          / (sqrt({_SQL_DOT.format(a='a.embedding', b='a.embedding')})
             * sqrt({_SQL_DOT.format(a='b.embedding', b='b.embedding')})) > 0.5
    """,
)
def x13_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup with LSH-style blocking: sign-bucket
    the vectors, then score each block with ONE vectorized gram-matrix
    pass inside applyInPandas.  The 100 TB-safe shape twice over: an
    unblocked O(n²) cross join never happens, and — unlike a
    join-then-score plan — the shuffle moves only n vector rows, never
    the n²/buckets candidate-pair rows (at sf0.1 that join shape
    materialized ~500k pairs × two 64-dim arrays ≈ 0.5 GB through the
    Arrow boundary and ran 10× slower; measured).  Block size is
    bounded by the bucket-bit count: at larger n, add sign bits so a
    block's gram matrix stays in executor memory — same knob that
    bounds candidate pairs in any LSH design.

    MULTIPLICITY COLLAPSE (r5, ADAPTIVE since r6 — mirroring x2): when
    the duplication stat warrants it, exact-duplicate vectors group to
    one representative before blocking (keyed by two independent
    order-sensitive rolling hashes — 16 bytes through the exchange
    instead of the full vector), so a K×-duplicated corpus (the sf1
    ladder) pays K²-fold only in output materialization, not in the
    gram matrices; cross pairs inherit the rep pair's cosine,
    within-group pairs are exactly 1.0 (identical nonzero vectors).
    A unique corpus skips the collapse — r5 paid its exchange
    unconditionally and regressed 2.1× at sf0.1."""
    e = load(spark, sf, "embeddings")
    bucket = (F.element_at("embedding", 1) > 0).cast("int") * 2 + (
        F.element_at("embedding", 2) > 0
    ).cast("int")

    def score_block(pdf):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        V = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
        G = V @ V.T  # num(i,j) = dot(vᵢ, vⱼ); diag = self-dots
        nrm = np.sqrt(np.diag(G))
        cos = G / np.outer(nrm, nrm)
        ia, ib = np.triu_indices(len(ids), k=1)  # sorted ids → id_a < id_b
        # filter on the UNROUNDED cosine (matching the oracle's WHERE);
        # rounding is presentation only
        keep = cos[ia, ib] > 0.5
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cos_sim": np.round(cos[ia[keep], ib[keep]], 4),
            }
        )

    out_schema = "id_a bigint, id_b bigint, cos_sim double"
    if _duplication_ratio(e, "embedding", (sf, "embeddings.embedding")) < _COLLAPSE_AT:
        b = e.select("vec_id", "embedding", bucket.alias("bucket"))
        return b.groupBy("bucket").applyInPandas(score_block, out_schema)
    # order-sensitive rolling hashes over the elements, JVM-side: the
    # collapse exchange carries 16-byte keys, never the 512-byte vector
    h1 = F.expr("aggregate(embedding, 0L, (a, x) -> xxhash64(a, x))")
    h2 = F.expr("aggregate(embedding, 1L, (a, x) -> xxhash64(a, x))")
    groups = e.groupBy(h1.alias("_h1"), h2.alias("_h2")).agg(
        F.min("vec_id").alias("rep"),
        F.sort_array(F.collect_list("vec_id")).alias("members"),
        F.first("embedding").alias("embedding"),
    )
    b = groups.select(
        F.col("rep").alias("vec_id"), "embedding", bucket.alias("bucket")
    )
    rep_pairs = b.groupBy("bucket").applyInPandas(score_block, out_schema)
    mem = groups.select("rep", "members")
    cross = (
        rep_pairs.join(
            mem.select(F.col("rep").alias("id_a"), F.col("members").alias("ma")),
            "id_a",
        )
        .join(
            mem.select(F.col("rep").alias("id_b"), F.col("members").alias("mb")),
            "id_b",
        )
        .select(F.explode("ma").alias("x"), "mb", "cos_sim")
        .select("x", F.explode("mb").alias("y"), "cos_sim")
        .select(
            F.least("x", "y").alias("id_a"),
            F.greatest("x", "y").alias("id_b"),
            "cos_sim",
        )
    )
    # identical-vector groups: cos is exactly 1.0 — except the zero
    # vector, whose cosine is undefined (the gram path yields NaN and
    # drops it; match that)
    sumsq = F.expr(
        "aggregate(embedding, cast(0.0 as double), (a, x) -> a + x * x)"
    )
    within = (
        groups.filter((F.size("members") > 1) & (sumsq > 0))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(members) - 1),"
                    " i -> transform(slice(members, i + 1, size(members) - i),"
                    " y -> struct(members[i-1] AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", F.lit(1.0).alias("cos_sim"))
    )
    return cross.unionByName(within)


@query(
    "x14_variant_json",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                              BETWEEN 10 AND 90
                         THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS sum_mid_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def x14_variant_json(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 VARIANT path (docs/12:96-104): parse_json →
    variant_get with a typed path — the engine-native semi-structured
    column, vs. the string-based get_json_object in p5."""
    ev = load(spark, sf, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    mid = F.when(k.between(10, 90), k).otherwise(F.lit(0))
    return ev.groupBy("event_type").agg(
        F.sum(mid).cast("bigint").alias("sum_mid_k"), F.count("*").alias("n")
    )


@query(
    "x15_multimodal_features",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(string_split_regex(text, '')) AS ch FROM documents
    ),
    sums AS (
      SELECT doc_id, SUM(ord(ch)) AS bsum, COUNT(*) AS n
      FROM chars WHERE ch <> '' GROUP BY doc_id
    ),
    feats AS (
      SELECT s.doc_id,
             s.bsum / s.n AS byte_mean,
             CAST(
               ord(substr(d.text, 1, 1))
               + ord(substr(d.text, CAST(s.n // 3 AS INT) + 1, 1))
               + ord(substr(d.text, CAST((2 * s.n) // 3 AS INT) + 1, 1))
               + (s.bsum % 256)
             AS BIGINT) % 16 AS bucket
      FROM sums s JOIN documents d ON s.doc_id = d.doc_id
    )
    SELECT 'text/plain' AS mime, CAST(bucket AS INT) AS byte_entropy_bucket,
           COUNT(*) AS n, ROUND(AVG(byte_mean), 4) AS avg_byte_mean
    FROM feats GROUP BY bucket
    """,
)
def x15_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """X5 plumbing end-to-end: pack text as opaque binary payloads,
    Arrow-batched mapInPandas feature extraction, aggregate per mime.
    The oracle recomputes the byte statistics from the characters
    (the fixture corpus is pure ASCII, so ord(char) == payload byte —
    the fake-decode grid is [b0, b(n//3), b(2n//3), sum%256]);
    determinism + shape invariants are additionally pytest-covered
    (tests/test_multimodal.py, incl. the JVM-crc32 pin)."""
    from ..multimodal import attach_binary_payload, extract_features

    d = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    feats = extract_features(attach_binary_payload(d))
    return feats.groupBy("mime", "byte_entropy_bucket").agg(
        F.count("*").alias("n"),
        F.round(F.avg("byte_mean"), 4).alias("avg_byte_mean"),
    )


_SQL_BAND_EDGES = (
    _SQL_MINHASH_BANDS
    + """
    , pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
"""
)


@query(
    "x16_dedup_clusters",
    # the walk CTE is recursive → the whole WITH list needs RECURSIVE
    oracle=_SQL_BAND_EDGES.replace("WITH sh_tbl", "WITH RECURSIVE sh_tbl", 1)
    + """
    , edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    verts AS (SELECT DISTINCT s AS id FROM edges),
    walk(id, label) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.d, w.label FROM walk w JOIN edges e ON e.s = w.id
    )
    SELECT id AS doc_id, MIN(label) AS cluster FROM walk GROUP BY id
    """,
)
def x16_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-CLUSTER assignment: MinHash/LSH candidate pairs →
    connected components (iterative min-label propagation,
    icepack/dedup.py) → one cluster id per near-dup group; the dedup
    survivor is then min(doc_id) per cluster.  The oracle computes the
    same components with a recursive CTE over the identical md5-band
    edges."""
    from ..dedup import connected_components

    pairs = REGISTRY["x3_minhash_lsh"](spark, sf)
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("cluster")
    )


@query(
    "x23_dedup_keep_best",
    oracle=_SQL_BAND_EDGES.replace("WITH sh_tbl", "WITH RECURSIVE sh_tbl", 1)
    + """
    , edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    verts AS (SELECT DISTINCT s AS id FROM edges),
    walk(id, label) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.d, w.label FROM walk w JOIN edges e ON e.s = w.id
    ),
    assign AS (SELECT id AS doc_id, MIN(label) AS cluster FROM walk GROUP BY id),
    ranked AS (
      SELECT a.cluster, d.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY a.cluster
                                ORDER BY d.n_chars DESC, d.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY a.cluster) AS n_members
      FROM assign a JOIN documents d ON a.doc_id = d.doc_id
    )
    SELECT cluster, n_members, doc_id AS keep_id, n_chars AS keep_chars
    FROM ranked WHERE rn = 1
    """,
)
def x23_dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """The dedup POLICY step: given near-dup clusters (x16), pick the
    canonical survivor per cluster — here "longest copy wins" (common
    for web corpora: truncated mirrors lose), doc_id as tiebreak.
    The cluster map is joined to documents on doc_id (hash join on the
    natural key — NOT broadcast: the map scales with the duplicate
    count, i.e. with the corpus); ranking reuses the cluster hash
    partitioning for its window."""
    from pyspark.sql import Window as W

    from ..dedup import connected_components

    pairs = REGISTRY["x3_minhash_lsh"](spark, sf)
    assign = connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("cluster")
    )
    d = load(spark, sf, "documents").select("doc_id", "n_chars")
    win = W.partitionBy("cluster").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        assign.join(d, "doc_id")
        .withColumn("rn", F.row_number().over(win))
        .withColumn("n_members", F.count("*").over(W.partitionBy("cluster")))
        .filter(F.col("rn") == 1)
        .select(
            "cluster",
            "n_members",
            F.col("doc_id").alias("keep_id"),
            F.col("n_chars").alias("keep_chars"),
        )
    )


@query(
    "x17_tfidf_terms",
    oracle="""
    WITH words AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tf AS (SELECT lang, w, COUNT(*) AS tf FROM words GROUP BY 1, 2),
    docfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS n_docs FROM words GROUP BY 1),
    total AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.lang, tf.w AS term,
             tf.tf * ln(CAST(total.n AS DOUBLE) / docfreq.n_docs) AS score
      FROM tf JOIN docfreq ON tf.w = docfreq.w CROSS JOIN total
    ),
    ranked AS (
      SELECT lang, term, score,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY ROUND(score, 6) DESC, term) AS rn
      FROM scored
    )
    SELECT lang, term, ROUND(score, 4) AS tfidf,
           CAST(rn AS INTEGER) AS rn
    FROM ranked WHERE rn <= 5
    """,
)
def x17_tfidf_terms(spark: SparkSession, sf: str) -> DataFrame:
    """TF-IDF top-5 terms per language: term frequency per (lang, term)
    × inverse document frequency — the classic content-signature
    operator.  The doc-frequency table is dimension-small → broadcast;
    ranking ties break on the term for cross-engine determinism."""
    from pyspark.sql import Window as W

    d = load(spark, sf, "documents")
    total = d.count()  # scalar; at 100 TB use a broadcast 1-row agg
    words = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    tf = words.groupBy("lang", "w").agg(F.count("*").alias("tf"))
    df_ = words.groupBy("w").agg(F.countDistinct("doc_id").alias("n_docs"))
    tfidf = F.col("tf") * F.log(F.lit(float(total)) / F.col("n_docs"))
    win = W.partitionBy("lang").orderBy(F.round(tfidf, 6).desc(), F.asc("w"))
    return (
        tf.join(F.broadcast(df_), "w")
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 5)
        .select("lang", F.col("w").alias("term"), F.round(tfidf, 4).alias("tfidf"), "rn")
    )


@query(
    "x10_doc_embedding_join",
    oracle=f"""
    SELECT e.label, COUNT(*) AS n_docs,
           ROUND(AVG(d.n_chars), 2) AS avg_chars,
           ROUND(AVG(sqrt({_SQL_DOT.format(a='e.embedding', b='e.embedding')})), 4)
             AS avg_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY e.label
    """,
)
def x10_doc_embedding_join(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal join: text table ⋈ vector table on the shared id."""
    d = load(spark, sf, "documents")
    e = load(spark, sf, "embeddings")
    norm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.avg(norm), 4).alias("avg_norm"),
        )
    )


@query(
    "x18_hash_sample",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE substring(md5('sample42|' || CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE WHEN lang = 'en' THEN '40' ELSE 'c0' END
    """,
)
def x18_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sampling — the reproducible
    train/holdout selector a training-data pipeline needs (rand()
    resamples differently per run and per retry; a content hash never
    does).  Keep probability is a lexicographic threshold on the first
    hex byte of a salted md5: 'en' (over-represented) keeps ~25%
    (< '40'), every other lang ~75% (< 'c0').  Pure narrow plan: the
    predicate evaluates at the scan — no shuffle, no state, and the
    same rows are kept at any cluster size or retry."""
    d = load(spark, sf, "documents")
    h = F.substring(
        F.md5(F.concat(F.lit("sample42|"), F.col("doc_id").cast("string"))), 1, 2
    )
    keep = h < F.when(F.col("lang") == "en", "40").otherwise("c0")
    return d.filter(keep).select("doc_id", "lang", "source")


@query(
    "x19_weighted_mix",
    oracle="""
    WITH kept AS (
      SELECT doc_id, lang FROM documents
      WHERE lang <> 'en'
         OR substring(md5('mix42|' || CAST(doc_id AS VARCHAR)), 1, 2) < '80'
    ),
    mixed AS (
      SELECT doc_id, lang FROM kept
      UNION ALL SELECT doc_id, lang FROM kept WHERE lang IN ('zh', 'de')
      UNION ALL SELECT doc_id, lang FROM kept WHERE lang = 'zh'
    )
    SELECT lang, COUNT(*) AS n_mixed, COUNT(DISTINCT doc_id) AS n_unique
    FROM mixed GROUP BY lang
    """,
)
def x19_weighted_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted dataset mixing for a training corpus: downsample the
    over-represented stratum (en → deterministic 50% hash sample) and
    upsample the rare ones (zh ×3, de ×2) by repeating rows.  The
    repeat is explode(sequence(1, k)) — per-row fan-out on executors,
    never a driver loop — and the downsample is the same
    scan-evaluated hash threshold as x18, so the whole mix is a
    narrow plan until the final count aggregation.  Epoch-stable:
    identical output on every run/retry at any parallelism."""
    d = load(spark, sf, "documents")
    h = F.substring(
        F.md5(F.concat(F.lit("mix42|"), F.col("doc_id").cast("string"))), 1, 2
    )
    kept = d.filter((F.col("lang") != "en") | (h < "80"))
    rep = (
        F.when(F.col("lang") == "zh", 3).when(F.col("lang") == "de", 2).otherwise(1)
    )
    mixed = kept.withColumn("copy", F.explode(F.sequence(F.lit(1), rep)))
    return mixed.groupBy("lang").agg(
        F.count("*").alias("n_mixed"), F.countDistinct("doc_id").alias("n_unique")
    )


def _km_round_sql() -> str:
    """Unrolled Lloyd's k-means oracle (K=4, 2 updates + final
    assignment) — the SAME rounding discipline as icepack.ann:
    centroid updates ROUND(AVG, 6), assignment orders on ROUND(dist, 6)
    with lowest-cid ties, so the iterative Spark pipeline and this
    single DuckDB statement replay identical trajectories."""
    parts = ["""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    epos AS (
      SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS val FROM e
    ),
    c0 AS (
      SELECT vec_id AS cid, generate_subscripts(v, 1) AS pos, unnest(v) AS cval
      FROM e WHERE vec_id < 4
    )"""]
    prev = "c0"
    for n in (1, 2, 3):
        parts.append(f""",
    d{n} AS (
      SELECT ep.vec_id, c.cid,
             SUM((ep.val - c.cval) * (ep.val - c.cval)) AS dist
      FROM epos ep JOIN {prev} c ON ep.pos = c.pos
      GROUP BY 1, 2
    ),
    a{n} AS (
      SELECT vec_id, cid, ROUND(dist, 6) AS rdist FROM d{n}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY ROUND(dist, 6), cid) = 1
    )""")
        if n < 3:
            parts.append(f""",
    u{n} AS (
      SELECT a.cid, ep.pos, ROUND(AVG(ep.val), 6) AS cval
      FROM a{n} a JOIN epos ep ON ep.vec_id = a.vec_id
      GROUP BY 1, 2
    ),
    c{n} AS (
      SELECT p.cid, p.pos, COALESCE(u.cval, p.cval) AS cval
      FROM {prev} p LEFT JOIN u{n} u ON u.cid = p.cid AND u.pos = p.pos
    )""")
            prev = f"c{n}"
    parts.append("""
    SELECT CAST(cid AS INT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(AVG(rdist), 2) AS avg_sqdist
    FROM a3 GROUP BY 1
    """)
    return "".join(parts)


@query("x20_kmeans_ivf", oracle=_km_round_sql())
def x20_kmeans_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF coarse-quantizer TRAINING: distributed Lloyd's k-means over
    the embedding column (the centroids x6's docstring promises at
    scale).  The iterative-algorithm pattern done Spark-first: per
    iteration, assignment is one Arrow-batched pandas_udf pass
    (vectorized argmin against the broadcast K×dim centroid matrix) and
    the centroid update is an all-JVM posexplode + avg — only K×dim
    floats ever reach the driver, so the loop costs O(iters) narrow
    jobs regardless of table size.  Deterministic: seeds are the K
    lowest vec_ids, ties break to the lowest cluster index, and
    iteration count is fixed — invariants (monotone inertia, count
    conservation, run-to-run stability) are pytest-checked
    (tests/test_scale_patterns.py).  ORACLE-CHECKED despite being
    iterative: the fixed 3-assignment trajectory unrolls into one
    DuckDB statement (``_km_round_sql``), and both sides share the
    rounding discipline (centroid updates ROUND(avg, 6), assignment on
    ROUND(dist, 6), lowest-cid ties) that makes the trajectories
    engine-independent.  Training/search live in ``icepack/ann.py``
    (``train_ivf`` / ``ivf_topk``, recall invariants in
    tests/test_ann.py)."""
    from ..ann import assigner, train_ivf

    K, ITERS = 4, 3
    e = load(spark, sf, "embeddings").select("vec_id", "embedding")
    # ITERS-1 centroid updates + one final assignment pass ≡ the
    # original inline loop's "assign, then update unless last" shape
    cents = train_ivf(e, K, ITERS - 1)
    a = e.withColumn("a", assigner(cents)("embedding"))
    return a.groupBy(F.col("a.cluster").alias("cluster")).agg(
        F.count("*").alias("n_vectors"),
        F.round(F.avg("a.sqdist"), 2).alias("avg_sqdist"),
    )


@query(
    "x25_edit_distance",
    oracle="""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(substr(a.text, 1, 256), substr(b.text, 1, 256))
                AS INTEGER) AS dist,
           levenshtein(substr(a.text, 1, 256), substr(b.text, 1, 256)) <= 2 AS is_dup
    FROM documents a
    JOIN documents b
      ON substr(a.text, 1, 24) = substr(b.text, 1, 24) AND a.doc_id < b.doc_id
    """,
)
def x25_edit_distance(spark: SparkSession, sf: str) -> DataFrame:
    """Edit-distance verification stage for near-dup candidates:
    prefix blocking (24-char block key) bounds the O(n²) self-join to
    within-block pairs, and the O(len²) Levenshtein runs only on those
    candidates, capped at the first 256 chars.  This is the cheap
    exact-verify pass that sits downstream of MinHash/LSH blocking at
    100 TB — the quadratic work is confined to bucket-local survivors,
    and the block key is an equi-join key so the pairing is a plain
    hash shuffle, never a cross join."""
    d = load(spark, sf, "documents").select(
        "doc_id", F.substring("text", 1, 256).alias("t"),
        F.substring("text", 1, 24).alias("blk"),
    )
    a = d.select(F.col("doc_id").alias("id_a"), F.col("t").alias("ta"), "blk")
    b = d.select(F.col("doc_id").alias("id_b"), F.col("t").alias("tb"), "blk")
    dist = F.levenshtein("ta", "tb")
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("dist"), (dist <= 2).alias("is_dup"))
    )


@query(
    "x26_quality_filter",
    oracle="""
    WITH sig AS (
      SELECT doc_id,
             n_chars,
             length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
               / GREATEST(length(text), 1) AS digit_ratio,
             length(regexp_replace(text, '[^A-Z]', '', 'g')) * 1.0
               / GREATEST(length(text), 1) AS upper_ratio
      FROM documents
    )
    SELECT doc_id,
           concat_ws(',',
             CASE WHEN n_chars < 200 THEN 'short' END,
             CASE WHEN digit_ratio > 0.2 THEN 'digits' END,
             CASE WHEN upper_ratio > 0.3 THEN 'shouty' END) AS reasons,
           (n_chars >= 200 AND digit_ratio <= 0.2 AND upper_ratio <= 0.3) AS keep
    FROM sig
    """,
)
def x26_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Composite quality gate with an audit trail: every doc gets a
    keep/drop decision PLUS the list of failed rules (concat_ws skips
    the NULL arms on both engines), so a 100 TB filtering run can
    report per-rule drop rates and be re-run with one rule relaxed
    without recomputing the signals.  One scan, zero shuffles, all
    JVM-side regex — the decision column pattern every production
    data-quality pipeline needs."""
    d = load(spark, sf, "documents")
    ln = F.greatest(F.length("text"), F.lit(1))
    digit_ratio = F.length(F.regexp_replace("text", "[^0-9]", "")) / ln
    upper_ratio = F.length(F.regexp_replace("text", "[^A-Z]", "")) / ln
    return d.select(
        "doc_id",
        F.concat_ws(
            ",",
            F.when(F.col("n_chars") < 200, "short"),
            F.when(digit_ratio > 0.2, "digits"),
            F.when(upper_ratio > 0.3, "shouty"),
        ).alias("reasons"),
        (
            (F.col("n_chars") >= 200) & (digit_ratio <= 0.2) & (upper_ratio <= 0.3)
        ).alias("keep"),
    )


# --- random-hyperplane LSH ANN ----------------------------------------------

import hashlib as _hashlib

#: 4 fixed hyperplanes × 64 dims, derived from md5 so both engines see
#: the exact same literals (seeded-Gaussian equivalent, frozen).
_LSH_PLANES = [
    [
        round(
            int(_hashlib.md5(f"lshplane|{p}|{j}".encode()).hexdigest()[:8], 16)
            / 0xFFFFFFFF
            * 2
            - 1,
            6,
        )
        for j in range(64)
    ]
    for p in range(4)
]


def _lsh_sql_bucket(col: str) -> str:
    terms = []
    for p, plane in enumerate(_LSH_PLANES):
        lit = "[" + ", ".join(repr(w) for w in plane) + "]"
        dot = _SQL_DOT.format(a=col, b=lit)
        terms.append(f"CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END")
    return " + ".join(terms)


def _sign_bucket_expr(planes, col: str = "embedding"):
    """Spark-side sign-LSH bucket as ONE parsed SQL expression.

    Semantically identical to the old per-plane Column composition
    ((dot > 0).cast("int") * 2^p summed; same zip_with/aggregate fold,
    same double literals via repr round-trip) but built in a single
    py4j call instead of ~64 F.lit round trips per plane — x48/x27
    paid ~0.4 s of pure driver↔JVM chatter per construction (guide
    §1.2: the build cost is driver work, profile said 1855 py4j sends
    for one bucket column)."""
    terms = []
    for p, plane in enumerate(planes):
        vals = ", ".join(f"{w!r}D" for w in plane)
        terms.append(
            f"(CAST(aggregate(zip_with({col}, array({vals}),"
            f" (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) > 0 AS INT)"
            f" * {1 << p})"
        )
    return F.expr(" + ".join(terms))


@query(
    "x27_lsh_ann",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding,
             {_lsh_sql_bucket('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0),
    scored AS (
      SELECT b.vec_id, b.label,
             {_SQL_DOT.format(a='b.embedding', b='q.qv')}
             / (sqrt({_SQL_DOT.format(a='b.embedding', b='b.embedding')})
                * sqrt({_SQL_DOT.format(a='q.qv', b='q.qv')})) AS cos
      FROM b, q
      WHERE bit_count(xor(b.bucket, q.qb)) <= 1 AND b.vec_id <> 0
    )
    SELECT vec_id, label, ROUND(cos, 4) AS cos_sim
    FROM scored ORDER BY ROUND(cos, 6) DESC, vec_id LIMIT 10
    """,
)
def x27_lsh_ann(spark: SparkSession, sf: str) -> DataFrame:
    """Random-hyperplane (sign-projection) LSH ANN with Hamming-1
    multi-probe — the data-OBLIVIOUS scale path next to data-aware IVF
    (x6/x20): 4 fixed hyperplanes give a 16-cell signature; a probe
    searches the query's cell plus its 4 Hamming-1 neighbors (~5/16 of
    the table) and brute-forces cosine only inside them.  Hyperplanes
    are frozen md5-derived literals, so the DuckDB oracle computes the
    identical buckets — no engine-native randomness anywhere.  Plan
    shape: the bucket is a narrow per-row expression (at 100 TB: write
    it as a partition column so a probe is partition pruning, exactly
    like the IVF cluster id), the 1-row query side broadcasts into a
    trivially cheap nested-loop on bit_count(xor)<=1, and the finish is
    TakeOrderedAndProject — no global sort, no unblocked self-join.
    Recall is geometry-dependent (the fixture's true neighbors sit at
    cos≈0.3, where sign bits agree only ~55% — measured in
    tests/test_ann.py, which also pins probe-all ≡ brute force); IVF's
    trained centroids recall far better on such data, which is exactly
    the documented trade between the two paths."""
    return _lsh_topk(spark, sf, radius=1)


def _lsh_topk(spark: SparkSession, sf: str, radius: int) -> DataFrame:
    e = load(spark, sf, "embeddings")
    b = e.withColumn("bucket", _sign_bucket_expr(_LSH_PLANES))
    q = b.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qb")
    )
    cand = b.join(
        F.broadcast(q),
        F.bit_count(F.col("bucket").bitwiseXOR(F.col("qb"))) <= radius,
    ).filter(F.col("vec_id") != 0)
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    return (
        cand.select("vec_id", "label", cos.alias("cos"))
        .orderBy(F.round("cos", 6).desc(), F.asc("vec_id"))
        .select("vec_id", "label", F.round("cos", 4).alias("cos_sim"))
        .limit(10)
    )


@query(
    "x28_sequence_pack",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    packed AS (
      SELECT source, n_tok,
             CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) - n_tok)
                        / 2048.0) AS BIGINT) AS bin
      FROM toks
    )
    SELECT source, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
           CAST(SUM(n_tok) AS BIGINT) / 2048.0 AS fill
    FROM packed GROUP BY source, bin
    """,
)
def x28_sequence_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing for training: assign documents to fixed
    token-budget bins (2048 tokens) by running token count, the
    next-fit policy every packing pipeline starts from.  Bin identity
    is a *function of the running sum*, so it needs no driver loop and
    no stateful UDF — one window per shard.  Packing is per `source`
    shard (PARTITION BY), which is exactly how it distributes at
    100 TB: each shard packs independently inside its own partition, no
    global coordination, and the bin counter restarts per shard so ids
    never collide across executors.  The doc_id order is the
    deterministic tiebreak both engines share."""
    from pyspark.sql import Window as W

    d = load(spark, sf, "documents")
    n_tok = F.size(F.split("text", " "))
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    toks = d.select("doc_id", "source", n_tok.alias("n_tok"))
    packed = toks.withColumn(
        "bin",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(2048.0)),
    )
    return packed.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("bin_tokens"),
        # exact: integer / 2^11 is representable bit-for-bit in both
        # engines; a ROUND here would sit on half-ulp boundaries
        # (64/2048 = .03125) where HALF_UP vs half-even diverge.
        (F.sum("n_tok") / F.lit(2048.0)).alias("fill"),
    )


@query(
    "x29_vocab_stats",
    oracle="""
    WITH words AS (
      SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tf AS (SELECT lang, w, COUNT(*) AS n FROM words GROUP BY 1, 2)
    SELECT lang,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           CAST(COUNT(*) * 1000000 AS BIGINT) // CAST(SUM(n) AS BIGINT)
             AS ttr_ppm,
           CAST(COUNT(*) FILTER (n = 1) * 1000000 AS BIGINT) // COUNT(*)
             AS hapax_ppm
    FROM tf GROUP BY lang
    """,
)
def x29_vocab_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary health per language: token count, distinct
    types, type-token ratio, and the hapax-legomenon ratio (share of
    words seen exactly once — collapsing hapax ratio flags synthetic or
    templated text; an exploding one flags OCR noise).  Two hash
    aggregations, both with map-side partials: (lang, word) counts,
    then the per-lang rollup — the exact shape a 100 TB vocabulary scan
    wants, with no window and no collect."""
    d = load(spark, sf, "documents")
    words = d.select("lang", F.explode(F.split("text", " ")).alias("w"))
    tf = words.groupBy("lang", "w").agg(F.count("*").alias("n"))
    # ratios as integer parts-per-million: BIGINT multiply + integer
    # divide is bit-exact in both engines, unlike ROUND on a double
    # quotient whose *1e6 step can land on a different side of the
    # rounding boundary per engine.
    return tf.groupBy("lang").agg(
        F.sum("n").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.expr("CAST(count(*) * 1000000 AS BIGINT) DIV sum(n)").alias(
            "ttr_ppm"
        ),
        F.expr(
            "CAST(sum(CAST(n = 1 AS BIGINT)) * 1000000 AS BIGINT)"
            " DIV count(*)"
        ).alias("hapax_ppm"),
    )


@query(
    "x30_embedding_outliers",
    oracle="""
    WITH pos AS (
      SELECT label, vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    cent AS (SELECT label, i, AVG(v) AS c FROM pos GROUP BY 1, 2),
    cnorm AS (SELECT label, sqrt(SUM(c * c)) AS nc FROM cent GROUP BY 1),
    per_vec AS (
      SELECT p.label, p.vec_id,
             SUM(p.v * c.c) AS dot, sqrt(SUM(p.v * p.v)) AS nv
      FROM pos p JOIN cent c ON p.label = c.label AND p.i = c.i
      GROUP BY 1, 2
    )
    SELECT v.vec_id, v.label,
           ROUND(v.dot / (v.nv * n.nc), 4) AS cos_centroid,
           v.dot / (v.nv * n.nc) < 0.2 AS is_outlier
    FROM per_vec v JOIN cnorm n ON v.label = n.label
    """,
)
def x30_embedding_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space outlier scoring (the SemDeDup/data-pruning
    primitive): per label cluster, cosine of every vector against its
    cluster centroid; far-from-centroid rows are candidate mislabels or
    noise to drop before training.

    This is the grouped-map `applyInPandas` surface (SURVEY §2.12): one
    Arrow batch per label group, numpy does a (n × d) mean + matmul per
    group — semantics a per-row expression can't reach (every row needs
    its whole group's centroid) without materializing the centroid join
    the oracle spells out.  Scale: state is one d-dim centroid per
    group held inside its task; groups shard across executors by the
    groupBy key, so 100 TB of vectors needs only that the *largest
    single group* fit one executor — the same contract as any grouped
    aggregation.  Float order: numpy float64 row-order reductions vs
    the oracle's per-position SUMs agree to ~1e-12, far inside the
    round(4)."""
    import pandas as pd

    def _score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        m = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        c = m.mean(axis=0)
        cos = (m @ c) / (np.linalg.norm(m, axis=1) * np.linalg.norm(c))
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "label": pdf["label"],
                "cos_centroid": np.round(cos, 4),
                "is_outlier": cos < 0.2,
            }
        )

    e = load(spark, sf, "embeddings")
    return e.groupBy("label").applyInPandas(
        _score, schema="vec_id long, label int, cos_centroid double, is_outlier boolean"
    )


@query(
    "x31_jaccard_stopshingles",
    oracle=_SQL_SHINGLES
    + """
    , ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh_tbl),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh_tbl),
    kept AS (
      SELECT doc_id, sh FROM ex
      QUALIFY COUNT(*) OVER (PARTITION BY sh) <= 16
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.id_a, p.id_b,
           ROUND(CAST(p.common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.common), 4)
             AS jaccard_lb
    FROM pairs p
    JOIN sizes sa ON p.id_a = sa.doc_id
    JOIN sizes sb ON p.id_b = sb.doc_id
    WHERE CAST(p.common AS DOUBLE) / (sa.n_sh + sb.n_sh - p.common) >= 0.8
    """,
)
def x31_jaccard_stopshingles(spark: SparkSession, sf: str) -> DataFrame:
    """The 100 TB spelling of exact n-gram Jaccard (x2's documented
    pre-step made concrete): posting lists longer than 16 docs are
    stop-shingles — boilerplate n-grams whose pair expansion is
    quadratic in list length while contributing almost nothing to a
    high-Jaccard decision — and are dropped BEFORE pair generation.
    `common` is then a lower bound, so the reported score is a
    conservative `jaccard_lb` (the denominator keeps the full shingle
    counts): no false positives versus x2 at the 0.8 threshold, and
    the worst-case bucket cost is capped at 16·15/2 pairs per shingle
    regardless of corpus size — the difference between a bounded and
    an unbounded shuffle at 100 TB.  Same inverted-index shape as x2
    (one pipeline, hashed 8-byte shuffle keys, in-place pair
    expansion); the cap is just a filter on posting-list size."""
    ex = _shingle_rows(spark, sf, distinct=True, hashed=True)
    buckets = (
        ex.groupBy("sh")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= 16))
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                # PPJoin-style length filter INSIDE the expansion:
                # jaccard >= 0.8 (or its lower bound) is impossible
                # unless min(n_a, n_b) >= 0.8 * max(n_a, n_b) — the
                # best case is full containment, where J = min/max —
                # so size-incompatible pairs drop before they reach
                # the pair-count shuffle (2.7x fewer rows through the
                # widest exchange at sf0.1; only removes pairs the
                # final >= 0.8 filter would discard anyway).
                "flatten(transform(sequence(1, size(ds) - 1),"
                " i -> filter(transform(slice(ds, i + 1, size(ds) - i),"
                " y -> struct(ds[i-1].doc_id AS id_a, ds[i-1].n_sh AS n_a,"
                "             y.doc_id AS id_b, y.n_sh AS n_b)),"
                " p -> least(p.n_a, p.n_b) >= 0.8 * greatest(p.n_a, p.n_b))))"
            )
        ).alias("p")
    )
    counts = pairs.groupBy("p.id_a", "p.id_b", "p.n_a", "p.n_b").agg(
        F.count("*").alias("common")
    )
    jac = F.col("common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return counts.filter(jac >= 0.8).select(
        "id_a", "id_b", F.round(jac, 4).alias("jaccard_lb")
    )


@query(
    "x32_bigram_entropy",
    oracle="""
    WITH words AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT lang, w[i] AS w1, w[i+1] AS w2, COUNT(*) AS n
      FROM words, LATERAL (SELECT unnest(range(1, len(w))) AS i)
      GROUP BY 1, 2, 3
    ),
    uni AS (SELECT lang, w1, SUM(n) AS n1 FROM bg GROUP BY 1, 2),
    tot AS (SELECT lang, SUM(n) AS nt FROM bg GROUP BY 1)
    SELECT bg.lang,
           ROUND(-SUM((bg.n / tot.nt) * log2(CAST(bg.n AS DOUBLE) / uni.n1)), 4)
             AS cond_entropy,
           CAST(SUM(bg.n) AS BIGINT) AS n_bigrams
    FROM bg
    JOIN uni ON bg.lang = uni.lang AND bg.w1 = uni.w1
    JOIN tot ON bg.lang = tot.lang
    GROUP BY bg.lang
    """,
)
def x32_bigram_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram conditional entropy H(w2|w1) per language — the language-
    model-shaped quality signal (a KenLM-style filter's cheapest
    stand-in): templated/repetitive corpora show collapsing conditional
    entropy, shuffled-word noise shows H(w2|w1) ≈ H(w2).  Bigram rows
    come from the posexplode + lead window (same rationale as the
    shingle pipeline: a generator over a derived array re-evaluates it
    per output row), then two hash aggregates and a broadcast-sized
    join of the per-(lang,w1) totals.  Everything shuffles on
    (lang, word) keys — vocabulary-sized, not corpus-sized, exactly
    what survives 100 TB."""
    from pyspark.sql import Window as W

    d = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    we = d.select("doc_id", "lang", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    win = W.partitionBy("doc_id").orderBy("pos")
    pairs = (
        we.withColumn("w2", F.lead("w", 1).over(win))
        .filter(F.col("w2").isNotNull())
        .select("lang", F.col("w").alias("w1"), "w2")
    )
    bg = pairs.groupBy("lang", "w1", "w2").agg(F.count("*").alias("n"))
    uni = bg.groupBy("lang", "w1").agg(F.sum("n").alias("n1"))
    tot = bg.groupBy("lang").agg(F.sum("n").alias("nt"))
    j = bg.join(F.broadcast(uni), ["lang", "w1"]).join(F.broadcast(tot), "lang")
    h = -F.sum((F.col("n") / F.col("nt")) * F.log2(F.col("n").cast("double") / F.col("n1")))
    return j.groupBy("lang").agg(
        F.round(h, 4).alias("cond_entropy"),
        F.sum("n").cast("bigint").alias("n_bigrams"),
    )


@query(
    "x33_doc_chunking",
    oracle="""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    starts AS (
      SELECT doc_id, source, w, unnest(range(1, len(w) + 1, 96)) AS s FROM w
    )
    SELECT doc_id, source,
           CAST((s - 1) // 96 AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(w, s, least(s + 127, len(w)))) AS BIGINT) AS n_tok,
           md5(array_to_string(list_slice(w, s, least(s + 127, len(w))), ' '))
             AS chunk_md5
    FROM starts
    """,
)
def x33_doc_chunking(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window chunking for training/RAG prep: 128-token chunks
    on a 96-token stride (32-token overlap), one row per chunk with a
    content fingerprint.  Pure per-row array work — transform(sequence)
    builds every chunk inside its document's row, so the operator is a
    ZERO-shuffle scan pass: at 100 TB it is embarrassingly parallel and
    the output shards exactly like its input.  The md5 fingerprint is
    the portable join key downstream chunk-level dedup uses."""
    d = load(spark, sf, "documents").withColumn("w", F.split("text", " "))
    chunks = d.select(
        "doc_id",
        "source",
        F.posexplode(
            F.expr("transform(sequence(1, size(w), 96), s -> slice(w, s, 128))")
        ).alias("chunk_idx", "cw"),
    )
    return chunks.select(
        "doc_id",
        "source",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("cw").cast("long").alias("n_tok"),
        F.md5(F.concat_ws(" ", "cw")).alias("chunk_md5"),
    )


@query(
    "x34_chunk_dedup",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    c AS (SELECT doc_id, w, unnest(range(1, len(w) + 1, 64)) AS s FROM w),
    h AS (
      SELECT doc_id, CAST((s - 1) // 64 AS BIGINT) AS chunk_idx,
             md5(array_to_string(list_slice(w, s, least(s + 63, len(w))), ' ')) AS h
      FROM c
    )
    SELECT h AS chunk_md5, COUNT(*) AS n_copies,
           MIN(doc_id) AS keep_doc,
           MIN({'d': doc_id, 'c': chunk_idx}).c AS keep_chunk
    FROM h GROUP BY h HAVING COUNT(*) > 1
    """,
)
def x34_chunk_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Sub-document (chunk-level) dedup: 64-token disjoint chunks,
    fingerprinted and grouped; groups with >1 copy report the canonical
    survivor — the lexicographically lowest (doc_id, chunk_idx) pair,
    taken as a struct MIN so it is exact for any chunk count (no
    packed-integer encoding to overflow or collide).  This catches
    boilerplate shared across documents that whole-doc dedup (x1)
    misses.  One hash shuffle on the 16-byte fingerprint — the exact
    shape of the cross-shard dedup pass at 100 TB, where the key is a
    hash, never the chunk text itself."""
    d = load(spark, sf, "documents").withColumn("w", F.split("text", " "))
    chunks = d.select(
        "doc_id",
        F.posexplode(
            F.expr("transform(sequence(1, size(w), 64), s -> slice(w, s, 64))")
        ).alias("chunk_idx", "cw"),
    )
    h = chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.md5(F.concat_ws(" ", "cw")).alias("chunk_md5"),
    )
    return (
        h.groupBy("chunk_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keep_doc"),
            F.min(F.struct("doc_id", "chunk_idx"))
            .getField("chunk_idx")
            .alias("keep_chunk"),
        )
        .filter(F.col("n_copies") > 1)
    )


@query(
    "x35_train_split",
    oracle="""
    WITH t AS (
      SELECT CASE
               WHEN substring(md5('split42|' || CAST(doc_id AS VARCHAR)), 1, 2)
                    < '0d' THEN 'test'
               WHEN substring(md5('split42|' || CAST(doc_id AS VARCHAR)), 1, 2)
                    < '1a' THEN 'val'
               ELSE 'train'
             END AS split,
             lang,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM t GROUP BY 1, 2
    """,
)
def x35_train_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test assignment by salted content-free
    hash of the stable doc_id (~5% test, ~5% val by md5-prefix range):
    the split a document lands in never depends on which shard or
    executor processed it, survives re-runs and table growth, and needs
    no global state — the property a 100 TB pipeline needs so that
    re-processing a partition can't leak eval docs into train.  Output
    is the per-split per-language doc/token census used to audit split
    balance."""
    d = load(spark, sf, "documents")
    pfx = F.substring(
        F.md5(F.concat(F.lit("split42|"), F.col("doc_id").cast("string"))), 1, 2
    )
    split = (
        F.when(pfx < "0d", "test").when(pfx < "1a", "val").otherwise("train")
    )
    return (
        d.select(
            split.alias("split"),
            "lang",
            F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


@query(
    "x36_minhash_estimate",
    oracle=_SQL_MINHASH_BANDS
    + """
    , pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    sim AS (
      SELECT p.id_a, p.id_b,
             len(list_intersect(sa.shingles, sb.shingles)) AS common,
             len(sa.shingles) + len(sb.shingles) AS tot,
             (CAST(ma.h0 = mb.h0 AS INT) + CAST(ma.h1 = mb.h1 AS INT)
            + CAST(ma.h2 = mb.h2 AS INT) + CAST(ma.h3 = mb.h3 AS INT)
            + CAST(ma.h4 = mb.h4 AS INT) + CAST(ma.h5 = mb.h5 AS INT)
            + CAST(ma.h6 = mb.h6 AS INT) + CAST(ma.h7 = mb.h7 AS INT)) / 8.0
               AS est_jaccard
      FROM pairs p
      JOIN sh_tbl sa ON sa.doc_id = p.id_a
      JOIN sh_tbl sb ON sb.doc_id = p.id_b
      JOIN mh ma ON ma.doc_id = p.id_a
      JOIN mh mb ON mb.doc_id = p.id_b
    )
    SELECT id_a, id_b, CAST(common AS BIGINT) AS common,
           CAST(common AS DOUBLE) / (tot - common) AS jaccard,
           est_jaccard
    FROM sim
    """,
)
def x36_minhash_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-quality audit: for every LSH candidate pair, the MinHash
    signature estimate (matching components / 8) next to the exact
    shingle-set Jaccard — the calibration table that tells you whether
    the band/row configuration is recalling the right similarity range
    before you trust it on 100 TB.  The exact verify join touches only
    candidate pairs (bounded by banding), never all pairs: candidates
    broadcast into the signature and shingle-set lookups.  All output
    math is exact in both engines: integer set sizes, one
    correctly-rounded double division, and eighths."""
    mh = _minhash_sigs(spark, sf)
    bands = mh.select(
        "doc_id",
        F.expr(
            "stack(4, 0, concat(h0, '_', h1), 1, concat(h2, '_', h3),"
            " 2, concat(h4, '_', h5), 3, concat(h6, '_', h7)) AS (band, bkey)"
        ),
    )
    buckets = (
        bands.groupBy("band", "bkey")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(ids) - 1),"
                " i -> transform(slice(ids, i + 1, size(ids) - i),"
                " y -> struct(ids[i-1] AS id_a, y AS id_b))))"
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b").distinct()

    d = load(spark, sf, "documents").withColumn("w", F.split("text", " "))
    shingles = F.transform(
        F.sequence(F.lit(1), F.size("w") - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("w", i), F.element_at("w", i + 1), F.element_at("w", i + 2)
        ),
    )
    shs = d.filter(F.size("w") >= 3).select(
        "doc_id", F.array_distinct(shingles).alias("shingles")
    )

    a_sig = mh.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"h{s}").alias(f"a{s}") for s in range(8)]
    )
    b_sig = mh.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"h{s}").alias(f"b{s}") for s in range(8)]
    )
    est = sum(
        (F.col(f"a{s}") == F.col(f"b{s}")).cast("int") for s in range(8)
    ) / F.lit(8.0)
    j = (
        F.broadcast(pairs)
        .join(a_sig, "id_a")
        .join(b_sig, "id_b")
        .join(shs.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sa")), "id_a")
        .join(shs.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sb")), "id_b")
    )
    common = F.size(F.array_intersect("sa", "sb"))
    tot = F.size("sa") + F.size("sb")
    return j.select(
        "id_a",
        "id_b",
        common.cast("long").alias("common"),
        (common.cast("double") / (tot - common).cast("double")).alias("jaccard"),
        est.alias("est_jaccard"),
    )


@query(
    "x37_unigram_surprisal",
    oracle="""
    WITH words AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    uni AS (SELECT w, COUNT(*) AS n FROM words GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM uni)
    SELECT wd.doc_id, wd.lang,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           ROUND(-AVG(log2(CAST(u.n AS DOUBLE) / t.t)), 4) AS surprisal
    FROM words wd JOIN uni u ON wd.w = u.w CROSS JOIN tot t
    GROUP BY 1, 2
    """,
)
def x37_unigram_surprisal(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-LM surprisal per document (the CCNet-style quality
    signal): score every doc by the mean -log2 P(word) under the
    corpus's own unigram distribution — templated/repetitive text
    scores low, lexically rich or noisy text scores high, and the
    score is the standard cheap proxy before a real LM pass.

    Shape at 100 TB: one token-count aggregation builds the LM (vocab-
    sized, ≪ corpus — Zipf), which then BROADCASTS into the scoring
    join, so the corpus itself is touched by exactly two scan passes
    and one map-side join; the per-doc rollup partially aggregates
    map-side.  The corpus total rides along as a literal via a 1-row
    cross join, never a driver collect inside the plan."""
    d = load(spark, sf, "documents")
    words = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    uni = words.groupBy("w").agg(F.count("*").alias("n"))
    tot = uni.agg(F.sum("n").cast("double").alias("t"))
    scored = words.join(F.broadcast(uni), "w").join(F.broadcast(tot))
    return scored.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_tok"),
        F.round(-F.avg(F.log2(F.col("n").cast("double") / F.col("t"))), 4).alias(
            "surprisal"
        ),
    )


@query(
    "x38_ngram_novelty",
    oracle=_SQL_SHINGLES
    + """
    , ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh_tbl),
    first AS (SELECT sh, MIN(doc_id) AS fd FROM ex GROUP BY 1)
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_sh,
           CAST(SUM(CASE WHEN f.fd = e.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS novel,
           CAST(SUM(CASE WHEN f.fd = e.doc_id THEN 1 ELSE 0 END)
                * 1000000 AS BIGINT) // COUNT(*) AS novelty_ppm
    FROM ex e JOIN first f ON e.sh = f.sh
    GROUP BY 1
    """,
)
def x38_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus novelty curve: per document, the fraction of its distinct
    trigrams whose FIRST corpus occurrence (by doc_id order) is this
    document.  Curation uses this to spot when additional data stops
    contributing new n-grams — the marginal-value signal behind
    dataset mixing decisions.  Two hash shuffles on an 8-byte hashed
    shingle key (first-occurrence min, then the join back), both
    map-side-combinable; the shingle string itself never shuffles.
    Ratio is exact integer ppm (the x29 lesson: never cross-engine
    ROUND a double quotient)."""
    sh = _shingle_rows(spark, sf, distinct=True, hashed=True)
    first = sh.groupBy("sh").agg(F.min("doc_id").alias("fd"))
    j = sh.join(first, "sh")
    novel = F.sum((F.col("fd") == F.col("doc_id")).cast("long"))
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_sh"),
        novel.alias("novel"),
        F.expr(
            "CAST(sum(CAST(fd = doc_id AS BIGINT)) * 1000000 AS BIGINT)"
            " DIV count(*)"
        ).alias("novelty_ppm"),
    )


#: squared L2 over 64-dim float lists, computed in double with the same
#: left-to-right fold in both engines (list_sum ≡ F.aggregate order).
_SQL_SQDIST = (
    "list_sum(list_transform(range(1, 65),"
    " i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    " * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
)


@query(
    "x39_kmeans_assign",
    oracle=f"""
    WITH c AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 4
    ),
    cand AS (
      SELECT e.vec_id, e.label, c.cid,
             {_SQL_SQDIST.format(a='e.embedding', b='c.cv')} AS dist
      FROM embeddings e CROSS JOIN c
    )
    SELECT vec_id, label, cid AS cluster, ROUND(dist, 4) AS sq_dist
    FROM cand
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY ROUND(dist, 6), cid) = 1
    """,
)
def x39_kmeans_assign(spark: SparkSession, sf: str) -> DataFrame:
    """The assignment leg of the IVF/k-means family, oracle-checked:
    every vector to its nearest of K=4 frozen centroids (the K lowest
    vec_ids — the same deterministic seeds x20's Lloyd training uses).
    This gives the otherwise rows-only iterative path (x20) an exactly
    verified single step: distances fold left-to-right in double in
    both engines, ordering rounds to 6 places first so last-ulp fold
    noise can't flip an argmin, ties break to the lowest cluster.
    Shape at scale: the K×dim centroid table broadcasts; assignment is
    a map-only pass over the vectors (the window's vec_id partition is
    K rows wide), so cost is one scan — no vector ever shuffles."""
    from pyspark.sql import Window as W

    e = load(spark, sf, "embeddings")
    cents = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    diff2 = F.aggregate(
        F.zip_with(
            "embedding",
            "cv",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = e.crossJoin(F.broadcast(cents)).withColumn("dist", diff2)
    w = W.partitionBy("vec_id").orderBy(F.round("dist", 6), "cid")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "label",
            F.col("cid").alias("cluster"),
            F.round("dist", 4).alias("sq_dist"),
        )
    )


def _sql_sub_sqdist(vec: str, cent: str, s: int) -> str:
    """Squared L2 over subspace s (16 dims, 1-based), left-to-right fold."""
    lo = s * 16 + 1
    return (
        f"list_sum(list_transform(range({lo}, {lo + 16}),"
        f" i -> (CAST({vec}[i] AS DOUBLE) - CAST({cent}[i] AS DOUBLE))"
        f" * (CAST({vec}[i] AS DOUBLE) - CAST({cent}[i] AS DOUBLE))))"
    )


_X40_BITS = ",\n             ".join(
    f"CASE WHEN ROUND({_sql_sub_sqdist('e.embedding', 'c.c1', s)}, 6)"
    f" < ROUND({_sql_sub_sqdist('e.embedding', 'c.c0', s)}, 6)"
    f" THEN 1 ELSE 0 END AS b{s}"
    for s in range(4)
)


@query(
    "x40_pq_encode",
    oracle=f"""
    WITH c AS (
      SELECT (SELECT embedding FROM embeddings WHERE vec_id = 0) AS c0,
             (SELECT embedding FROM embeddings WHERE vec_id = 1) AS c1
    ),
    bits AS (
      SELECT e.vec_id, e.label,
             {_X40_BITS}
      FROM embeddings e CROSS JOIN c
    )
    SELECT vec_id, label,
           CAST(b0 * 8 + b1 * 4 + b2 * 2 + b3 AS BIGINT) AS pq_code
    FROM bits
    """,
)
def x40_pq_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization encoding, the building block of
    billion-scale ANN indexes (IVF-PQ): the 64-dim vector splits into
    4 subspaces of 16 dims, each assigned to its nearest codebook
    centroid (a frozen 2-entry codebook per subspace — the embeddings
    of the two lowest vec_ids), packing the vector into a 4-bit code.
    Real systems train 256-entry codebooks with k-means (x20's
    machinery); the frozen codebook keeps this leg exactly
    oracle-checkable with the x39 determinism rules (left-to-right
    double folds, round-before-argmin, tie to centroid 0).
    Scale: codebooks broadcast (1-row cross join); encoding is a
    map-only scan pass — each vector compresses 64×4 bytes to ≤1 byte
    of code without shuffling anything."""
    e = load(spark, sf, "embeddings")
    cents = (
        e.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("c0"))
        .crossJoin(e.filter(F.col("vec_id") == 1).select(F.col("embedding").alias("c1")))
    )

    def sub_sqdist(cent: str, s: int):
        return F.aggregate(
            F.zip_with(
                F.slice("embedding", s * 16 + 1, 16),
                F.slice(cent, s * 16 + 1, 16),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bits = [
        F.when(
            F.round(sub_sqdist("c1", s), 6) < F.round(sub_sqdist("c0", s), 6), 1
        ).otherwise(0)
        for s in range(4)
    ]
    code = (bits[0] * 8 + bits[1] * 4 + bits[2] * 2 + bits[3]).cast("long")
    return e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "label", code.alias("pq_code")
    )


@query(
    "x41_stratified_fixed_n",
    oracle="""
    SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('fix42|' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
)
def x41_stratified_fixed_n(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-size stratified sample: exactly min(20, |stratum|) docs
    per language, chosen by a salted-hash order so the sample is
    deterministic, uniform within each stratum, and stable under
    corpus growth *of other strata* — the balanced-eval-set
    complement to x18's Bernoulli-style proportional sampler.
    Scale: one shuffle on the stratum key; WindowGroupLimit pushes
    the rank-≤-20 cut below the sort, so each task keeps a 20-row
    heap rather than sorting its stratum."""
    from pyspark.sql import Window as W

    d = load(spark, sf, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("fix42|"), F.col("doc_id").cast("string"))), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
    )


@query(
    "x42_training_pipeline",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents
    ),
    q AS (
      SELECT * FROM base
      WHERE len(w) BETWEEN 30 AND 1000
        AND len(list_distinct(w)) * 10 > len(w) * 3
    ),
    dedup AS (
      SELECT doc_id, lang, w FROM (
        SELECT doc_id, lang, w,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM q
      ) WHERE rn = 1
    ),
    sp AS (
      SELECT doc_id, lang, w,
             CASE
               WHEN substring(md5('split42|' || CAST(doc_id AS VARCHAR)), 1, 2)
                    < '0d' THEN 'test'
               WHEN substring(md5('split42|' || CAST(doc_id AS VARCHAR)), 1, 2)
                    < '1a' THEN 'val'
               ELSE 'train'
             END AS split
      FROM dedup
    ),
    chunks AS (
      SELECT split, lang, doc_id, w, unnest(range(1, len(w) + 1, 96)) AS s
      FROM sp
    )
    SELECT split, lang,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(len(list_slice(w, s, least(s + 127, len(w))))) AS BIGINT)
             AS n_tokens
    FROM chunks GROUP BY 1, 2
    """,
)
def x42_training_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The training-data pipeline end to end as ONE composed Catalyst
    plan — the capstone the individual operators build toward: quality
    gate (length band + integer-exact distinct-word ratio, x26-style)
    → exact dedup keep-first on the content hash (x1) → deterministic
    salted-hash split assignment (x35) → 128/96 context-window
    chunking (x33) → per-(split, lang) doc/chunk/token census.

    One plan means Catalyst sees the whole pipeline: the quality
    filter runs inside the scan stage, dedup is the single wide
    shuffle (16-byte content hash), and split/chunk/census run
    map-side on its output — at 100 TB the corpus crosses the network
    exactly once.  Every stage boundary is integer- or hash-exact, so
    the composition is oracle-checked end to end, not just per
    stage."""
    return pipeline_census(load(spark, sf, "documents"))


def pipeline_census(docs: DataFrame) -> DataFrame:
    """The x42 pipeline body over ANY documents-shaped DataFrame
    (doc_id, lang, text): quality gate → exact dedup → split → chunk →
    census.  Factored out so the composition can also run over an
    icepack TABLE read (ice31 proves the same plan is MOR-transparent:
    delete files merge at scan time below the whole pipeline)."""
    from pyspark.sql import Window as W

    d = docs.withColumn("w", F.split("text", " "))
    n = F.size("w")
    q = d.filter(
        n.between(30, 1000)
        & (F.size(F.array_distinct("w")) * 10 > n * 3)
    )
    dd = (
        q.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy(F.md5("text")).orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    pfx = F.substring(
        F.md5(F.concat(F.lit("split42|"), F.col("doc_id").cast("string"))), 1, 2
    )
    sp = dd.withColumn(
        "split",
        F.when(pfx < "0d", "test").when(pfx < "1a", "val").otherwise("train"),
    )
    chunks = sp.select(
        "split",
        "lang",
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(w), 96), s -> size(slice(w, s, 128)))")
        ).alias("chunk_tok"),
    )
    return chunks.groupBy("split", "lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_chunks"),
        F.sum("chunk_tok").cast("bigint").alias("n_tokens"),
    )


#: PII detector patterns — deliberately simple enough to mean the same
#: thing in Java regex (Spark) and RE2 (DuckDB): no lookarounds, no
#: backrefs.
PII_PATTERNS = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phones": r"\d{3}[-.]\d{3}[-.]\d{4}",
    "ipv4s": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
}


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row PII hit counts for every pattern in :data:`PII_PATTERNS`
    (adds one ``n_<kind>`` column per pattern).  Pure per-row
    ``regexp_extract_all`` — a zero-shuffle scan pass, which is the
    only acceptable shape for a 100 TB pre-training redaction sweep.
    Redaction itself is ``regexp_replace`` with the same patterns;
    counting first is how pipelines budget the rewrite."""
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(text_col, F.lit(pat), F.lit(0))).cast(
                "long"
            ),
        )
    return out


@query(
    "x43_pii_scan",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))) AS BIGINT)
             AS n_emails,
           CAST(SUM(len(regexp_extract_all(text,
             '\\d{3}[-.]\\d{3}[-.]\\d{4}'))) AS BIGINT) AS n_phones,
           CAST(SUM(len(regexp_extract_all(text,
             '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}'))) AS BIGINT)
             AS n_ipv4s
    FROM documents GROUP BY 1
    """,
)
def x43_pii_scan(spark: SparkSession, sf: str) -> DataFrame:
    """PII exposure census per source shard: email/phone/IPv4 pattern
    hits summed per source — the audit that decides whether a shard
    needs the redaction rewrite before training.  The fixture corpus
    is synthetic plain words, so every count is zero HERE — the
    detection machinery itself is proven by
    tests/test_pipeline_ops.py::test_pii_scan_detects_injected_pii,
    which plants known PII and checks exact hits.  Scan shape:
    per-row regexp (zero shuffles) + one tiny rollup."""
    d = pii_counts(load(spark, sf, "documents"))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_emails").alias("n_emails"),
        F.sum("n_phones").alias("n_phones"),
        F.sum("n_ipv4s").alias("n_ipv4s"),
    )


@query(
    "x44_pii_redact",
    oracle=r"""
    WITH red AS (
      SELECT source, text,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\d{3}[-.]\d{3}[-.]\d{4}', '<PHONE>', 'g'),
               '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g') AS rtext
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rtext <> text THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_redacted,
           CAST(SUM(len(regexp_extract_all(rtext, '<EMAIL>'))
                  + len(regexp_extract_all(rtext, '<PHONE>'))
                  + len(regexp_extract_all(rtext, '<IP>'))) AS BIGINT)
             AS n_redactions,
           CAST(SUM(len(regexp_extract_all(rtext,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT)
             AS residual_hits
    FROM red GROUP BY source
    """,
)
def x44_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """The redaction pass x43's census budgets for: rewrite every PII
    span (email -> <EMAIL>, phone -> <PHONE>, IPv4 -> <IP>) and emit
    the per-source audit a compliance pipeline records — docs touched,
    spans replaced, and residual email hits AFTER redaction (the
    self-check column; nonzero means a pattern regressed).  Chained
    regexp_replace is a zero-shuffle scan pass over the corpus (the
    only acceptable shape at 100 TB); patterns are the same
    lookaround-free set as x43 so Java regex and RE2 agree span for
    span.  Redaction order (email, phone, IP) is part of the contract:
    both engines apply the same chain, so overlapping candidates
    resolve identically."""
    d = load(spark, sf, "documents")
    r = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.col("text"), PII_PATTERNS["emails"], "<EMAIL>"
            ),
            PII_PATTERNS["phones"],
            "<PHONE>",
        ),
        PII_PATTERNS["ipv4s"],
        "<IP>",
    )
    red = d.select("source", "text", r.alias("rtext"))
    n_marks = (
        F.size(F.regexp_extract_all("rtext", F.lit("<EMAIL>"), F.lit(0)))
        + F.size(F.regexp_extract_all("rtext", F.lit("<PHONE>"), F.lit(0)))
        + F.size(F.regexp_extract_all("rtext", F.lit("<IP>"), F.lit(0)))
    )
    residual = F.size(
        F.regexp_extract_all("rtext", F.lit(PII_PATTERNS["emails"]), F.lit(0))
    )
    return red.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum((F.col("rtext") != F.col("text")).cast("int"))
        .cast("bigint")
        .alias("docs_redacted"),
        F.sum(n_marks).cast("bigint").alias("n_redactions"),
        F.sum(residual).cast("bigint").alias("residual_hits"),
    )


@query(
    "x45_domain_cap",
    oracle="""
    SELECT source, doc_id, n_chars, CAST(rn AS INTEGER) AS rank_in_source
    FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= 5
    """,
)
def x45_domain_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain corpus caps: keep the top-5 docs per source by
    quality proxy (length, doc_id tiebreak for determinism) — the
    standard pretraining-mix step that stops one crawl domain from
    dominating the corpus.  Single shuffle on the source key; the rank
    predicate plans a WindowGroupLimit, so only k rows per domain
    survive each map task — at 100 TB the shuffle carries O(domains x
    k), not the corpus."""
    from pyspark.sql import Window

    d = load(spark, sf, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.select(
            "source",
            "doc_id",
            "n_chars",
            F.row_number().over(w).alias("rank_in_source"),
        )
        .filter(F.col("rank_in_source") <= 5)
    )


@query(
    "x46_line_dedup_ratio",
    oracle="""
    WITH lines AS (
      SELECT doc_id,
             len(string_split(text, chr(10))) AS n_lines,
             len(list_distinct(string_split(text, chr(10)))) AS n_unique_lines
      FROM documents
    )
    SELECT doc_id,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_unique_lines AS BIGINT) AS n_unique_lines,
           1.0 - n_unique_lines * 1.0 / n_lines AS dup_line_ratio,
           (1.0 - n_unique_lines * 1.0 / n_lines) <= 0.3 AS keep
    FROM lines
    """,
)
def x46_line_dedup_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document duplicate-line ratio — the boilerplate signal
    (repeated nav/footer lines) used by published corpus-quality
    pipelines as a drop rule.  Pure per-row array math (split +
    array_distinct + sizes): zero shuffles, JVM-side, scales as a scan
    pass; the keep flag applies the documented <=0.3 threshold.  A doc
    always has >=1 line (split never returns empty), so the ratio is
    total."""
    d = load(spark, sf, "documents")
    lines = F.split(F.col("text"), "\n")
    n = F.size(lines).cast("bigint")
    nu = F.size(F.array_distinct(lines)).cast("bigint")
    ratio = F.lit(1.0) - nu * F.lit(1.0) / n
    return d.select(
        "doc_id",
        n.alias("n_lines"),
        nu.alias("n_unique_lines"),
        ratio.alias("dup_line_ratio"),
        (ratio <= 0.3).alias("keep"),
    )


@query(
    "x47_substring_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             array_to_string(list_slice(ws, i+1, i+8), ' ') AS g
      FROM toks, LATERAL unnest(range(len(ws) - 7)) AS t(i)
      WHERE len(ws) >= 8
    ),
    dup AS (
      SELECT g FROM grams GROUP BY g HAVING min(doc_id) <> max(doc_id)
    ),
    cov AS (
      SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)
    ),
    merged AS (
      SELECT doc_id, pos,
             max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM cov
    ),
    per_doc AS (
      SELECT doc_id,
             SUM(pos + 8 - GREATEST(pos, COALESCE(prev_end, pos))) AS dup_tokens
      FROM merged GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           ROUND(COALESCE(p.dup_tokens, 0) * 1.0
                 / len(string_split(d.text, ' ')), 6) AS dup_frac,
           (COALESCE(p.dup_tokens, 0) * 1.0
                 / len(string_split(d.text, ' '))) < 0.5 AS keep
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def x47_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-document exact substring dedup: per-doc fraction of tokens
    covered by any 8-token span that ALSO appears verbatim in another
    document — the span-level dedup signal (published pipelines drop or
    trim docs whose training text is largely copied elsewhere, e.g. the
    50-token exact-substring rule; k=8 fits the synthetic corpus's doc
    lengths).

    Shape, built for the 100 TB case:
    - grams stream = one row per token (ONE sliding collect_list frame
      over the doc_id sort, same pattern as ``_shingle_rows`` — the
      explode(transform) alternative re-evaluates the array per output
      row, ~10x slower measured there; the earlier 7 lead() offset
      frames measured ~15% slower than the single sliding frame);
    - the shared-gram set derives from a ``groupBy(hash)`` whose ONLY
      aggregates are min/max(doc_id) — fully map-side combinable, and
      "appears in >1 distinct doc" falls out as ``min <> max`` with no
      countDistinct;
    - the exchange key is a 16-byte pair of independent xxhash64 seeds,
      never the gram text (the oracle groups the raw string; a false
      positive needs a simultaneous 2x64-bit collision, ~2^-128);
    - cover marking is a LEFT SEMI join gram-stream -> shared-set: at
      most one match per row, so a boilerplate gram shared by millions
      of docs cannot explode the join (posting-list designs would);
    - span union per doc is gaps-and-islands: each covered position
      contributes ``pos+k - max(pos, running_max(prev ends))`` — exact
      merged-interval length with one window over the doc_id sort;
    - MULTIPLICITY COLLAPSE (adaptive, r8 — the same gate as x2/x13):
      on a duplicate-saturated corpus the gram stream mines over
      DISTINCT texts only.  Exact: a text with multiplicity >1 has
      every gram verbatim in its own copies, so its docs are FULLY
      covered by definition (dup_tokens = n_tokens when the doc has
      grams at all); a unique text's gram is cross-doc-shared iff it
      appears in another representative (another rep's copies are
      still other docs, and its own rep has no other docs).  Found by
      the sf10 dedup ladder: the direct path went linear-in-rows at
      100x replication while x2/x48 stayed flat on their collapses.
    """
    d = load(spark, sf, "documents")
    ratio = _duplication_ratio(d, "text", (sf, "documents.text"))
    base = _x47_base(d)
    if ratio < _COLLAPSE_AT:
        return _x47_finalize(base, _x47_per_doc(spark, base))
    groups = _text_groups(d)
    rep_base = _x47_base(
        groups.select(F.col("rep").alias("doc_id"), "text")
    )
    per_rep = _x47_per_doc(spark, rep_base).withColumnRenamed("doc_id", "rep")
    K = _X47_K
    expanded = (
        groups.join(per_rep, "rep", "left")
        .select(
            F.explode("members").alias("doc_id"),
            F.size("members").alias("m"),
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
            F.col("dup_tokens").alias("rep_dup"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.when(
                F.col("m") > 1,
                F.when(F.col("n_tokens") >= K, F.col("n_tokens")).otherwise(
                    F.lit(0)
                ),
            )
            .otherwise(F.coalesce("rep_dup", F.lit(0)))
            .cast("bigint")
            .alias("dup_tokens"),
        )
    )
    frac = F.col("dup_tokens") * F.lit(1.0) / F.col("n_tokens")
    return expanded.select(
        "doc_id",
        "n_tokens",
        "dup_tokens",
        F.round(frac, 6).alias("dup_frac"),
        (frac < 0.5).alias("keep"),
    )


_X47_K = 8


def _x47_base(d: DataFrame) -> DataFrame:
    return d.select("doc_id", F.split("text", " ").alias("ws")).select(
        "doc_id", F.size("ws").cast("bigint").alias("n_tokens"), "ws"
    )


def _x47_per_doc(spark, base: DataFrame) -> DataFrame:
    """(doc_id, dup_tokens) over one corpus: shared-gram cover marking
    + gaps-and-islands interval union (see x47 docstring for the plan
    rationale; shared by the direct and collapsed paths)."""
    from pyspark.sql import Window as W

    K = _X47_K
    par = base.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    we = par.select(
        "doc_id", F.posexplode("ws").alias("pos", "w")
    )
    win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.currentRow, K - 1)
    grams = (
        we.withColumn("t", F.collect_list("w").over(win))
        .filter(F.size("t") == K)
        .select("doc_id", "pos", F.array_join("t", " ").alias("g"))
        .select(
            "doc_id",
            "pos",
            F.xxhash64("g").alias("k1"),
            F.xxhash64(F.lit(41), "g").alias("k2"),
        )
    )
    shared = (
        grams.groupBy("k1", "k2")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .select("k1", "k2")
    )
    cov = grams.join(shared, ["k1", "k2"], "left_semi").select("doc_id", "pos")
    prev_end = F.max(F.col("pos") + K).over(
        W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    )
    per_doc = (
        cov.withColumn("prev_end", prev_end)
        .select(
            "doc_id",
            (
                F.col("pos")
                + K
                - F.greatest(F.col("pos"), F.coalesce("prev_end", "pos"))
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").cast("bigint").alias("dup_tokens"))
    )
    return per_doc


def _x47_finalize(base: DataFrame, per_doc: DataFrame) -> DataFrame:
    frac = F.coalesce("dup_tokens", F.lit(0)) * F.lit(1.0) / F.col("n_tokens")
    return (
        base.select("doc_id", "n_tokens")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
            F.round(frac, 6).alias("dup_frac"),
            (frac < 0.5).alias("keep"),
        )
    )


@query(
    "x48_semantic_dedup",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_lsh_sql_bucket('embedding')} AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.bucket,
             a.vec_id AS id_a, c.vec_id AS id_b,
             {_SQL_DOT.format(a='a.embedding', b='c.embedding')}
             / (sqrt({_SQL_DOT.format(a='a.embedding', b='a.embedding')})
                * sqrt({_SQL_DOT.format(a='c.embedding', b='c.embedding')})) AS cos
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY bucket ORDER BY ROUND(cos, 6) DESC, id_a, id_b) AS rk
      FROM pairs
    )
    SELECT bucket, id_a, id_b, ROUND(cos, 4) AS cos_sim
    FROM ranked WHERE rk <= 3
    """,
)
def x48_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic near-duplicate CANDIDATE mining: bucket
    embeddings (here the frozen sign-LSH planes so the DuckDB oracle is
    bit-deterministic; at scale the buckets come from x20's distributed
    k-means — many more, data-aware), take the within-bucket pairwise
    cosines, and surface the top-3 most similar pairs per bucket — the
    candidates a semantic dedup would re-verify and drop (Abbas et al.
    2023's SemDeDup pipeline shape: cluster, then pairwise ONLY inside
    clusters).

    Plan, built for the 100 TB case: ONE exchange on the bucket id
    serves the self-join's both sides (ReuseExchange — the scan +
    bucket expression is narrow), the quadratic pair expansion is
    confined to a bucket (SemDeDup's core trick: cluster count grows
    with the corpus, so per-bucket N stays bounded), cosine runs
    JVM-side (zip_with/aggregate higher-order functions, no Python),
    and the per-bucket top-3 is a WindowGroupLimit on the SAME bucket
    partitioning the join just produced — zero additional exchanges
    after the join.

    MULTIPLICITY COLLAPSE (adaptive, mirroring x2/x13): a
    duplicate-saturated corpus (the sf1 ladder replicates identical
    vectors 10×) makes the within-bucket quadratic grow as K² in the
    duplication factor — measured 12.8× time for 10× data before this
    path.  When the corpus duplication stat says so, exact-duplicate
    vectors collapse to one representative before bucketing; the
    bucket top-3 is then reconstructed EXACTLY from a provable
    candidate superset: a rep pair's smallest expanded member pair is
    (least, greatest) of the two reps (reps are group minima), so the
    top-3 rep pairs under (cos, least, greatest) expanded to their 3
    smallest member pairs, unioned with the 3 smallest within-group
    pairs of the top-3 duplicate groups, contain the true top-3 —
    pinned equivalent to the direct path on a replicated corpus
    (tests/test_adaptive_collapse.py)."""
    e = load(spark, sf, "embeddings")
    planes, ratio = _x48_corpus_planes(e, sf)
    if ratio < _COLLAPSE_AT:
        return _x48_topk_direct(e, planes)
    return _x48_topk_collapsed(e, planes)


def _x48_corpus_planes(e: DataFrame, sf: str):
    """(planes, duplication ratio) for the embeddings corpus.  Plane
    count is sized by the ESTIMATED DISTINCT vector count (rows /
    duplication ratio), not raw rows — both stats fall out of one
    cached single-scan profile, and using distinct keeps the bucket
    function IDENTICAL between the direct and collapsed paths (the
    collapse buckets representatives; sizing by raw rows would give
    the two paths different bucketings and break their pinned
    equivalence), while exact duplicates land in one bucket anyway."""
    key = (sf, "embeddings.embedding")
    ratio = _duplication_ratio(e, "embedding", key)
    n = _corpus_rows(e, key)
    return _x48_planes(int(n / max(ratio, 1.0))), ratio


#: past this corpus size the sign-LSH bucket count grows with the data
#: (below it the 4 frozen planes = 16 buckets stay bit-identical to the
#: DuckDB oracle — sf0.01/sf0.1 fixtures are far under it)
_X48_FROZEN_MAX = 4096


def _x48_planes(n_rows: int) -> list:
    """Sign-LSH planes for a corpus of *n_rows* vectors.  SemDeDup's
    scale story is that CLUSTER COUNT grows with the corpus so
    per-cluster depth stays bounded (Abbas et al. 2023 use 10k+ k-means
    clusters); with a FIXED 16 buckets the within-bucket quadratic is
    O(n²/16) — the r9 unique-corpus ladder measured exactly that
    asymptote.  Doubling the planes per corpus doubling keeps expected
    bucket depth ≈ _X48_FROZEN_MAX, making total pair work ~linear in
    rows.  Extra planes extend the SAME md5-derived deterministic
    sequence, so any two runs at one corpus size agree exactly; at and
    below _X48_FROZEN_MAX the planes are the frozen 4 (oracle regime,
    bit-identical to _lsh_sql_bucket)."""
    import math

    extra = (
        math.ceil(math.log2(n_rows / _X48_FROZEN_MAX))
        if n_rows > _X48_FROZEN_MAX
        else 0
    )
    return [
        [
            round(
                int(_hashlib.md5(f"lshplane|{p}|{j}".encode()).hexdigest()[:8], 16)
                / 0xFFFFFFFF
                * 2
                - 1,
                6,
            )
            for j in range(64)
        ]
        for p in range(4 + extra)
    ]


def _x48_bucket_col(planes=None):
    return _sign_bucket_expr(planes if planes is not None else _LSH_PLANES)


def _np_round_half_up(c, nd: int = 6):
    """numpy round that matches Spark's ``round`` (HALF_UP on the
    shortest-decimal repr) instead of banker's rounding (ADVICE r13:
    the x48 in-scorer ranking key must use the SAME selection rule as
    the displaced window and the oracle by construction, not by
    fixture pin).  Fast path: ``np.round``; only elements sitting
    within 1e-9 of a half boundary (where the two rules can differ)
    re-round through decimal HALF_UP — cosines land there ~never, so
    the slow path is O(suspects)."""
    import numpy as np

    c = np.asarray(c, dtype=np.float64)
    r = np.round(c, nd)
    scaled = np.abs(c) * (10.0**nd)
    frac = scaled - np.floor(scaled)
    sus = np.abs(frac - 0.5) < 1e-9
    if sus.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal(1).scaleb(-nd)
        r = r.copy()
        for i in np.nonzero(sus)[0]:
            r[i] = float(
                Decimal(repr(float(c[i]))).quantize(q, rounding=ROUND_HALF_UP)
            )
    return r


def _x48_rep_pairs(b, top3: bool = False) -> DataFrame:
    """(bucket, id_a, id_b, cos) for every within-bucket pair of the
    given (vec_id, embedding, bucket) frame — or only each bucket's
    top-3 pairs under (round(cos,6) desc, id_a, id_b) when ``top3``.

    r13 (guide §4.2): ONE numpy gram matrix per bucket inside
    applyInPandas replaces the bucket self-join + per-pair interpreted
    zip_with cosine — the x13 shape.  Each vector crosses the exchange
    once (n rows, never n²/buckets pair rows with two 64-dim arrays
    each), and the O(depth²·dim) hot loop is one BLAS call; measured
    2.0 s → 0.5 s at sf0.1 (131k pairs).  Per-bucket depth is bounded
    by the plane-count growth (``_x48_planes``), the same knob that
    bounds x13's blocks, so the gram matrix stays in executor memory.

    Equivalence with the old JVM fold (and hence the DuckDB oracle):
    float64 BLAS and the sequential fold differ only in the last ulp;
    every comparison the query makes happens AFTER round(·,6)/(·,4),
    where the two agree — pinned exhaustively over every within-bucket
    pair at sf0.001/0.01/0.1 (tests/test_adaptive_collapse.py
    test_x48_gram_matches_jvm_fold: 147k pairs, zero round-6 or
    round-4 mismatches), and structurally by the direct≡collapsed
    pins which now share this one scorer."""

    def score(pdf):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        # the old join dropped null join keys and null ids; groupBy
        # keeps a null-key group — drop it here, Python-side, so the
        # bucket expression is evaluated ONCE per row in the grouping
        # projection (a Spark-side isnotnull filter gets pushed below
        # the projection and re-evaluates the 4-plane dot per row)
        pdf = pdf[pdf["bucket"].notna() & pdf["vec_id"].notna()]
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame(
                {
                    "bucket": pd.Series([], dtype="int32"),
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        V = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
        G = V @ V.T
        nrm = np.sqrt(np.diag(G))
        cos = G / np.outer(nrm, nrm)
        ia, ib = np.triu_indices(len(ids), k=1)  # sorted ids → id_a < id_b
        c = cos[ia, ib]
        if top3:
            # rank exactly as _x48_rank3: round-6 desc, then id_a, id_b
            # (HALF_UP like Spark round — _np_round_half_up)
            keep = np.lexsort((ids[ib], ids[ia], -_np_round_half_up(c, 6)))[:3]
            ia, ib, c = ia[keep], ib[keep], c[keep]
        return pd.DataFrame(
            {
                "bucket": np.full(len(c), pdf["bucket"].iloc[0], dtype="int32"),
                "id_a": ids[ia],
                "id_b": ids[ib],
                "cos": c,
            }
        )

    return (
        b.select("bucket", "vec_id", "embedding")
        .groupBy("bucket")
        .applyInPandas(score, "bucket int, id_a bigint, id_b bigint, cos double")
    )


def _x48_rank3(pairs) -> DataFrame:
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("bucket").orderBy(
            F.round("cos", 6).desc(), F.asc("id_a"), F.asc("id_b")
        )
    )
    return (
        pairs.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select("bucket", "id_a", "id_b", F.round("cos", 4).alias("cos_sim"))
    )


def _x48_topk_direct(e: DataFrame, planes=None) -> DataFrame:
    # top-3 selection happens INSIDE the per-bucket gram scorer (same
    # (round(cos,6) desc, id_a, id_b) order _x48_rank3 uses), so the
    # only wide op in the whole plan is the ONE groupBy(bucket)
    # exchange — the window's second exchange is gone and the Arrow
    # boundary returns ≤3 rows per bucket instead of all pairs
    b = e.select(
        "vec_id",
        "embedding",
        _x48_bucket_col(planes).alias("bucket"),
    )
    return _x48_rep_pairs(b, top3=True).select(
        "bucket", "id_a", "id_b", F.round("cos", 4).alias("cos_sim")
    )


def _x48_topk_collapsed(e: DataFrame, planes=None) -> DataFrame:
    """Exact top-3-per-bucket on a duplicate-saturated corpus: collapse
    identical vectors (16-byte rolling-hash keys), run the quadratic on
    representatives only, reconstruct from the provable candidate
    superset (see x48's docstring).  All orderings are by
    (round(cos,6) desc, id_a, id_b) — identical to the direct path."""
    from pyspark.sql import Window as W

    h1 = F.expr("aggregate(embedding, 0L, (a, x) -> xxhash64(a, x))")
    h2 = F.expr("aggregate(embedding, 1L, (a, x) -> xxhash64(a, x))")
    groups = e.groupBy(h1.alias("_h1"), h2.alias("_h2")).agg(
        F.min("vec_id").alias("rep"),
        F.sort_array(F.collect_list("vec_id")).alias("members"),
        F.first("embedding").alias("embedding"),
    )
    b = groups.select(
        F.col("rep").alias("vec_id"),
        "embedding",
        "members",
        _x48_bucket_col(planes).alias("bucket"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    # --- cross-group candidates: top-3 rep pairs per bucket under
    # (cos, least, greatest) == smallest-expanded-pair order, each
    # expanded to its 3 smallest member pairs
    rp = _x48_rep_pairs(b.select("bucket", "vec_id", "embedding"))
    rp_rk = F.row_number().over(
        W.partitionBy("bucket").orderBy(
            F.round("cos", 6).desc(), F.asc("id_a"), F.asc("id_b")
        )
    )
    top_rp = rp.withColumn("rk", rp_rk).filter(F.col("rk") <= 3).drop("rk")
    mem = b.select(F.col("vec_id").alias("rep"), "members")
    cross = (
        top_rp.join(mem.select(F.col("rep").alias("id_a"), F.col("members").alias("ma")), "id_a")
        .join(mem.select(F.col("rep").alias("id_b"), F.col("members").alias("mb")), "id_b")
        .select(
            "bucket",
            "cos",
            F.explode(
                # all member combinations, normalized to id_a < id_b,
                # then the 3 smallest per rep pair (slice after sort)
                F.slice(
                    F.array_sort(
                        F.expr(
                            "flatten(transform(ma, x -> transform(mb,"
                            " y -> struct(least(x, y) AS id_a,"
                            " greatest(x, y) AS id_b))))"
                        )
                    ),
                    1,
                    3,
                )
            ).alias("p"),
        )
        .select("bucket", F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"), "cos")
    )
    # --- within-group candidates: top-3 duplicate groups per bucket by
    # (cos_dup, rep, second member), 3 smallest pairs each; cos_dup is
    # the direct path's exact expression with both sides the same
    # vector (identical fold → identical float)
    dup = b.filter(F.size("members") > 1).select(
        "bucket",
        "members",
        (_dot(F.col("embedding"), F.col("embedding")) / (F.col("nrm") * F.col("nrm"))).alias("cos"),
    )
    g_rk = F.row_number().over(
        W.partitionBy("bucket").orderBy(
            F.round("cos", 6).desc(),
            F.asc(F.element_at("members", 1)),
            F.asc(F.element_at("members", 2)),
        )
    )
    within = (
        dup.withColumn("rk", g_rk)
        .filter(F.col("rk") <= 3)
        .select(
            "bucket",
            "cos",
            F.explode(
                F.slice(
                    F.expr(
                        "flatten(transform(sequence(1, size(members) - 1),"
                        " i -> transform(slice(members, i + 1, size(members) - i),"
                        " y -> struct(members[i-1] AS id_a, y AS id_b))))"
                    ),
                    1,
                    3,
                )
            ).alias("p"),
        )
        .select("bucket", F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"), "cos")
    )
    return _x48_rank3(cross.unionByName(within))


_X49_LUT = ",\n             ".join(
    f"{_sql_sub_sqdist('q.qv', 'c.c0', s)} AS d0_{s},"
    f" {_sql_sub_sqdist('q.qv', 'c.c1', s)} AS d1_{s}"
    for s in range(4)
)

_X49_ADC = "\n           + ".join(
    f"CASE WHEN b.b{s} = 1 THEN l.d1_{s} ELSE l.d0_{s} END" for s in range(4)
)


@query(
    "x49_pq_adc_search",
    oracle=f"""
    WITH c AS (
      SELECT (SELECT embedding FROM embeddings WHERE vec_id = 0) AS c0,
             (SELECT embedding FROM embeddings WHERE vec_id = 1) AS c1
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 2),
    bits AS (
      SELECT e.vec_id,
             {_X40_BITS}
      FROM embeddings e CROSS JOIN c
    ),
    lut AS (
      SELECT {_X49_LUT}
      FROM q CROSS JOIN c
    )
    SELECT b.vec_id,
           ROUND({_X49_ADC}, 4) AS adc_dist
    FROM bits b CROSS JOIN lut l
    WHERE b.vec_id NOT IN (0, 1, 2)
    ORDER BY ROUND({_X49_ADC}, 6), b.vec_id
    LIMIT 10
    """,
)
def x49_pq_adc_search(spark: SparkSession, sf: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) search — the query leg that makes
    x40's codes an index (Jegou et al. 2011): the query vector is NOT
    quantized; per subspace its squared distance to every codebook
    centroid is tabulated ONCE (a 4x2 lookup table here; 4x256 in a
    real index), and each database vector scores as the sum of 4 table
    lookups selected by its stored code — no touching the original
    vectors at query time.

    Scale shape: codebooks and the LUT broadcast (1-row cross joins);
    the scan reads only (vec_id, code-bits) — with codes materialized
    as a column the 64x4-byte embeddings never load at all, a 256x
    scan-width cut; scoring is a per-row CASE-sum in whole-stage
    codegen and the finish is TakeOrderedAndProject (no global sort).
    Determinism: same round-before-compare folds as x39/x40."""
    e = load(spark, sf, "embeddings")
    cents = (
        e.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("c0"))
        .crossJoin(e.filter(F.col("vec_id") == 1).select(F.col("embedding").alias("c1")))
    )
    q = e.filter(F.col("vec_id") == 2).select(F.col("embedding").alias("qv"))

    def sub_sqdist(vec: str, cent: str, s: int):
        return F.aggregate(
            F.zip_with(
                F.slice(vec, s * 16 + 1, 16),
                F.slice(cent, s * 16 + 1, 16),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bits = [
        F.when(
            F.round(sub_sqdist("embedding", "c1", s), 6)
            < F.round(sub_sqdist("embedding", "c0", s), 6),
            1,
        ).otherwise(0)
        for s in range(4)
    ]
    adc = None
    for s in range(4):
        term = F.when(bits[s] == 1, sub_sqdist("qv", "c1", s)).otherwise(
            sub_sqdist("qv", "c0", s)
        )
        adc = term if adc is None else adc + term
    return (
        e.crossJoin(F.broadcast(cents))
        .crossJoin(F.broadcast(q))
        .filter(~F.col("vec_id").isin(0, 1, 2))
        .select("vec_id", adc.alias("adc"))
        .orderBy(F.round("adc", 6).asc(), F.asc("vec_id"))
        .select("vec_id", F.round("adc", 4).alias("adc_dist"))
        .limit(10)
    )


_X50_PRE_DOT = (
    "list_aggregate(list_transform(range(1, 17),"
    " i -> {a}[i] * {b}[i]), 'sum')"
)


@query(
    "x50_matryoshka_rerank",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    pre AS (
      SELECT e.vec_id, e.embedding, q.qv,
             {_X50_PRE_DOT.format(a='e.embedding', b='q.qv')}
             / (sqrt({_X50_PRE_DOT.format(a='e.embedding', b='e.embedding')})
                * sqrt({_X50_PRE_DOT.format(a='q.qv', b='q.qv')})) AS pre_cos
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> 0
    ),
    cand AS (
      SELECT * FROM pre ORDER BY ROUND(pre_cos, 6) DESC, vec_id LIMIT 50
    )
    SELECT vec_id,
           ROUND({_SQL_DOT.format(a='embedding', b='qv')}
             / (sqrt({_SQL_DOT.format(a='embedding', b='embedding')})
                * sqrt({_SQL_DOT.format(a='qv', b='qv')})), 4) AS cos_sim
    FROM cand
    ORDER BY ROUND({_SQL_DOT.format(a='embedding', b='qv')}
             / (sqrt({_SQL_DOT.format(a='embedding', b='embedding')})
                * sqrt({_SQL_DOT.format(a='qv', b='qv')})), 6) DESC, vec_id
    LIMIT 10
    """,
)
def x50_matryoshka_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka two-stage retrieval (Kusupati et al. 2022's MRL
    serving pattern): stage 1 ranks on the 16-dim PREFIX of the
    embedding (MRL-trained embeddings keep most signal in the prefix)
    and keeps 50 candidates; stage 2 re-ranks ONLY those 50 with the
    full 64-dim cosine.

    Scale shape: stage 1 reads a quarter of the vector bytes (with the
    prefix materialized as its own column the scan-width cut is real,
    like x49's codes) and finishes with TakeOrderedAndProject — a
    per-partition top-50 then a driver merge of 50-row heaps, never a
    global sort; stage 2 touches exactly 50 full vectors, so its cost
    is independent of corpus size.  The query vector broadcasts into
    both stages; everything stays in whole-stage codegen.

    Recall is geometry-dependent: these fixture vectors are NOT
    MRL-trained, so the 16-dim prefix carries only ~1/4 of the signal
    and default-depth recall is low here by construction (tests pin
    that stage1_k=everything reproduces the exact brute-force ranking
    — the two-stage machinery itself loses nothing; on MRL embeddings
    the prefix is trained to preserve the ranking)."""
    return _matryoshka_rerank(spark, sf, stage1_k=50)


def _matryoshka_rerank(spark: SparkSession, sf: str, stage1_k: int) -> DataFrame:
    e = load(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))

    def pre_dot(a, b):
        return F.aggregate(
            F.zip_with(
                F.slice(a, 1, 16),
                F.slice(b, 1, 16),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    pre_cos = pre_dot(F.col("embedding"), F.col("qv")) / (
        F.sqrt(pre_dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(pre_dot(F.col("qv"), F.col("qv")))
    )
    cand = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "embedding", "qv", pre_cos.alias("pre_cos"))
        .orderBy(F.round("pre_cos", 6).desc(), F.asc("vec_id"))
        .limit(stage1_k)
    )
    full_cos = _dot(F.col("embedding"), F.col("qv")) / (
        F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    return (
        cand.select("vec_id", full_cos.alias("cos"))
        .orderBy(F.round("cos", 6).desc(), F.asc("vec_id"))
        .select("vec_id", F.round("cos", 4).alias("cos_sim"))
        .limit(10)
    )


@query(
    "x51_audio_chunk_energy",
    oracle="""
    WITH bl AS (
      SELECT doc_id,
             list_transform(range(1, len(text) + 1), i -> ord(text[i])) AS bs
      FROM documents
    ),
    bytes AS (
      SELECT doc_id,
             CAST((generate_subscripts(bs, 1) - 1) // 256 AS INT) AS chunk_idx,
             unnest(bs) AS b
      FROM bl
    ),
    chunks AS (
      SELECT doc_id, chunk_idx,
             CAST(COUNT(*) AS INT) AS n_samples,
             AVG(CAST(b AS DOUBLE) * b) AS energy
      FROM bytes GROUP BY doc_id, chunk_idx
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_samples) AS BIGINT) AS n_samples,
           ROUND(MAX(energy), 4) AS peak_energy,
           ROUND(AVG(energy), 4) AS avg_energy
    FROM chunks GROUP BY doc_id
    """,
)
def x51_audio_chunk_energy(spark: SparkSession, sf: str) -> DataFrame:
    """Audio-pipeline plumbing end-to-end: opaque payloads chunk into
    fixed 256-sample windows with per-window energy (multimodal.
    audio_chunks — Arrow-batched mapInPandas, deterministic fake PCM
    decode since no audio libs ship in this container), then a per-doc
    rollup (chunk count, peak / average window energy — the VAD-style
    statistics a filtering pass gates on).

    Scale shape: decode+chunk is a map-only Arrow pass (no shuffle);
    the rollup groups on doc_id, which the payload attach step already
    partitioned by, so the aggregate is partial-only.  The oracle
    recomputes from the characters (ASCII corpus: ord(char) == payload
    byte); energies are exact integer ratios in double, rounded once."""
    from ..multimodal import attach_binary_payload, audio_chunks

    d = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    ch = audio_chunks(attach_binary_payload(d))
    return ch.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_samples").cast("bigint").alias("n_samples"),
        F.round(F.max("energy"), 4).alias("peak_energy"),
        F.round(F.avg("energy"), 4).alias("avg_energy"),
    )


@query(
    "x53_mixture_resample",
    oracle="""
    WITH w AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
             CAST(regexp_replace(source, 'src', '') AS INT) % 4 AS m,
             substring(md5('mix42|' || CAST(doc_id AS VARCHAR)), 1, 4) AS pfx
      FROM documents
    ),
    kept AS (
      SELECT * FROM w
      WHERE m = 3
         OR pfx < CASE m WHEN 0 THEN '4000' WHEN 1 THEN '8000' ELSE 'c000' END
    )
    SELECT source,
           ROUND((CAST(ANY_VALUE(m) AS DOUBLE) + 1) / 4, 2) AS target_w,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM kept GROUP BY source
    """,
)
def x53_mixture_resample(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-mixture resampling (the DoReMi/Pile recipe step): each
    source gets a target acceptance weight and documents are kept by a
    SALTED-HASH threshold on the stable doc_id — the mixture achieved
    is deterministic, shard-independent, and reproducible across
    re-runs (no RNG state; re-processing any partition makes the same
    decisions, the property 100 TB pipelines need).  Weights here
    derive from the source id (1/4..4/4) so the oracle can recompute
    them; production supplies a broadcast weight table and the rule is
    identical: keep iff md5-prefix < weight threshold.

    Plan: single scan pass, filter + aggregate, zero shuffles before
    the 20-group rollup.  Output audits the achieved mixture (docs and
    tokens kept per source against the target weight)."""
    d = load(spark, sf, "documents")
    m = F.regexp_replace("source", "src", "").cast("int") % 4
    pfx = F.substring(
        F.md5(F.concat(F.lit("mix42|"), F.col("doc_id").cast("string"))), 1, 4
    )
    thr = F.when(m == 0, "4000").when(m == 1, "8000").otherwise("c000")
    kept = d.select(
        "source",
        m.alias("m"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    ).filter((m == 3) | (pfx < thr))
    return kept.groupBy("source").agg(
        F.round((F.any_value("m").cast("double") + 1) / 4, 2).alias("target_w"),
        F.count("*").alias("n_kept"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )


@query(
    "x54_simhash_neardup",
    oracle=f"""
    WITH words AS (
      SELECT doc_id,
             ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 12))::BIGINT AS h
      FROM documents
    ),
    bits AS (
      SELECT doc_id,
             {_X4_BIT_SUMS}
      FROM words GROUP BY doc_id
    ),
    sims AS (
      SELECT doc_id, CAST({_X4_RECOMBINE} AS BIGINT) AS simhash FROM bits
    ),
    bands AS (
      SELECT s.doc_id, s.simhash, t.b,
             (s.simhash >> CAST(12 * t.b AS INT)) & 4095 AS bv
      FROM sims s, range(0, 4) t(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             ANY_VALUE(a.simhash) AS sa, ANY_VALUE(c.simhash) AS sb
      FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id
      GROUP BY a.doc_id, c.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """,
)
def x54_simhash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-duplicate pairs at Hamming distance <= 3 — the
    Manku/Jain/Das Sarma (WWW'07) web-dedup construction: split the
    48-bit fingerprint into 4 bands of 12 bits; by pigeonhole any pair
    within Hamming 3 agrees EXACTLY on at least one band, so candidate
    generation is 4 equality-keyed bucket joins (never an all-pairs
    scan), and the cheap bit_count(xor) verify runs only inside
    buckets.

    Plan shape for 100 TB: ONE exchange of the (band, band-value)
    stream (16 bytes per row x 4 rows per doc), in-place posting-list
    pair expansion exactly like x2 (a bucket's pairs never leave their
    aggregation buffer unverified — the Hamming filter applies INSIDE
    the expansion lambda), then a distinct on the surviving pair ids.
    Banding is the published scale knob: more bands = higher Hamming
    tolerance at the same per-bucket cost."""
    sims = _simhash_df(spark, sf)
    bands = sims.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("b"),
                    F.shiftright("simhash", 12 * b)
                    .bitwiseAND(F.lit(4095))
                    .alias("bv"),
                )
                for b in range(4)
            ])
        ).alias("band"),
    ).select("doc_id", "simhash", "band.b", "band.bv")
    buckets = (
        bands.groupBy("b", "bv")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "simhash"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(ds) - 1),"
                " i -> filter(transform(slice(ds, i + 1, size(ds) - i),"
                " y -> struct(ds[i-1].doc_id AS id_a, y.doc_id AS id_b,"
                "             ds[i-1].simhash AS sa, y.simhash AS sb)),"
                " p -> bit_count(p.sa ^ p.sb) <= 3)))"
            )
        ).alias("p")
    )
    return (
        pairs.select(
            "p.id_a",
            "p.id_b",
            F.bit_count(F.col("p.sa").bitwiseXOR(F.col("p.sb"))).alias("hamming"),
        )
        .distinct()
    )


@query(
    "x55_semantic_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE b AS (
      SELECT vec_id, embedding, {_lsh_sql_bucket('embedding')} AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
      WHERE ROUND({_SQL_DOT.format(a='a.embedding', b='c.embedding')}
             / (sqrt({_SQL_DOT.format(a='a.embedding', b='a.embedding')})
                * sqrt({_SQL_DOT.format(a='c.embedding', b='c.embedding')})), 6)
            >= 0.35
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    verts AS (SELECT DISTINCT s AS id FROM edges),
    walk(id, label) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.d, w.label FROM walk w JOIN edges e ON e.s = w.id
    )
    SELECT id AS vec_id, MIN(label) AS cluster FROM walk GROUP BY id
    """,
)
def x55_semantic_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """The SemDeDup chain COMPLETED: sign-LSH-blocked cosine candidate
    pairs (x48's blocking, threshold form) → distributed
    connected-components (iterative min-label propagation, one
    join+aggregate per round — icepack/dedup.py) → (vec_id, cluster)
    with cluster = MIN reachable id, the survivor key a dedup drop
    policy consumes.  The oracle recomputes the same graph with a
    recursive CTE (x16's pattern for the text-LSH chain).

    The cosine threshold compares ROUND(cos, 6) on both engines so a
    boundary pair cannot flip membership on last-bit float drift.
    Scale: pairwise work stays bucket-confined; component propagation
    converges in O(diameter) rounds (near-dup graphs are
    short-diameter); nothing touches the driver but the loop's
    convergence flag."""
    from ..dedup import connected_components

    e = load(spark, sf, "embeddings")
    # same blocking as x48 — ONE shared implementation (_x48_bucket_col
    # / _x48_rep_pairs, including the data-aware plane count so bucket
    # depth stays bounded as the corpus grows), threshold form instead
    # of top-3
    planes, _ratio = _x48_corpus_planes(e, sf)
    b = e.select(
        "vec_id",
        "embedding",
        _x48_bucket_col(planes).alias("bucket"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    pairs = (
        _x48_rep_pairs(b)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
        .filter(F.col("cos") >= 0.35)
    )
    return connected_components(pairs).select(
        F.col("id").alias("vec_id"), F.col("cluster")
    )


@query(
    "x56_containment_dedup",
    oracle=_SQL_SHINGLES
    + """
    , ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh_tbl),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh_tbl),
    kept AS (
      SELECT doc_id, sh FROM ex
      QUALIFY COUNT(*) OVER (PARTITION BY sh) <= 64
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT CASE WHEN sa.n_sh <= sb.n_sh THEN p.id_a ELSE p.id_b END AS contained_id,
           CASE WHEN sa.n_sh <= sb.n_sh THEN p.id_b ELSE p.id_a END AS container_id,
           ROUND(CAST(p.common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh), 4)
             AS containment
    FROM pairs p
    JOIN sizes sa ON p.id_a = sa.doc_id
    JOIN sizes sb ON p.id_b = sb.doc_id
    WHERE LEAST(sa.n_sh, sb.n_sh) >= 5
      AND CAST(p.common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= 0.9
    """,
)
def x56_containment_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Near-CONTAINMENT pairs: a document whose shingle set is >= 90%
    inside another document's is subsumed (quote farms, scraped
    re-posts with added boilerplate) — the curation rule Jaccard
    misses by construction (J = min/max punishes size asymmetry; x2's
    PPJoin length filter deliberately DROPS these pairs, so
    containment runs its own expansion without it).

    Same packed inverted index as x2 — one posting-list exchange on
    xxhash64 keys, (doc_id, n_sh) packed into one bigint, in-place
    bucket pair expansion — but the expansion keeps ALL size
    combinations.  Hot-shingle blowup is bounded the way x31 bounds
    it, APPLIED here (not just cited): posting lists longer than 64
    are dropped before expansion — a boilerplate gram shared by
    thousands of docs contributes no pairs, and near-containment
    support then rests on the document's distinctive grams, which is
    the signal that matters (the common count is a lower bound, so
    the reported containment never overstates).  The cap is mirrored
    in the oracle (QUALIFY count <= 64).  Output keys the CONTAINED
    doc (the drop candidate) with its container and the containment
    fraction — a lower-bound fraction under the cap.

    MULTIPLICITY COLLAPSE (adaptive, r8 — the x2/x47 gate): on a
    duplicate-saturated corpus the shingle exchange runs over DISTINCT
    texts, with the posting-list CAP applied to the multiplicity-
    weighted total (Σ copies per shingle — exactly the raw posting
    length), so capping decisions are bit-identical to the direct
    path's.  Cross-text pairs expand to member pairs (same common
    count and sizes); same-text pairs score kept_shingles / n_sh — the
    capped-bucket membership count, NOT an assumed 1.0, because a text
    whose shingles are all boilerplate-capped has zero support in the
    direct path too.  The sf30 dedup-ladder rung (300x) motivated it:
    the direct path is a linear 300x shingle scan that finds nothing
    (every posting ≥ 300 > cap), the collapsed one exchanges 1x."""
    d = load(spark, sf, "documents").select("doc_id", "text")
    ratio = _duplication_ratio(d, "text", (sf, "documents.text"))
    if ratio < _COLLAPSE_AT:
        return _x56_direct(spark, sf, d)
    return _x56_collapsed(spark, sf, d)


def _x56_direct(spark, sf, d) -> "DataFrame":
    ex = _shingle_rows(spark, sf, distinct=True, docs=d, hashed=True)
    packed = ex.select(
        "sh", (F.shiftleft(F.col("doc_id"), 25) + F.col("n_sh")).alias("dn")
    )
    buckets = (
        packed.groupBy("sh")
        .agg(F.array_sort(F.collect_list("dn")).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= 64))
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(ds) - 1),"
                " i -> transform(slice(ds, i + 1, size(ds) - i),"
                " y -> struct(ds[i-1] AS a, y AS b))))"
            )
        ).alias("p")
    )
    counts = pairs.groupBy("p.a", "p.b").agg(F.count("*").alias("common"))
    return _x56_score(counts)


def _x56_score(counts: "DataFrame") -> "DataFrame":
    n_a = F.col("a").bitwiseAND(F.lit(_PACK_MASK)).cast("double")
    n_b = F.col("b").bitwiseAND(F.lit(_PACK_MASK)).cast("double")
    mn = F.least(n_a, n_b)
    cont = F.col("common").cast("double") / mn
    id_a = F.shiftright(F.col("a"), 25)
    id_b = F.shiftright(F.col("b"), 25)
    return (
        counts.filter((mn >= 5) & (cont >= 0.9))
        .select(
            F.when(n_a <= n_b, id_a).otherwise(id_b).alias("contained_id"),
            F.when(n_a <= n_b, id_b).otherwise(id_a).alias("container_id"),
            F.round(cont, 4).alias("containment"),
        )
    )


def _x56_collapsed(spark, sf, d) -> "DataFrame":
    groups = _text_groups(d)  # (rep, members, text)
    reps = groups.select(
        F.col("rep").alias("doc_id"), "text", F.size("members").alias("m")
    )
    ex = _shingle_rows(
        spark, sf, distinct=True, docs=reps.select("doc_id", "text"), hashed=True
    ).join(reps.select(F.col("doc_id"), "m"), "doc_id")
    packed = ex.select(
        "sh",
        (F.shiftleft(F.col("doc_id"), 25) + F.col("n_sh")).alias("dn"),
        "m",
    )
    # cap on the multiplicity-weighted total == the RAW posting length
    buckets = (
        packed.groupBy("sh")
        .agg(
            F.array_sort(F.collect_list("dn")).alias("ds"),
            F.sum("m").alias("total"),
        )
        .filter((F.col("total") > 1) & (F.col("total") <= 64))
    )
    # cross-REP pair commons (distinct reps only; same-text handled below)
    pairs = buckets.filter(F.size("ds") > 1).select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(ds) - 1),"
                " i -> transform(slice(ds, i + 1, size(ds) - i),"
                " y -> struct(ds[i-1] AS a, y AS b))))"
            )
        ).alias("p")
    )
    counts = pairs.groupBy("p.a", "p.b").agg(F.count("*").alias("common"))
    rep_pairs = _x56_score(counts)
    # expand cross pairs: every member inherits its rep's size, so the
    # contained/container assignment per member pair equals the direct
    # path's (ties on size resolve to the smaller id, as the packed
    # sort does)
    mem = groups.select("rep", "members")
    sizes = ex.select(
        F.col("doc_id").alias("rep"), F.col("n_sh").alias("nsh")
    ).distinct()
    cr = (
        rep_pairs.join(
            mem.select(F.col("rep").alias("contained_id"), F.col("members").alias("ma")),
            "contained_id",
        )
        .join(
            mem.select(F.col("rep").alias("container_id"), F.col("members").alias("mb")),
            "container_id",
        )
        .join(
            sizes.select(F.col("rep").alias("contained_id"), F.col("nsh").alias("n1")),
            "contained_id",
        )
        .join(
            sizes.select(F.col("rep").alias("container_id"), F.col("nsh").alias("n2")),
            "container_id",
        )
        .select(F.explode("ma").alias("x"), "mb", "containment", "n1", "n2")
        .select("x", F.explode("mb").alias("y"), "containment", "n1", "n2")
        .select(
            F.when(F.col("n1") < F.col("n2"), F.col("x"))
            .when(F.col("n1") > F.col("n2"), F.col("y"))
            .otherwise(F.least("x", "y"))
            .alias("contained_id"),
            F.when(F.col("n1") < F.col("n2"), F.col("y"))
            .when(F.col("n1") > F.col("n2"), F.col("x"))
            .otherwise(F.greatest("x", "y"))
            .alias("container_id"),
            "containment",
        )
    )
    # same-text member pairs: common = the text's count of shingles in
    # KEPT buckets (boilerplate-capped shingles support nothing, same
    # as the direct path); containment = kept / n_sh
    kept = (
        buckets.select(F.explode("ds").alias("dn"))
        .groupBy("dn")
        .agg(F.count("*").alias("kept"))
    )
    wi = (
        groups.filter(F.size("members") > 1)
        .join(
            packed.select("dn", F.shiftright(F.col("dn"), 25).alias("rep")).distinct(),
            "rep",
        )
        .join(kept, "dn", "left")
        .select(
            "members",
            (
                F.coalesce("kept", F.lit(0)).cast("double")
                / F.col("dn").bitwiseAND(F.lit(_PACK_MASK)).cast("double")
            ).alias("containment"),
            F.col("dn").bitwiseAND(F.lit(_PACK_MASK)).alias("nsh"),
        )
        .filter((F.col("nsh") >= 5) & (F.col("containment") >= 0.9))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(members) - 1),"
                    " i -> transform(slice(members, i + 1, size(members) - i),"
                    " y -> struct(members[i-1] AS x, y AS y))))"
                )
            ).alias("p"),
            F.round("containment", 4).alias("containment"),
        )
        .select(
            F.least("p.x", "p.y").alias("contained_id"),
            F.greatest("p.x", "p.y").alias("container_id"),
            "containment",
        )
    )
    return cr.unionByName(wi)


@query(
    "x57_temperature_sample",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok,
             ('0x' || substring(md5('temp42|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
               / 65536.0 AS frac
      FROM documents
    ),
    lang_stats AS (
      SELECT lang, CAST(SUM(n_tok) AS DOUBLE) AS t FROM tok GROUP BY lang
    ),
    probs AS (
      SELECT lang, t,
             (sqrt(t) / SUM(sqrt(t)) OVER ()) / (t / SUM(t) OVER ()) AS r
      FROM lang_stats
    ),
    norm AS (SELECT lang, r / MAX(r) OVER () AS p FROM probs),
    kept AS (
      SELECT tok.lang, tok.n_tok, n.p
      FROM tok JOIN norm n ON n.lang = tok.lang
      WHERE tok.frac < n.p
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_kept,
           ROUND(ANY_VALUE(p), 6) AS accept_p
    FROM kept GROUP BY lang
    """,
)
def x57_temperature_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based multilingual rebalancing (the XLM-R / mBERT
    sampling rule, alpha = 0.5): high-resource languages down-sample
    toward sqrt-of-share targets so low-resource languages keep
    representation.  Per-language acceptance p_l =
    (sqrt-share / natural-share), normalized so the most
    over-corrected language accepts 100%; per-document decisions are
    the deterministic salted-hash threshold (same discipline as
    x35/x53 — shard-independent, reproducible, no RNG state).

    Exactness across engines: p_l derives from integer token counts
    through the same IEEE expressions (sqrt / division / window sums)
    on both sides, so the per-doc threshold comparisons agree; the
    md5 fraction is a 16-bit lattice, making a tie against the
    irrational p_l practically impossible.  Plan: one scan pass for
    per-doc tokens, one tiny per-lang aggregate joined back broadcast
    — the corpus crosses a single exchange."""
    from pyspark.sql import Window as W

    d = load(spark, sf, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("temp42|"), F.col("doc_id").cast("string"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("double")
            / 65536.0
        ).alias("frac"),
    )
    stats = tok.groupBy("lang").agg(F.sum("n_tok").cast("double").alias("t"))
    wall = W.partitionBy()
    probs = stats.select(
        "lang",
        (
            (F.sqrt("t") / F.sum(F.sqrt("t")).over(wall))
            / (F.col("t") / F.sum("t").over(wall))
        ).alias("r"),
    )
    norm = probs.select("lang", (F.col("r") / F.max("r").over(wall)).alias("p"))
    kept = tok.join(F.broadcast(norm), "lang").filter(F.col("frac") < F.col("p"))
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_tok").cast("bigint").alias("tokens_kept"),
        F.round(F.any_value("p"), 6).alias("accept_p"),
    )


@query(
    "x58_rrf_fusion",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id < 4
    ),
    scored AS (
      SELECT q.query_id, e.vec_id,
             {_SQL_DOT.format(a='e.embedding', b='q.qv')}
             / (sqrt({_SQL_DOT.format(a='e.embedding', b='e.embedding')})
                * sqrt({_SQL_DOT.format(a='q.qv', b='q.qv')})) AS cos,
             list_sum(list_transform(range(1, 65),
               i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))
                    * (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE)))) AS l2sq
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ROUND(cos, 6) DESC, vec_id) AS r_cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ROUND(l2sq, 6) ASC, vec_id) AS r_l2
      FROM scored
    ),
    fused AS (
      SELECT query_id, vec_id, r_cos, r_l2,
             1.0 / (60 + r_cos) + 1.0 / (60 + r_l2) AS rrf
      FROM ranked
    )
    SELECT query_id, vec_id, r_cos, r_l2, ROUND(rrf, 6) AS rrf_score
    FROM fused
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY ROUND(rrf, 9) DESC, vec_id) <= 3
    ORDER BY query_id, rrf_score DESC, vec_id
    """,
)
def x58_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrievers (Cormack et al.,
    SIGIR'09 — the standard way to merge lexical+vector or multi-model
    retrieval in a training-data search stack): per query, rank
    candidates under cosine AND under L2 distance, fuse with
    RRF(k=60) = Σ 1/(k+rank_i), keep the fused top-3.

    Shape: the 4-row query set broadcasts into the scoring cross join
    (JVM higher-order dot products, no Python); BOTH rank windows and
    the final top-3 share ONE partitioning on query_id, so the whole
    fusion costs a single exchange.  Scale note: a per-query global
    rank serializes each query's candidates through one task — at
    100 TB you first cut to per-partition top-200 (TakeOrdered per map
    task, the x50 two-stage pattern) and fuse the survivors; the
    fusion algebra is unchanged.  Ranks are integers, so fusion scores
    are EXACT — ties broken by vec_id on both engines."""
    from pyspark.sql import Window as W

    e = load(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("embedding"), F.col("qv"))
                / (
                    F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(_dot(F.col("qv"), F.col("qv")))
                )
            ).alias("cos"),
            F.aggregate(
                F.zip_with(
                    "embedding",
                    "qv",
                    lambda a, b: (a.cast("double") - b.cast("double"))
                    * (a.cast("double") - b.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("l2sq"),
        )
    )
    wq = W.partitionBy("query_id")
    ranked = scored.select(
        "query_id",
        "vec_id",
        F.row_number()
        .over(wq.orderBy(F.round("cos", 6).desc(), F.asc("vec_id")))
        .cast("long")  # DuckDB ROW_NUMBER is BIGINT — align the schema
        .alias("r_cos"),
        F.row_number()
        .over(wq.orderBy(F.round("l2sq", 6).asc(), F.asc("vec_id")))
        .cast("long")
        .alias("r_l2"),
    )
    fused = ranked.withColumn(
        "rrf", 1.0 / (60 + F.col("r_cos")) + 1.0 / (60 + F.col("r_l2"))
    )
    top = fused.withColumn(
        "_rn",
        F.row_number().over(wq.orderBy(F.round("rrf", 9).desc(), F.asc("vec_id"))),
    ).filter(F.col("_rn") <= 3)
    return top.select(
        "query_id",
        "vec_id",
        "r_cos",
        "r_l2",
        F.round("rrf", 6).alias("rrf_score"),
    ).orderBy("query_id", F.desc("rrf_score"), "vec_id")


@query(
    "x59_adaptive_quality_filter",
    oracle="""
    WITH scored AS (
      SELECT source,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS score
      FROM documents
    ),
    thr AS (
      SELECT source, quantile_cont(score, 0.25) AS p25
      FROM scored GROUP BY source
    )
    SELECT s.source,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN ROUND(s.score, 9) >= ROUND(t.p25, 9)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(t.p25, 6) AS p25_threshold
    FROM scored s JOIN thr t USING (source)
    GROUP BY s.source, t.p25
    ORDER BY s.source
    """,
)
def x59_adaptive_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Per-SOURCE adaptive quality thresholding (the data-mixing
    refinement of a static filter like x26): each source keeps only
    docs at or above its OWN 25th-percentile lexical-diversity score,
    so a clean source isn't over-pruned by a threshold tuned for a
    noisy one and a noisy source can't flood the mix just because the
    global bar is low.

    Shape: one codegen'd scan computes the score (array higher-order
    functions, no Python); the per-source percentile aggregates over
    FEW groups and the thresholds broadcast back into the keep-count
    join, so the corpus is scanned exactly twice and shuffled only by
    the low-cardinality source key.  Exact interpolated percentile
    here because the DuckDB oracle must match bit-for-bit(ish);
    at 100 TB swap in approx_percentile(score, 0.25, 10000) — the
    broadcast-back shape is identical."""
    d = load(spark, sf, "documents").withColumn("w", F.split("text", " "))
    scored = d.select(
        "source",
        (
            F.size(F.array_distinct("w")).cast("double") / F.size("w")
        ).alias("score"),
    )
    thr = scored.groupBy("source").agg(
        F.expr("percentile(score, 0.25)").alias("p25")
    )
    return (
        scored.join(F.broadcast(thr), "source")
        .groupBy("source", "p25")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(
                F.when(
                    F.round("score", 9) >= F.round("p25", 9), 1
                ).otherwise(0)
            ).alias("n_kept"),
        )
        .select(
            "source",
            "n_total",
            "n_kept",
            F.round("p25", 6).alias("p25_threshold"),
        )
        .orderBy("source")
    )


# --- BM25 retrieval ----------------------------------------------------------

#: fixed query terms for the oracle-deterministic BM25 demo (the
#: fixture vocabulary is a small closed set; any real deployment
#: parameterizes these)
_BM25_TERMS = ("merge", "stream", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "x60_bm25_topk",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    dl AS (SELECT doc_id, len(w) AS dl FROM d),
    stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
    toks AS (SELECT doc_id, unnest(w) AS term FROM d),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('merge', 'stream', 'window')
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT t.doc_id,
             SUM(ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
                 * (CAST(t.tf AS DOUBLE) * {_BM25_K1 + 1})
                 / (t.tf + {_BM25_K1}
                    * (1 - {_BM25_B} + {_BM25_B} * l.dl / s.avgdl))) AS score
      FROM tf t JOIN dfreq f USING (term) JOIN dl l USING (doc_id)
      CROSS JOIN stats s
      GROUP BY 1
    )
    SELECT doc_id, ROUND(score, 4) AS bm25
    FROM scored
    ORDER BY ROUND(score, 6) DESC, doc_id
    LIMIT 20
    """,
)
def x60_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 top-k retrieval over the corpus (Robertson–Spärck Jones
    idf, k1=1.2 b=0.75) — the targeted-curation primitive: "pull the
    20 documents most relevant to these terms" for domain mixing,
    eval-set construction, or contamination review.

    Plan, built for the 100 TB case: document lengths come from ONE
    narrow scan (size(split) — no explode), the explode is filtered to
    the QUERY'S terms before any shuffle so only matching postings
    move (work ∝ postings of |Q| terms, not corpus tokens), document
    frequencies and the (N, avgdl) scalars broadcast back, and the
    finish is TakeOrderedAndProject — no global sort.  Ordering ties
    are cut on (round(score, 6), doc_id) so the LIMIT boundary is
    engine-stable."""
    d = (
        load(spark, sf, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .withColumn("dl", F.size("w"))
    )
    stats = d.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
    tf = (
        d.select("doc_id", "dl", F.explode("w").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    w = (
        idf
        * (F.col("tf").cast("double") * (_BM25_K1 + 1))
        / (
            F.col("tf")
            + _BM25_K1
            * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(w).alias("score"))
        .orderBy(F.round("score", 6).desc(), F.asc("doc_id"))
        .select("doc_id", F.round("score", 4).alias("bm25"))
        .limit(20)
    )
