"""Metamorphic scale smoke: replicate the fixture corpus 8× (join keys
remapped per replica so replicas never cross-join) into a scratch
sf-dir and run the SAME query functions on it.  The assertions are the
invariants a correct distributed plan must keep under data growth:

- content dedup collapses replicas → the deduped census of 8× data
  equals the census of 1× data (x42);
- per-replica key remapping → TPC-H q5 revenue is exactly 8× per group;
- LSH candidate generation only gains pairs when the corpus is
  replicated (superset property, and the 8-deep buckets stress the
  in-bucket pair expansion path).

This is the "would it survive a scale-up" check run as data, not as a
plan inspection (tests/test_plans.py does the latter).
"""

import pytest
from pyspark.sql import functions as F

from icepack.io import load
from icepack.queries import all_queries

from tests.conftest import SF_DIR

QS = all_queries()
REPLICAS = 8


@pytest.fixture(scope="module")
def scaled_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf-scaled"))
    koff = 1_000_000_000

    def rep(name, keycols=()):
        df = load(spark, SF_DIR, name)
        parts = []
        for i in range(REPLICAS):
            p = df
            for k in keycols:
                p = p.withColumn(k, F.col(k) + F.lit(i * koff))
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.parquet(f"{out}/{name}.parquet")

    # dims stay 1× (broadcast sides at any SF); facts replicate with
    # remapped join keys; documents remap doc_id only (text identical
    # across replicas — that is the dedup stress)
    for name in ("region", "nation", "supplier"):
        load(spark, SF_DIR, name).write.parquet(f"{out}/{name}.parquet")
    rep("customer", ("c_custkey",))
    rep("orders", ("o_orderkey", "o_custkey"))
    rep("lineitem", ("l_orderkey",))
    rep("documents", ("doc_id",))
    return out


def test_dedup_census_invariant_under_replication(spark, scaled_dir):
    base = QS["x42_training_pipeline"](spark, SF_DIR)
    scaled = QS["x42_training_pipeline"](spark, scaled_dir)

    def totals(df):
        r = df.agg(
            F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")
        ).collect()[0]
        return (r.d, r.t)

    # exact-duplicate replicas collapse in the dedup stage, so the
    # pipeline's total output is invariant under corpus replication
    assert totals(base) == totals(scaled)


def test_q5_revenue_scales_exactly(spark, scaled_dir):
    base = {r.n_name: r.revenue for r in QS["a4_tpch_q5"](spark, SF_DIR).collect()}
    scaled = {
        r.n_name: r.revenue for r in QS["a4_tpch_q5"](spark, scaled_dir).collect()
    }
    assert set(base) == set(scaled)
    for k, v in base.items():
        # the query rounds revenue to cents; rounding the 1× sum then
        # scaling vs rounding the 8× sum can differ by 8 half-cents
        assert scaled[k] == pytest.approx(v * REPLICAS, abs=0.05)


def test_lsh_pairs_superset_under_replication(spark, scaled_dir):
    base = QS["x3_minhash_lsh"](spark, SF_DIR).count()
    scaled = QS["x3_minhash_lsh"](spark, scaled_dir).count()
    # every doc now has 8 identical copies: each base pair appears in
    # every replica, and the copies of each doc pair with each other
    n_docs_with_shingles = (
        load(spark, SF_DIR, "documents")
        .filter(F.size(F.split("text", " ")) >= 3)
        .count()
    )
    intra_copy_pairs = n_docs_with_shingles * (REPLICAS * (REPLICAS - 1) // 2)
    assert scaled >= base * REPLICAS
    assert scaled >= intra_copy_pairs
