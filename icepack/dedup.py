"""Duplicate-cluster assignment: connected components over a candidate
-pair graph (the step after MinHash/LSH blocking in a dedup pipeline —
pairs alone don't dedup; clusters pick one survivor per group).

``connected_components`` is iterative min-label propagation expressed
as DataFrame joins: each round every vertex takes the minimum label
among itself and its neighbors; convergence in O(component diameter)
rounds (LSH candidate graphs are short-diameter by construction).
Each round is one join + one aggregation — fully distributed, no
driver-side graph.  This is the standard "large-star/small-star"-lite
formulation; the full Kiveris et al. variant drops in if diameters
ever get long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 15
) -> DataFrame:
    """(id, cluster) for every vertex in ``edges``; cluster = minimum
    vertex id reachable in the undirected graph.

    Deterministic: labels are ids, propagation is min().  Raises if the
    graph hasn't converged after ``max_iter`` rounds (diameter bound
    exceeded) rather than returning wrong clusters.
    """
    both = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    both = both.distinct().cache()
    labels = both.select(F.col("s").alias("id")).distinct().withColumn(
        "label", F.col("id")
    ).cache()
    try:
        for _ in range(max_iter):
            msgs = both.join(labels, both.s == labels.id).select(
                F.col("d").alias("id"), F.col("label")
            )
            new_labels = (
                labels.select("id", "label")
                .unionByName(msgs)
                .groupBy("id")
                .agg(F.min("label").alias("label"))
                .cache()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                return labels.select(F.col("id"), F.col("label").alias("cluster"))
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    finally:
        both.unpersist()
