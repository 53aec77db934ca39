"""Iterative graph operators: connected components for dedup clustering.

Near-dup pairs (MinHash/Jaccard) are edges; the dedup unit is the
connected component ("this cluster of documents is one logical doc —
keep the best one"). Components need iteration, which SQL alone can't
express — this is the engine's iterative-algorithm path, implemented the
GraphX way: label propagation to fixpoint.

Scale posture: each iteration is one broadcast-or-shuffle join + a
map-side-combinable min-aggregate, O(log n) iterations of Spark jobs
(small-world dup graphs converge in a handful). Labels persist across
iterations (unpersisted after); the driver holds only the convergence
counter — never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, cluster_id) with cluster_id = min node id reachable.

    Undirected: edges are symmetrized internally. Only nodes appearing in
    at least one edge are returned (isolated docs are their own cluster
    trivially — join back if needed).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "cluster_id", F.col("node")
    ).persist()
    labels.count()

    for _ in range(max_iter):
        # every node also hears its neighbors' current labels
        candidate = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "cluster_id")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .persist()
        )
        changed = (
            candidate.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels.unpersist()
        labels = candidate
        if changed == 0:
            break
    sym.unpersist()
    return labels
