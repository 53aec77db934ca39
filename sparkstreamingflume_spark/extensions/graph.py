"""Iterative graph operators: connected components for dedup clustering.

Near-dup pairs (MinHash/Jaccard) are edges; the dedup unit is the
connected component ("this cluster of documents is one logical doc —
keep the best one"). Components need iteration, which SQL alone can't
express — this is the engine's iterative-algorithm path, implemented the
GraphX way: label propagation to fixpoint.

Scale posture: each iteration is one broadcast-or-shuffle join + a
map-side-combinable min-aggregate. Plain min-label propagation
(:func:`connected_components`) converges in O(diameter) rounds — fine
for small-world dup graphs; :func:`connected_components_fast` adds a
pointer-doubling shortcut join per round for O(log n) convergence on
arbitrary topologies (certified path: q_dedup_clusters). Both RAISE if
the round cap is hit rather than return wrong labels. The driver holds
only the convergence counter — never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, cluster_id) with cluster_id = min node id reachable.

    Undirected: edges are symmetrized internally. Only nodes appearing in
    at least one edge are returned (isolated docs are their own cluster
    trivially — join back if needed).

    Raises ``RuntimeError`` if labels have not reached a fixpoint after
    ``max_iter`` rounds (propagation needs ~graph-diameter rounds) —
    non-converged labels are silently-wrong cluster ids, never returned.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    # Each round references labels TWICE (neighbor join + union), so the
    # logical plan would DOUBLE per iteration — exponential analysis time
    # past ~10 rounds. localCheckpoint (eager) truncates the lineage to
    # the materialized partitions each round: plans stay one-round deep.
    # (Executor-memory resident and not fault-tolerant: on a real cluster
    # with flaky executors use checkpoint() to a reliable dir instead.)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("cluster_id", F.col("node"))
        .localCheckpoint()
    )

    changed = -1
    for _ in range(max_iter):
        # every node also hears its neighbors' current labels
        candidate = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "cluster_id")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint()
        )
        changed = (
            candidate.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = candidate
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter (needs "
            "~graph-diameter rounds) or switch to pointer doubling"
        )
    return labels


def connected_components_fast(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) like :func:`connected_components`, in
    O(log n) rounds instead of O(diameter): each round takes the min of
    (a) the node's own label, (b) its neighbors' labels (propagation),
    and (c) its label's label (pointer-doubling shortcut — the
    large-star/small-star idea: labels are node ids, so they can be
    chased one hop in bulk via a labels⋈labels self-join). Propagation
    moves information one edge per round; shortcutting doubles the
    chased distance per round, so a D-diameter chain needs ~log2(D)
    rounds, not D.

    Cost per round: two joins + one min-aggregate (vs one join for the
    plain version) — the trade that wins whenever diameter >> log n,
    i.e. any graph that isn't a small-world dup cluster. Same
    convergence guard: raises rather than returning wrong labels.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("cluster_id", F.col("node"))
        .localCheckpoint()
    )

    changed = -1
    for _ in range(max_iter):
        neighbor = sym.join(labels, sym.b == labels.node).select(
            F.col("a").alias("node"), "cluster_id"
        )
        shortcut = (
            labels.alias("l1")
            .join(labels.alias("l2"), F.col("l1.cluster_id") == F.col("l2.node"))
            .select(
                F.col("l1.node").alias("node"),
                F.col("l2.cluster_id").alias("cluster_id"),
            )
        )
        candidate = (
            neighbor.unionByName(labels)
            .unionByName(shortcut)
            .groupBy("node")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint()
        )
        changed = (
            candidate.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = candidate
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components_fast did not converge in {max_iter} rounds "
            f"({changed} labels still changing)"
        )
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank: (node, pr) after ``n_iter`` synchronous
    updates of pr(n) = (1-d)/N + d * sum_{m->n} pr(m)/outdeg(m).

    Dangling mass is dropped (leaky formulation) — deterministic and
    cross-engine reproducible, which is what certification needs.
    Each iteration is one shuffle join (edges x ranks on src, combinable
    sum on dst) — the GraphX/Pregel shape; at 100 TB you pre-partition
    edges by src so every iteration reuses the same exchange, and stop
    on an L1-delta threshold instead of a fixed count.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        # empty graph (empty input day, filter dropped every edge): the
        # correct result is zero rows, not a 1/N division crash
        nodes.unpersist()
        return e.select(F.col("src").alias("node"), F.lit(0.0).alias("pr"))
    # Edges pre-joined with out-degree once. Each iteration's ranks is
    # persisted LAZILY: the planner substitutes the cached fragment, so
    # the optimizer tree stays one-iteration deep instead of growing
    # quadratically, and the single materializing action at the end
    # computes every level exactly once (no eager count per iteration —
    # that costs a blocking job each round for nothing).
    ed = e.join(e.groupBy("src").agg(F.count("*").alias("outdeg")), "src").persist()
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    intermediates = []
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks, F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("c"))
        )
        ranks = nodes.join(
            contrib, nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (F.lit(base) + damping * F.coalesce("c", F.lit(0.0))).alias("pr"),
        ).persist()
        intermediates.append(ranks)
    ranks.count()  # materialize the chain once, caching every level
    for df in intermediates[:-1]:
        df.unpersist()
    nodes.unpersist()
    ed.unpersist()
    return ranks
