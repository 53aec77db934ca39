"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` expose the declared-query registry
(sparkstreamingflume_spark/plans/*); ``entry()`` runs the flagship query
(SURVEY.md §7.4) on sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingflume_spark.plans import window_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query — "enriched masked daily rollup" (SURVEY.md §7.4).

    events ⋈ broadcast(customer→nation dim chain) inner on the lookup key
    (reference J1, src/StreamingSocketProcess.scala:112-120 +
    src/ProcessSums.scala:422-450), user_id masked with md5 (P4,
    src/DesenPross.scala:94-115), rolled up by day × nation (W3/A1-A3).
    """
    from sparkstreamingflume_spark.session import load_table

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    dim = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).select(
        "c_custkey", "n_name"
    )
    return (
        ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey, "inner")
        .select(
            F.date_format("ts", "yyyyMMdd").alias("dt"),
            F.col("n_name").alias("nation"),
            F.md5(F.col("user_id").cast("string")).alias("masked_user"),
            F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
        )
        .groupBy("dt", "nation")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("masked_user").alias("n_users"),
            F.sum("value_cents").alias("sum_value_cents"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per certified operator (SURVEY.md §2 + §7.5 extensions).

    The driver certifies at most 50 entries per round, so the registry
    (len(REGISTRY) queries; don't hard-code the count) rotates through a
    per-round certification window (plans/registry.py CERT_WINDOW —
    round 6 certifies the six never-certified round-5 newcomers, the
    plans changed this round, the bench headliners, and the stalest
    remainder).
    Queries outside the window stay cross-engine-certified by
    tests/test_oracle_extras.py and tools/validate.py, and every query
    has a green row in some CORRECTNESS_r*.json. window_queries()
    hard-raises (survives python -O) if the window oversizes or names
    an unknown query.
    """
    return {name: q.build for name, q in window_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle statement per query (omitted => rows-only check)."""
    return {
        name: q.oracle
        for name, q in window_queries().items()
        if q.oracle is not None
    }
