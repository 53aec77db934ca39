"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` expose the declared-query registry
(sparkstreamingflume_spark/plans/*); ``entry()`` runs the flagship query
(SURVEY.md §7.4) on sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingflume_spark.plans import REGISTRY


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

    Exactly the <=50 primary registry entries (the driver certifies at
    most 50 per round). Registry extras — how-variants and strict
    subsets of primaries — stay oracle-certified by
    tests/test_oracle_extras.py and tools/validate.py.
    """
    prim = {name: q.build for name, q in REGISTRY.items() if not q.extra}
    assert len(prim) <= 50, f"{len(prim)} primary queries exceed the 50-entry gate"
    return prim


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle statement per query (omitted => rows-only check)."""
    return {
        name: q.oracle
        for name, q in REGISTRY.items()
        if q.oracle is not None and not q.extra
    }
