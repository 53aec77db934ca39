"""Streaming distribution-drift monitor — streaming twin of ``q_dist_drift``.

Reuses the HDR register index of ``streaming/quantile.py`` verbatim —
the same foreachBatch callback, the same ``(g, idx, cnt)``
sum-mergeable registers over the ``functions/hdr.py`` buckets — so ONE
register stream serves live quantiles AND drift monitoring; this module
adds only reads.

The batch query contrasts the first and second halves of the date range
retrospectively. The streaming form contrasts the LIVE registers
against a persisted REFERENCE snapshot (the production drift-gate
shape: "has the ingest distribution moved since the last blessed
crawl?"). Because register counts are sums — an abelian group — the
"everything since the snapshot" histogram is exact register
SUBTRACTION, live minus reference: no per-period indexes, no replay of
history, and the subtraction is correct across compaction because the
fold preserves sums. :func:`drift_since` therefore reproduces
``q_dist_drift`` BIT-FOR-BIT when the snapshot is taken at the batch
query's date-midpoint split (pinned in tests/test_stream_drift.py) —
the same integer total-variation arithmetic, ppm-floored per-bucket
proportions, never a float.

Scale posture: the reference is ≤ |groups| × ~2k rows (one file); the
drift read is one broadcast-joinable frame against the live registers —
both sides histogram-sized regardless of stream length.

The reference never maintained cross-batch aggregates (its DStream
counters reset per batch); capability extension (SURVEY.md §2
LLM-pipeline track).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkstreamingflume_spark.streaming.neardup import _read_index
from sparkstreamingflume_spark.streaming.quantile import read_registers

REF_SCHEMA = "g string, idx long, cnt long"


def snapshot_reference(
    spark: SparkSession, index_dir: str, ref_dir: str
) -> int:
    """Persist the CURRENT merged registers as the drift reference.

    Returns the number of reference rows. Overwrites any previous
    snapshot (the gate compares against one blessed state at a time;
    keep dated dirs for history).
    """
    regs = read_registers(spark, index_dir).select("g", "idx", "cnt")
    # histogram-sized (<= |groups| * ~2k rows) — one file
    regs.repartition(1).write.mode("overwrite").parquet(ref_dir)
    return spark.read.schema(REF_SCHEMA).parquet(ref_dir).count()


def drift_since(
    spark: SparkSession, index_dir: str, ref_dir: str
) -> DataFrame:
    """Per-group TV distance (integer ppm) between the reference
    histogram (period a) and everything ingested SINCE it (period b =
    live registers minus reference — exact, because counts are sums).

    Output ``(g, n_a, n_b, tv_ppm)`` with q_dist_drift's exact integer
    arithmetic: per-bucket proportions floored to ppm, L1-summed,
    halved; groups missing either period are dropped (the batch
    HAVING). Registers only grow, so live - reference is never
    negative; a group/bucket absent from one side counts 0 there.
    """
    live = read_registers(spark, index_dir).select("g", "idx", "cnt")
    ref = _read_index(spark, ref_dir, REF_SCHEMA)
    joined = live.alias("l").join(
        ref.alias("r"),
        (F.col("l.g").eqNullSafe(F.col("r.g")))
        & (F.col("l.idx") == F.col("r.idx")),
        "full_outer",
    ).select(
        F.coalesce(F.col("l.g"), F.col("r.g")).alias("g"),
        F.coalesce(F.col("l.idx"), F.col("r.idx")).alias("idx"),
        F.coalesce(F.col("r.cnt"), F.lit(0)).alias("ca"),
        (
            F.coalesce(F.col("l.cnt"), F.lit(0))
            - F.coalesce(F.col("r.cnt"), F.lit(0))
        ).alias("cb"),
    )
    w = Window.partitionBy("g")
    t = joined.withColumn("na", F.sum("ca").over(w)).withColumn(
        "nb", F.sum("cb").over(w)
    )
    return (
        t.groupBy("g")
        .agg(
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
            F.expr(
                "CAST(sum(CASE WHEN na > 0 AND nb > 0"
                " THEN abs(ca * 1000000 DIV na - cb * 1000000 DIV nb)"
                " ELSE 0 END) DIV 2 AS BIGINT)"
            ).alias("tv_ppm"),
        )
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )
