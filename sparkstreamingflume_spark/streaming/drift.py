"""Streaming distribution-drift monitor — streaming twin of ``q_dist_drift``.

Reuses the HDR register index of ``streaming/quantile.py`` — the same
foreachBatch callback, the same sum-mergeable registers over the
``functions/hdr.py`` buckets — so ONE register stream serves live
quantiles AND drift monitoring; this module adds only reads. The two
batch contracts differ on undated events (``q_quantile_hdr`` admits
``ts IS NULL`` values; ``q_dist_drift`` filters them — an undated
event belongs to no period histogram), so the shared index carries a
``dated`` register dimension: quantile reads sum over it, drift reads
keep only ``dated`` registers. Both twins therefore mirror their batch
query exactly, including on streams containing NULL-ts events (pinned
in tests/test_stream_drift.py::test_null_ts_events_split_the_consumers).

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

from sparkstreamingflume_spark.streaming.state import (
    _hadoop_fs,
    _read_index,
)
from sparkstreamingflume_spark.streaming.quantile import read_registers

REF_SCHEMA = "g string, idx long, cnt long"


def _recover_ref(spark: SparkSession, ref_dir: str) -> None:
    """Recover a snapshot swap that crashed between the two renames —
    the compact_registers recover-first rule: an ``.old`` dir with no
    live dir is the previous snapshot, renamed back; with a live dir
    it is debris, deleted."""
    fs, _ = _hadoop_fs(spark, ref_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    jref = jvm_path(ref_dir)
    jold = jvm_path(ref_dir.rstrip("/") + ".old")
    if fs.exists(jold):
        if fs.exists(jref):
            fs.delete(jold, True)
        else:
            fs.rename(jold, jref)


def snapshot_reference(
    spark: SparkSession, index_dir: str, ref_dir: str
) -> int:
    """Persist the CURRENT merged dated registers as the drift
    reference (``q_dist_drift``'s ``ts IS NOT NULL`` contract).

    Returns the number of reference rows. Replaces any previous
    snapshot (the gate compares against one blessed state at a time;
    keep dated dirs for history) via the compact_registers swap
    protocol — write to a tmp dir, rename old aside, rename tmp in,
    recover on crash — so a concurrent :func:`drift_since` read never
    sees a partial or empty reference (round-8 ADVICE; the unsafe
    window shrinks from a full rewrite to one rename pair, and
    recovery restores the previous snapshot).
    """
    regs = read_registers(spark, index_dir, dated_only=True).select(
        "g", "idx", "cnt"
    )
    fs, _ = _hadoop_fs(spark, ref_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    jref = jvm_path(ref_dir)
    jold = jvm_path(ref_dir.rstrip("/") + ".old")
    tmp = ref_dir.rstrip("/") + ".tmp"
    jtmp = jvm_path(tmp)
    _recover_ref(spark, ref_dir)
    if fs.exists(jtmp):  # debris from a fold that crashed mid-write
        fs.delete(jtmp, True)
    # histogram-sized (<= |groups| * ~2k rows) — one file
    regs.repartition(1).write.mode("overwrite").parquet(tmp)
    if fs.exists(jref):
        fs.rename(jref, jold)
    fs.rename(jtmp, jref)
    fs.delete(jold, True)
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
    Both sides read dated registers only — an undated event belongs to
    no period histogram, exactly the batch query's filter.

    Concurrency (round-9 ADVICE): a :func:`snapshot_reference` swap
    leaves a one-rename-pair window where the live ref dir is absent
    (the previous snapshot sits at ``<ref_dir>.old``). A read landing
    in that window falls back to the ``.old`` snapshot — the
    previous blessed reference, a correct (one-snapshot-stale) answer —
    instead of reading an empty reference and silently dropping every
    group through the ``n_a > 0`` filter. Only if NEITHER dir exists
    (no snapshot was ever taken) does the read see an empty reference,
    and then it raises rather than returning a silently empty frame.
    The read is deliberately MUTATION-FREE (no recovery rename): a
    reader that "recovers" concurrently with a live writer's swap
    would race the writer's tmp→live rename; crash recovery belongs to
    the next :func:`snapshot_reference` call, which owns the dirs.
    """
    live = read_registers(spark, index_dir, dated_only=True).select(
        "g", "idx", "cnt"
    )
    fs, _ = _hadoop_fs(spark, ref_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    read_dir = ref_dir
    if not fs.exists(jvm_path(ref_dir)):
        old = ref_dir.rstrip("/") + ".old"
        if fs.exists(jvm_path(old)):
            read_dir = old  # mid-swap: previous blessed snapshot
        else:
            raise FileNotFoundError(
                f"drift reference missing: neither {ref_dir} nor {old} "
                "exists — call snapshot_reference() before drift_since()"
            )
    ref = _read_index(spark, read_dir, REF_SCHEMA)
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
