"""foreachBatch sinks (SURVEY.md §2.7, K1/K5/K8/K9 equivalents).

Spark cannot append to a single file (K2); the contract is dir-level
append — one size-bounded file set per micro-batch under
``rec_type=<t>/dt=<d>/hr=<h>`` partitions, which is exactly what the
reference's hand-rolled buffered writers produced
(src/ProcessSums.scala:237-331) minus the driver-side state.

The FTP sink (K3/K4) with the tmp+rename commit protocol lives in
``extensions/ftp_sink.py`` — side-effecting, unit-tested, never in the
oracle path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_partitioned_text(
    batch: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("rec_type",),
    max_records_per_file: int = 100_000,
    value_col: str = "value",
) -> None:
    """K1/K5/K9 — one call per micro-batch: partitioned, size-bounded text.

    ``maxRecordsPerFile`` replaces the reference's ``cache``-records flush
    counter (src/ProcessSum1.scala:276-285); ``partitionBy`` replaces the
    5 hand-rolled per-prefix buffers (src/ProcessSums.scala:243-311).
    """
    (
        batch.select(*partition_cols, value_col)
        .write.mode("append")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .text(path)
    )


def dual_write(
    batch: DataFrame,
    primary: Callable[[DataFrame], None],
    secondary: Callable[[DataFrame], None],
) -> None:
    """K8 — every batch written to two targets. The batch frame is
    persisted once so the two writes share one computation (the reference
    re-enumerated its buffers per target, src/ProcessSum1.scala:244-324)."""
    batch.persist()
    try:
        primary(batch)
        secondary(batch)
    finally:
        batch.unpersist()


def write_batch_parquet_idempotent(batch: DataFrame, batch_id: int, path: str) -> None:
    """Exactly-once parquet sink for foreachBatch: every micro-batch
    OVERWRITES its own ``batch_id=<id>`` partition dir.

    The plain ``mode("append")`` foreachBatch sink is at-least-once under
    a mid-stream kill: a batch whose sink write committed but whose
    offset-log commit didn't is REPLAYED on checkpoint recovery and
    appends duplicates. Keying the write by batch_id makes the replay
    rewrite the same directory with the same rows — idempotent, hence
    exactly-once end-to-end (the recipe Structured Streaming documents
    for non-transactional stores). Readers union the batches via
    partition discovery on ``path``; in-flight kill debris stays in
    ``_temporary`` dirs, which Spark's file listing hides.
    Certified by tests/test_streaming.py restart-under-load."""
    batch.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")


def start_pipeline(
    stream_df: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    available_now: bool = False,
    query_name: str = "pipeline",
) -> StreamingQuery:
    """Wire a transformed stream into a foreachBatch sink with checkpoint
    recovery (W4 — ssc.checkpoint + getOrCreate,
    src/StreamingFlumeProcess.scala:75,245-248: restart with the same
    checkpoint_dir resumes from recorded offsets, exactly-once per batch).

    ``trigger_seconds`` mirrors the reference's batchInterval (W1,
    hard-coded 20 s in src/StreamingSocketProcess64.scala:83);
    ``available_now`` drains everything then stops (tests, backfills).
    """
    writer = stream_df.writeStream.queryName(query_name).foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "200 seconds",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """W2/W3 — event-time windowed counts with late-data handling.

    The reference's 200 s processing-time sliding window
    (src/StreamingSocketProcess60.scala:121) becomes an event-time window
    + watermark — deterministic under replay, which processing-time never
    was.
    """
    from pyspark.sql import functions as F

    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"))
        .agg(F.count("*").alias("n"))
        .select("w.start", "w.end", "n")
    )


def upsert_rollup(
    batch: DataFrame, path: str, partition_cols: tuple[str, ...] = ("day",)
) -> None:
    """Continuous-aggregate maintenance: merge a micro-batch of UPDATED
    rollup rows into a partitioned parquet materialized view.

    Used with an update-mode streaming aggregation: each batch's rows
    are complete current totals for the groups they touch (the state
    store holds the running aggregate), so overwriting exactly the
    affected partitions — dynamic partitionOverwriteMode — replaces
    stale totals and leaves untouched partitions alone. Idempotent per
    batch: replaying a batch rewrites the same partitions with the same
    totals, so checkpoint-recovery duplicates are harmless (the K2
    dir-append contract would double-count; an upsert must not).

    The partition columns must functionally determine the aggregation
    group (here: one group per partition value set) — the overwrite
    unit is the partition directory. At 100 TB the same pattern runs
    per (day, hour) with the hour grain feeding coarser grains
    (q_time_rollup) and sketch columns (q_sketch_rollup) keeping
    distinct counts mergeable.
    """
    # Per-write option, NOT a session-conf toggle: mutating the session
    # conf around the write would leak dynamic-overwrite semantics into
    # any concurrent query sharing the SparkSession (or race with a
    # second upsert stream's save/restore).
    (
        batch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
