"""Incrementally-maintained materialized rollup: an update-mode streaming
aggregation upserted into a partitioned parquet MV via dynamic partition
overwrite must (a) equal the batch aggregate after a drain, (b) absorb
late-arriving files on a checkpoint-resumed run by rewriting only the
affected day partitions, and (c) never double-count on replay."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sparkstreamingflume_spark.streaming import sinks
import pytest

# Driver-budget profile (pytest.ini): stream-twin/soak/sweep file —
# excluded from the default selection, always run by tools/run_shards.sh.
pytestmark = pytest.mark.slow

SCHEMA = "user_id long, ts timestamp, value double"


def _batch_rollup(spark, src):
    return (
        spark.read.parquet(src)
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )


def _stream_rollup(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .withWatermark("ts", "1 day")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )


def _drain(spark, src, mv, ckpt):
    q = (
        _stream_rollup(spark, src)
        .writeStream.queryName("t_mv")
        .outputMode("update")
        .foreachBatch(lambda b, _id: sinks.upsert_rollup(b, mv))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _mv_content(spark, mv):
    # partition-column type inference reads day= back as a date — compare
    # on the ISO string form
    return {
        str(r["day"]): (r["n"], r["cents"])
        for r in spark.read.parquet(mv).collect()
    }


def test_rollup_mv_incremental_maintenance(spark, tmp_path):
    src, mv, ckpt = (str(tmp_path / p) for p in ("src", "mv", "ckpt"))

    def rows(day, n, base):
        return [
            (u, datetime(2024, 1, day, 8 + u % 10, 0, 0), base + u)
            for u in range(n)
        ]

    spark.createDataFrame(rows(1, 20, 1.5) + rows(2, 10, 2.5), SCHEMA).coalesce(
        1
    ).write.parquet(src)
    _drain(spark, src, mv, ckpt)
    assert _mv_content(spark, mv) == {
        r["day"]: (r["n"], r["cents"])
        for r in _batch_rollup(spark, src).collect()
    }

    # late file: more day-2 rows + a new day-3 — resumed run must update
    # day 2 in place (not double-count), create day 3, leave day 1 alone
    day1_before = _mv_content(spark, mv)["2024-01-01"]
    spark.createDataFrame(rows(2, 5, 9.5) + rows(3, 7, 3.5), SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)
    _drain(spark, src, mv, ckpt)

    got = _mv_content(spark, mv)
    want = {
        r["day"]: (r["n"], r["cents"])
        for r in _batch_rollup(spark, src).collect()
    }
    assert got == want
    assert got["2024-01-01"] == day1_before
    assert got["2024-01-02"][0] == 15 and got["2024-01-03"][0] == 7
