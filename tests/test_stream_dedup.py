"""Streaming dedup: stream-of-duplicates collapses to the batch answer."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T
import pytest

# Driver-budget profile (pytest.ini): stream-twin/soak/sweep file —
# excluded from the default selection, always run by tools/run_shards.sh.
pytestmark = pytest.mark.slow

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _rows(spark, tmp_path, name, rows):
    path = str(tmp_path / "landing" / name)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_stream_dedup_equals_batch(spark, tmp_path):
    from sparkstreamingflume_spark.streaming.dedup import dedup_stream

    # Two files = two micro-batches; dups within and across batches,
    # all within the 10-minute horizon.
    _rows(
        spark,
        tmp_path,
        "b0",
        [
            (1, "alpha", T0),
            (2, "beta", T0 + dt.timedelta(seconds=10)),
            (3, "alpha", T0 + dt.timedelta(seconds=20)),  # dup in-batch
        ],
    )
    _rows(
        spark,
        tmp_path,
        "b1",
        [
            (4, "beta", T0 + dt.timedelta(seconds=40)),  # dup cross-batch
            (5, "gamma", T0 + dt.timedelta(seconds=50)),
        ],
    )
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    texts = sorted(r["text"] for r in got.collect())
    assert texts == ["alpha", "beta", "gamma"]
    # first-arrival wins: the kept hash rows carry distinct md5 keys
    assert got.select("content_hash").distinct().count() == 3
