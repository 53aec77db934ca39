"""W2/W3 — event-time windowed counts with watermark, streamed vs batch."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sparkstreamingflume_spark.streaming.sinks import windowed_counts


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    rows = []
    for m in range(30):  # 10:00..10:29, two per minute
        rows.append((m, f"2024-01-01 10:{m:02d}:00"))
        rows.append((100 + m, f"2024-01-01 10:{m:02d}:30"))
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.json").write_text(
        "\n".join(json.dumps({"event_id": i, "ts": ts}) for i, ts in rows) + "\n"
    )

    schema = "event_id LONG, ts STRING"

    def prep(df):
        return df.withColumn("ts", F.to_timestamp("ts"))

    stream = prep(spark.readStream.schema(schema).json(str(landing)))
    q = (
        windowed_counts(stream, window="10 minutes", watermark="5 minutes")
        .writeStream.format("memory")
        .queryName("t_win")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r.start), str(r.end)): r.n
        for r in spark.sql("SELECT * FROM t_win").collect()
    }

    batch = prep(spark.read.schema(schema).json(str(landing)))
    expect = {
        (str(r.w.start), str(r.w.end)): r.n
        for r in batch.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # append mode only emits windows the watermark has closed; every
    # emitted window must match the batch result exactly, and the closed
    # prefix must be non-empty (20:00-10:10 etc. are final)
    assert got
    for k, v in got.items():
        assert expect[k] == v
    # at minimum, all windows strictly before (max_ts - watermark) closed
    assert len(got) >= 2


def test_sliding_window_overlap(spark, tmp_path):
    """W2 sliding semantics: each event lands in window_len/slide windows."""
    rows = [(1, "2024-01-01 10:07:00")]
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.json").write_text(
        "\n".join(json.dumps({"event_id": i, "ts": ts}) for i, ts in rows) + "\n"
    )
    schema = "event_id LONG, ts STRING"
    batch = (
        spark.read.schema(schema)
        .json(str(landing))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    wins = (
        batch.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .count()
        .collect()
    )
    assert len(wins) == 2  # 10:00-10:10 and 10:05-10:15
