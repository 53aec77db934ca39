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


def test_session_window_stream_matches_batch(spark, tmp_path):
    """The NATIVE session_window aggregate (q_session_window's operator)
    under readStream + watermark: closed sessions streamed in append mode
    must equal the batch session_window result, pinning that the same
    expression is the streaming sessionizer (stateful, watermark-evicted)
    that plans/relational_queries.py claims."""
    rows = []
    # user 1: two sessions (burst at 10:00-10:02, burst at 11:00-11:01)
    for m, s in ((0, 0), (1, 30), (2, 0)):
        rows.append((1, f"2024-01-01 10:0{m}:{s:02d}"))
    rows.append((1, "2024-01-01 11:00:00"))
    rows.append((1, "2024-01-01 11:01:00"))
    # user 2: one long chained session crossing the 30-min gap pairwise
    for hm in ("10:00", "10:20", "10:40"):
        rows.append((2, f"2024-01-01 {hm}:00"))
    # a late sentinel far ahead so the watermark closes everything above
    rows.append((9, "2024-01-02 09:00:00"))
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.json").write_text(
        "\n".join(
            json.dumps({"user_id": u, "ts": ts}) for u, ts in rows
        )
        + "\n"
    )
    schema = "user_id LONG, ts STRING"

    def agg(df):
        return (
            df.withColumn("ts", F.to_timestamp("ts"))
            .withWatermark("ts", "10 minutes")
            .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").cast("string").alias("session_start"),
                F.col("w.end").cast("string").alias("session_end"),
                "n_events",
            )
        )

    q = (
        agg(spark.readStream.schema(schema).json(str(landing)))
        .writeStream.format("memory")
        .queryName("t_sess_win")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in spark.sql("SELECT * FROM t_sess_win").collect()
    }

    expect = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in agg(spark.read.schema(schema).json(str(landing))).collect()
    }
    closed = {k: v for k, v in expect.items() if k[0] != 9}
    # every closed session must stream out identically: user 1 gets TWO
    # sessions (the 59-min gap splits), user 2 gets ONE merged session
    # (20-min gaps chain), proving merge-on-overlap semantics live
    for k, v in closed.items():
        assert got.get(k) == v, (k, v, got)
    assert sum(1 for k in got if k[0] == 1) == 2
    assert sum(1 for k in got if k[0] == 2) == 1
