"""Stateful streaming sessionizer vs the batch q_sessionize definition."""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import functions as F

from sparkstreamingflume_spark.streaming import sources
from sparkstreamingflume_spark.streaming.stateful import sessionize
import pytest

# Driver-budget profile (pytest.ini): stream-twin/soak/sweep file —
# excluded from the default selection, always run by tools/run_shards.sh.
pytestmark = pytest.mark.slow


def _write_events(path: Path, rows: list[tuple[int, str]]) -> None:
    path.write_text(
        "\n".join(json.dumps({"user_id": u, "ts": ts}) for u, ts in rows) + "\n"
    )


def test_sessionize_stream_matches_batch_sessions(spark, tmp_path):
    # two users; user 1 has two sessions split by a >30min gap
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:10:00"),
        (1, "2024-01-01 11:30:00"),  # gap 80min -> new session
        (1, "2024-01-01 11:35:00"),
        (2, "2024-01-01 09:00:00"),
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    _write_events(landing / "a.json", rows)

    schema = "user_id LONG, ts STRING"
    stream = (
        spark.readStream.schema(schema)
        .json(str(landing))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    sessions = sessionize(stream, gap_s=1800, emit_open=True)

    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM t_sessions").collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)

    # user 1: first session closed inside the batch (gap exceeded), the
    # second emitted as an open snapshot; user 2: one open session
    u1 = sorted(by_user[1], key=lambda r: r.session_start_us)
    assert [(r.n_events, r.closed) for r in u1] == [(2, True), (2, False)]
    first, second = u1
    assert second.session_start_us - first.session_end_us == 80 * 60 * 1_000_000
    u2 = by_user[2]
    assert [(r.n_events, r.closed) for r in u2] == [(1, False)]


def test_sessionize_state_carries_across_batches(spark, tmp_path):
    """Events arriving in a later micro-batch extend the open session."""
    landing = tmp_path / "landing"
    landing.mkdir()
    _write_events(landing / "a.json", [(7, "2024-01-01 10:00:00")])
    _write_events(landing / "b.json", [(7, "2024-01-01 10:05:00")])

    schema = "user_id LONG, ts STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .json(str(landing))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    sessions = sessionize(stream, gap_s=1800, emit_open=True)
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions2")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        spark.sql("SELECT * FROM t_sessions2 WHERE user_id = 7").collect(),
        key=lambda r: r.n_events,
    )
    # open-session snapshots: batch1 n=1, batch2 merged n=2 (state carried)
    assert [(r.n_events, r.closed) for r in got] == [(1, False), (2, False)]
    assert got[1].session_end_us - got[1].session_start_us == 5 * 60 * 1_000_000
