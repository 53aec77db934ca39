"""Streaming funnel tracker vs the batch q_funnel definition."""

from __future__ import annotations

import json
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from sparkstreamingflume_spark.plans import REGISTRY
from sparkstreamingflume_spark.streaming.stateful import funnel_progress
import pytest

# Driver-budget profile (pytest.ini): stream-twin/soak/sweep file —
# excluded from the default selection, always run by tools/run_shards.sh.
pytestmark = pytest.mark.slow

SCHEMA = "user_id LONG, ts STRING, event_id LONG, event_type STRING"


def _write(path, rows):
    path.write_text(
        "\n".join(
            json.dumps(
                {"user_id": u, "ts": ts, "event_id": i, "event_type": ty}
            )
            for u, ts, i, ty in rows
        )
        + "\n"
    )


def _run(spark, landing, tmp_path, name, files_per_trigger=None, **kw):
    reader = spark.readStream.schema(SCHEMA)
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    stream = reader.json(str(landing)).withColumn("ts", F.to_timestamp("ts"))
    out = funnel_progress(stream, id_col="event_id", emit_open=True, **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_funnel_completion_and_gating(spark, tmp_path):
    rows = [
        # user 1 completes; the pre-s1 click must NOT count as stage 2
        (1, "2024-01-01 09:00:00", 1, "click"),
        (1, "2024-01-01 10:00:00", 2, "view"),
        (1, "2024-01-01 10:30:00", 3, "click"),
        (1, "2024-01-01 11:00:00", 4, "purchase"),
        # user 2 stalls at stage 2 (purchase precedes the click)
        (2, "2024-01-01 10:00:00", 5, "view"),
        (2, "2024-01-01 10:10:00", 6, "purchase"),
        (2, "2024-01-01 10:20:00", 7, "click"),
        # user 3 never enters (no view)
        (3, "2024-01-01 10:00:00", 8, "purchase"),
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    _write(landing / "a.json", rows)
    got = _run(spark, landing, tmp_path, "t_funnel")
    by_user = {r.user_id: r for r in got}
    assert set(by_user) == {1, 2}  # user 3 never entered: no row
    u1 = by_user[1]
    assert (u1.stage_reached, u1.closed) == (3, True)
    assert u1.convert_us == 3600 * 1_000_000  # 10:00 -> 11:00
    u2 = by_user[2]
    assert (u2.stage_reached, u2.closed) == (2, False)
    assert u2.s3_us is None


def test_funnel_state_carries_and_emits_once(spark, tmp_path):
    """Stage progress spans micro-batches; completion emits exactly one
    closed row even when later batches bring more qualifying events."""
    landing = tmp_path / "landing"
    landing.mkdir()
    _write(
        landing / "a.json",
        [
            (7, "2024-01-01 10:00:00", 1, "view"),
            (7, "2024-01-01 10:30:00", 2, "click"),
        ],
    )
    _write(
        landing / "b.json",
        [
            (7, "2024-01-01 11:00:00", 3, "purchase"),
            (7, "2024-01-01 11:30:00", 4, "purchase"),  # post-completion
        ],
    )
    got = _run(
        spark, landing, tmp_path, "t_funnel_carry", files_per_trigger=1
    )
    closed = [r for r in got if r.closed]
    assert [(r.stage_reached, r.s3_us is not None) for r in closed] == [
        (3, True)
    ]
    assert closed[0].convert_us == 3600 * 1_000_000  # first purchase wins
    opens = [r for r in got if not r.closed]
    assert [(r.stage_reached,) for r in opens] == [(2,)]  # batch-1 snapshot


def test_funnel_stream_matches_batch(spark, tmp_path):
    """The full sf0.001 events fixture in ONE batch reproduces q_funnel
    row-for-row (completions closed, entered-but-incomplete as open
    snapshots)."""
    ev = pq.read_table("/root/testdata/sf0.001/events.parquet")
    rows = [
        (
            r["user_id"],
            r["ts"].isoformat(sep=" "),
            r["event_id"],
            r["event_type"],
        )
        for r in ev.to_pylist()
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    _write(landing / "events.json", rows)
    got = _run(spark, landing, tmp_path, "t_funnel_parity")
    stream_set = {
        (r.user_id, r.s1_us, r.s2_us, r.s3_us, r.stage_reached, r.convert_us)
        for r in got
    }
    batch = REGISTRY["q_funnel"].build(spark, "/root/testdata/sf0.001").collect()
    batch_set = {
        (r.user_id, r.s1_us, r.s2_us, r.s3_us, r.stage_reached, r.convert_us)
        for r in batch
    }
    assert stream_set == batch_set
    assert len(stream_set) == len(got) == len(batch)
