"""Streaming SCD2 regime tracker vs the batch q_scd2_history definition."""

from __future__ import annotations

import json
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from sparkstreamingflume_spark.plans import REGISTRY
from sparkstreamingflume_spark.streaming.stateful import regime_history
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


def _stream(spark, landing):
    return (
        spark.readStream.schema(SCHEMA)
        .json(str(landing))
        .withColumn("ts", F.to_timestamp("ts"))
    )


def _run(spark, landing, tmp_path, name, **kw):
    out = regime_history(
        _stream(spark, landing), id_col="event_id", emit_open=True, **kw
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_regimes_close_on_type_change(spark, tmp_path):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view"),
        (1, "2024-01-01 10:05:00", 2, "view"),
        (1, "2024-01-01 10:10:00", 3, "click"),  # closes view regime
        (1, "2024-01-01 10:15:00", 4, None),  # closes click regime
        (1, "2024-01-01 10:20:00", 5, None),  # NULL extends NULL regime
        (2, "2024-01-01 09:00:00", 6, None),  # leading NULL => regime 0
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    _write(landing / "a.json", rows)
    got = _run(spark, landing, tmp_path, "t_regimes")

    u1 = sorted((r for r in got if r.user_id == 1), key=lambda r: r.regime_no)
    assert [
        (r.regime_no, r.event_type, r.n_events, r.closed) for r in u1
    ] == [(1, "view", 2, True), (2, "click", 1, True), (3, None, 2, False)]
    # interval-close semantics: valid_to == successor's valid_from
    assert u1[0].valid_to_us == u1[1].valid_from_us
    assert u1[1].valid_to_us == u1[2].valid_from_us
    assert u1[2].valid_to_us is None
    # a user whose FIRST events are NULL-typed starts at regime 0,
    # mirroring the batch cumulative-flag numbering
    u2 = [r for r in got if r.user_id == 2]
    assert [(r.regime_no, r.event_type, r.closed) for r in u2] == [
        (0, None, False)
    ]


def test_regime_state_carries_across_batches(spark, tmp_path):
    """A later micro-batch extends the open regime (state carried), and
    a type change in that batch closes it with regime_no continuity."""
    landing = tmp_path / "landing"
    landing.mkdir()
    _write(landing / "a.json", [(7, "2024-01-01 10:00:00", 1, "view")])
    _write(
        landing / "b.json",
        [
            (7, "2024-01-01 10:05:00", 2, "view"),
            (7, "2024-01-01 10:10:00", 3, "click"),
        ],
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .json(str(landing))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = regime_history(stream, id_col="event_id", emit_open=True)
    q = (
        out.writeStream.format("memory")
        .queryName("t_carry")
        .option("checkpointLocation", str(tmp_path / "ckpt_carry"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM t_carry WHERE user_id = 7").collect()
    closed = [r for r in got if r.closed]
    # the view regime spans both batches: opened at n=1, extended to
    # n=2 by carried state, closed by the click event
    assert [(r.regime_no, r.event_type, r.n_events) for r in closed] == [
        (1, "view", 2)
    ]
    opens = sorted((r for r in got if not r.closed), key=lambda r: r.n_events)
    # open snapshots: batch1 view n=1, batch2 click n=1
    assert [(r.regime_no, r.event_type, r.n_events) for r in opens] in (
        [(1, "view", 1), (2, "click", 1)],
        [(2, "click", 1), (1, "view", 1)],
    )


def test_regime_stream_matches_batch_scd2(spark, tmp_path):
    """The full sf0.001 events fixture through the stream in ONE batch
    must reproduce q_scd2_history row-for-row (closed regimes carry
    valid_to, the per-user open regime mirrors the batch NULL lead)."""
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
    got = _run(spark, landing, tmp_path, "t_scd2_parity")
    stream_set = {
        (r.user_id, r.regime_no, r.event_type, r.n_events, r.valid_from_us,
         r.valid_to_us)
        for r in got
    }
    batch = REGISTRY["q_scd2_history"].build(
        spark, "/root/testdata/sf0.001"
    ).collect()
    batch_set = {
        (r.user_id, r.regime_no, r.event_type, r.n_events, r.valid_from_us,
         r.valid_to_us)
        for r in batch
    }
    assert stream_set == batch_set
    assert len(stream_set) == len(got) == len(batch)
