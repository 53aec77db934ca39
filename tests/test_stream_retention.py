"""Streaming retention deltas vs the batch q_retention definition."""

from __future__ import annotations

import json

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sparkstreamingflume_spark.plans import REGISTRY
from sparkstreamingflume_spark.streaming.stateful import retention_progress
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
    out = retention_progress(stream, **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def _triangle(rows):
    """Fold the emitted deltas into the retention triangle."""
    tri = {}
    for r in rows:
        k = (r.cohort_day, r.offset_days)
        tri[k] = tri.get(k, 0) + r.delta
    return {k: v for k, v in tri.items() if v != 0}


def test_retention_new_days_emit_once(spark, tmp_path):
    rows = [
        # user 1: two events same day (one delta), then a later day
        (1, "2024-01-01 09:00:00", 1, "view"),
        (1, "2024-01-01 18:00:00", 2, "click"),
        (1, "2024-01-03 10:00:00", 3, "view"),
        # user 2: single day; NULL-ts row dropped on both twins
        (2, "2024-01-02 10:00:00", 4, "view"),
        (2, None, 5, "view"),
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    _write(landing / "a.json", rows)
    got = _run(spark, landing, tmp_path, "t_ret_basic")
    d1 = (19723, 0)  # 2024-01-01 days-since-epoch
    assert _triangle(got) == {
        d1: 1,
        (d1[0], 2): 1,
        (d1[0] + 1, 0): 1,
    }
    # each user's deltas are all +1 here (no retro shift)
    assert all(r.delta == 1 for r in got)


def test_retention_retracts_on_retro_cohort_shift(spark, tmp_path):
    """A late batch carrying an EARLIER day than the stored cohort must
    retract the old coordinates and re-emit against the new cohort —
    the downstream sum lands on the batch answer exactly."""
    landing = tmp_path / "landing"
    landing.mkdir()
    _write(
        landing / "a.json",
        [
            (7, "2024-01-05 10:00:00", 1, "view"),
            (7, "2024-01-07 10:00:00", 2, "view"),
        ],
    )
    _write(
        landing / "b.json",
        [(7, "2024-01-02 10:00:00", 3, "view")],  # predates the cohort
    )
    got = _run(
        spark, landing, tmp_path, "t_ret_retro", files_per_trigger=1
    )
    d2 = 19724  # 2024-01-02
    assert _triangle(got) == {(d2, 0): 1, (d2, 3): 1, (d2, 5): 1}
    # the retraction really happened: some -1 rows exist
    assert any(r.delta == -1 for r in got)


def test_retention_stream_matches_batch(spark, tmp_path):
    """The sf0.001 events fixture split across micro-batches folds to
    q_retention's triangle exactly."""
    ev = pq.read_table("/root/testdata/sf0.001/events.parquet")
    rows = [
        (
            r["user_id"],
            None if r["ts"] is None else r["ts"].isoformat(sep=" "),
            r["event_id"],
            r["event_type"],
        )
        for r in ev.to_pylist()
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    third = (len(rows) + 2) // 3
    for i in range(3):
        _write(landing / f"part{i}.json", rows[i * third : (i + 1) * third])
    got = _run(
        spark, landing, tmp_path, "t_ret_parity", files_per_trigger=1
    )
    batch = {
        (r.cohort_day, r.offset_days): r.n_active
        for r in REGISTRY["q_retention"]
        .build(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert _triangle(got) == batch
