"""Streaming transition deltas vs the batch q_event_transitions definition."""

from __future__ import annotations

import json

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sparkstreamingflume_spark.plans import REGISTRY
from sparkstreamingflume_spark.streaming.stateful import transition_counts
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
    out = transition_counts(stream, id_col="event_id", **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def _matrix(rows):
    m = {}
    for r in rows:
        k = (r.type_from, r.type_to)
        m[k] = m.get(k, 0) + r.delta
    return {k: v for k, v in m.items() if v != 0}


def test_transitions_first_event_and_nulls(spark, tmp_path):
    rows = [
        # user 1: view->click->click; first event emits nothing
        (1, "2024-01-01 10:00:00", 1, "view"),
        (1, "2024-01-01 10:05:00", 2, "click"),
        (1, "2024-01-01 10:10:00", 3, "click"),
        # user 2: NULL-typed predecessor KEEPS its transition row
        (2, "2024-01-01 09:00:00", 4, None),
        (2, "2024-01-01 09:05:00", 5, "view"),
        # NULL-ts row is dropped on both twins
        (2, None, 6, "view"),
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    _write(landing / "a.json", rows)
    got = _run(spark, landing, tmp_path, "t_tr_basic")
    assert _matrix(got) == {
        ("view", "click"): 1,
        ("click", "click"): 1,
        (None, "view"): 1,
    }


def test_transitions_state_bridges_batches(spark, tmp_path):
    """The last event's type persists so the next batch's first event
    pairs with it; per-(pair, batch) rows are pre-summed."""
    landing = tmp_path / "landing"
    landing.mkdir()
    _write(
        landing / "a.json",
        [
            (7, "2024-01-01 10:00:00", 1, "view"),
            (7, "2024-01-01 10:05:00", 2, "view"),
        ],
    )
    _write(
        landing / "b.json",
        [(7, "2024-01-01 10:10:00", 3, "purchase")],
    )
    got = _run(
        spark, landing, tmp_path, "t_tr_bridge", files_per_trigger=1
    )
    assert _matrix(got) == {
        ("view", "view"): 1,
        ("view", "purchase"): 1,
    }
    # pre-summed: one row per (user, pair, batch)
    assert len(got) == 2


def test_transitions_stream_matches_batch(spark, tmp_path):
    """The sf0.001 events fixture, fed in per-user-contiguous time order
    (the in-order-arrival contract the twin documents), folds to
    q_event_transitions' matrix exactly."""
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
    # in-order per user across batch boundaries: sort by (ts, event_id)
    # then split — each user's events arrive time-ordered across batches
    rows.sort(
        key=lambda r: (r[1] is None, r[1] or "", r[2])
    )
    landing = tmp_path / "landing"
    landing.mkdir()
    third = (len(rows) + 2) // 3
    for i in range(3):
        _write(landing / f"part{i}.json", rows[i * third : (i + 1) * third])
    got = _run(
        spark, landing, tmp_path, "t_tr_parity", files_per_trigger=1
    )
    batch = {
        (r.type_from, r.type_to): r.n_transitions
        for r in REGISTRY["q_event_transitions"]
        .build(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert _matrix(got) == batch
