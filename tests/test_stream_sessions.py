"""Streaming sessionization twin (streaming/sessions.py) vs the batch
q_session_window definition, on the FULL sf0.001 events fixture with
NULL-ts rows injected — the round-9 symmetry closure: every stateful
analytics shape (funnel, SCD2, retention, transitions, sessions) now
has a streaming form pinned stream≡batch under the NULL-ts contract.
"""

from __future__ import annotations

import json

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sparkstreamingflume_spark.plans import REGISTRY
from sparkstreamingflume_spark.streaming.sessions import session_windows
import pytest

# Driver-budget profile (pytest.ini): stream-twin/soak/sweep file —
# excluded from the default selection, always run by tools/run_shards.sh.
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"
SENTINEL_USER = 999_999_999


def _landing(tmp_path):
    """The fixture's events as json lines, plus NULL-ts rows (the
    contract under test: they join no session on either twin) and one
    far-future sentinel whose watermark closes every fixture session."""
    ev = pq.read_table(f"{SF}/events.parquet").to_pylist()
    rows = [
        {
            "user_id": r["user_id"],
            "ts": None if r["ts"] is None else r["ts"].isoformat(sep=" "),
        }
        for r in ev
    ]
    # valued-but-undated rows: must be invisible to sessionization
    rows += [{"user_id": r["user_id"], "ts": None} for r in ev[:17]]
    rows.append({"user_id": SENTINEL_USER, "ts": "2030-01-01 00:00:00"})
    landing = tmp_path / "landing"
    landing.mkdir()
    # two files so sessions span micro-batches (maxFilesPerTrigger=1)
    half = (len(rows) + 1) // 2
    for i in range(2):
        (landing / f"p{i}.json").write_text(
            "\n".join(json.dumps(r) for r in rows[i * half : (i + 1) * half])
            + "\n"
        )
    return landing


def test_stream_sessions_match_batch_under_null_ts(spark, tmp_path):
    landing = _landing(tmp_path)
    stream = (
        spark.readStream.schema("user_id LONG, ts STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        session_windows(stream)
        .writeStream.format("memory")
        .queryName("t_stream_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in spark.sql("SELECT * FROM t_stream_sessions").collect()
        if r.user_id != SENTINEL_USER
    }
    want = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in REGISTRY["q_session_window"].build(spark, SF).collect()
    }
    assert got == want
