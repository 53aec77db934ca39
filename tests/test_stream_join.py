"""Stream-stream interval join: streamed result must equal the batch
join of the same frames (micro-batch boundaries and watermark handling
must not change the matched set when no data is late past the horizon).
"""

from __future__ import annotations

from collections import Counter
from datetime import datetime

from sparkstreamingflume_spark.streaming import sinks
from sparkstreamingflume_spark.streaming.joins import interval_join
import pytest

# Driver-budget profile (pytest.ini): stream-twin/soak/sweep file —
# excluded from the default selection, always run by tools/run_shards.sh.
pytestmark = pytest.mark.slow

SCHEMA = "user_id long, ts timestamp, event_id long"


def _rows(kind: str):
    # clicks every 3 min per user; purchases at fixed offsets so some
    # fall inside the 10-min attribution window and some outside
    base = datetime(2024, 1, 1, 10, 0, 0)

    def at(minute):
        return base.replace(minute=minute % 60, hour=10 + minute // 60)

    if kind == "click":
        return [(u, at(m), u * 100 + m) for u in (1, 2, 3) for m in (0, 3, 6, 30)]
    return [(u, at(m), 1000 + u * 10 + m) for u in (1, 2) for m in (5, 45)]


def test_stream_interval_join_equals_batch(spark, tmp_path):
    clicks_dir, buys_dir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    spark.createDataFrame(_rows("click"), SCHEMA).write.parquet(clicks_dir)
    spark.createDataFrame(_rows("buy"), SCHEMA).write.parquet(buys_dir)

    batch = Counter(
        tuple(r)
        for r in interval_join(
            spark.read.parquet(clicks_dir), spark.read.parquet(buys_dir)
        ).collect()
    )
    assert len(batch) > 0  # non-vacuous: some purchases attribute
    # and selective: not every (click, purchase) pair matches
    n_clicks, n_buys = len(_rows("click")), len(_rows("buy"))
    assert sum(batch.values()) < n_clicks * n_buys

    sc = spark.readStream.schema(SCHEMA).parquet(clicks_dir)
    sb = spark.readStream.schema(SCHEMA).parquet(buys_dir)
    joined = interval_join(sc, sb)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def sink(b, _id):
        b.write.mode("append").parquet(out)

    q = sinks.start_pipeline(joined, sink, ckpt, available_now=True, query_name="t_ssj")
    q.awaitTermination(120)

    streamed = Counter(tuple(r) for r in spark.read.parquet(out).collect())
    assert streamed == batch


def test_stream_interval_join_state_is_watermark_bounded(spark, tmp_path):
    """The physical streaming plan must carry watermarks on both sides
    and a symmetric hash join with state eviction (no unbounded state)."""
    clicks_dir, buys_dir = str(tmp_path / "c2"), str(tmp_path / "b2")
    spark.createDataFrame(_rows("click"), SCHEMA).write.parquet(clicks_dir)
    spark.createDataFrame(_rows("buy"), SCHEMA).write.parquet(buys_dir)
    sc = spark.readStream.schema(SCHEMA).parquet(clicks_dir)
    sb = spark.readStream.schema(SCHEMA).parquet(buys_dir)
    plan = interval_join(sc, sb)._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2


def test_stream_interval_left_outer_watermark_boundary(spark, tmp_path):
    """Left-outer null-matches emit only after the watermark passes a
    row's eviction point. Far-future sentinel rows appended LAST on both
    streams (the global watermark is the min across sides) advance the
    watermark past every real row, so: streamed result == batch
    left-outer MINUS the sentinel click's own row (still in state at
    stop, its no-match verdict not yet final)."""
    import time as _time
    from datetime import timedelta

    clicks_dir, buys_dir = str(tmp_path / "c3"), str(tmp_path / "b3")
    clicks = _rows("click")
    far = clicks[0][1] + timedelta(hours=50)
    click_sentinel = (9, far, 99999)
    buy_sentinel = (8, far, 88888)
    # real data first (older mtime -> processed first), sentinels last
    spark.createDataFrame(clicks, SCHEMA).coalesce(1).write.parquet(clicks_dir)
    spark.createDataFrame(_rows("buy"), SCHEMA).coalesce(1).write.parquet(buys_dir)
    _time.sleep(1.2)  # file source orders by mtime
    spark.createDataFrame([click_sentinel], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(clicks_dir)
    spark.createDataFrame([buy_sentinel], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(buys_dir)

    batch = Counter(
        tuple(r)
        for r in interval_join(
            spark.read.parquet(clicks_dir),
            spark.read.parquet(buys_dir),
            how="left_outer",
        ).collect()
    )
    n_null_batch = sum(v for k, v in batch.items() if k[-1] is None)
    assert n_null_batch > 1  # non-vacuous: real clicks without a purchase

    sc = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        clicks_dir
    )
    sb = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        buys_dir
    )
    joined = interval_join(sc, sb, how="left_outer")
    out, ckpt = str(tmp_path / "out3"), str(tmp_path / "ckpt3")

    def sink(b, _id):
        b.write.mode("append").parquet(out)

    q = sinks.start_pipeline(
        joined, sink, ckpt, available_now=True, query_name="t_ssj_outer"
    )
    q.awaitTermination(180)
    # second availableNow pass on the same checkpoint: the final watermark
    # commit evicts matured state and emits its null-matches (outer
    # emission can trail the data batch by one)
    q2 = sinks.start_pipeline(
        interval_join(
            spark.readStream.schema(SCHEMA).parquet(clicks_dir),
            spark.readStream.schema(SCHEMA).parquet(buys_dir),
            how="left_outer",
        ),
        sink,
        ckpt,
        available_now=True,
        query_name="t_ssj_outer2",
    )
    q2.awaitTermination(180)

    streamed = Counter(tuple(r) for r in spark.read.parquet(out).collect())
    expected = batch.copy()
    del expected[(9, far, 99999, None, None, None)]  # sentinel still in state
    assert streamed == expected


def test_interval_join_rejects_prefix_collision(spark):
    """An input column that already carries the l_/r_ prefix would produce
    ambiguous duplicate output names — must raise, not emit."""
    import pytest
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    # a column literally named "key" prefixes to l_key — colliding with
    # the join-key output slot (same for a stray "ts" on the right side)
    clash = base.withColumn("key", F.col("user_id"))
    with pytest.raises(ValueError, match="l_key"):
        interval_join(clash, base)
    with pytest.raises(ValueError, match="r_key"):
        interval_join(base, clash)
    # clean inputs still work
    assert interval_join(base, base).columns[0] == "l_key"
