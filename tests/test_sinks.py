"""K1/K5/K8/K9 sink-layout tests + W5 concurrent queries."""

from __future__ import annotations

from collections import Counter
from pathlib import Path

from pyspark.sql import functions as F

from sparkstreamingflume_spark.streaming import pipeline, sinks, sources
import pytest

# Driver-budget profile (pytest.ini): stream-twin/soak/sweep file —
# excluded from the default selection, always run by tools/run_shards.sh.
pytestmark = pytest.mark.slow


def _lines_df(spark, n=50):
    return spark.createDataFrame(
        [(f"6{i % 2}payload{i}",) for i in range(n)], ["value"]
    )


def test_partitioned_text_layout(spark, tmp_path):
    """K1/K9 — rec_type=... dirs replace the reference's per-prefix buffers."""
    out = str(tmp_path / "out")
    batch = pipeline.route(_lines_df(spark))
    sinks.write_partitioned_text(batch, out, partition_cols=("rec_type",))
    dirs = sorted(p.name for p in Path(out).iterdir() if p.is_dir())
    assert dirs == ["rec_type=60", "rec_type=61"]
    got = spark.read.text(out).count()
    assert got == 50


def test_max_records_per_file_bounds_files(spark, tmp_path):
    """K5 — maxRecordsPerFile is the reference's `cache` flush counter."""
    out = str(tmp_path / "out")
    batch = pipeline.route(_lines_df(spark, n=100)).coalesce(1)
    sinks.write_partitioned_text(
        batch, out, partition_cols=("rec_type",), max_records_per_file=10
    )
    files = [p for p in Path(out).rglob("*.txt") if p.is_file()]
    # 100 rows / 2 types / 10-per-file => ~5 files per type dir
    assert len(files) >= 10
    from pyspark.sql import SparkSession

    for f in files:
        assert sum(1 for _ in f.open()) <= 10


def test_dir_level_append(spark, tmp_path):
    """K2 — two writes into one dir accumulate (file-per-batch append)."""
    out = str(tmp_path / "out")
    b = pipeline.route(_lines_df(spark, 20))
    sinks.write_partitioned_text(b, out)
    sinks.write_partitioned_text(b, out)
    assert spark.read.text(out).count() == 40


def test_dual_write(spark, tmp_path):
    """K8 — one batch, two sinks, one computation."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    batch = pipeline.route(_lines_df(spark, 30))
    sinks.dual_write(
        batch,
        lambda df: sinks.write_partitioned_text(df, a),
        lambda df: sinks.write_partitioned_text(df, b),
    )
    ca = Counter(r.value for r in spark.read.text(a).collect())
    cb = Counter(r.value for r in spark.read.text(b).collect())
    assert ca == cb and sum(ca.values()) == 30


def test_concurrent_streaming_queries(spark, tmp_path):
    """W5 — the reference ran <=19 output ops per batch
    (spark.streaming.concurrentJobs); SS equivalent: N queries on one
    session, each with its own checkpoint."""
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "x.txt").write_text(
        "\n".join(f"6{i % 2}data{i}" for i in range(40)) + "\n"
    )
    stream = pipeline.route(sources.file_drop(spark, str(landing)))

    outs = []
    queries = []
    for i, prefix in enumerate(["60", "61"]):
        out = str(tmp_path / f"out{i}")
        outs.append(out)
        branch = stream.filter(F.col("rec_type") == prefix)

        def make_sink(path):
            return lambda batch, bid: batch.write.mode("append").parquet(path)

        queries.append(
            sinks.start_pipeline(
                branch,
                make_sink(out),
                str(tmp_path / f"ckpt{i}"),
                available_now=True,
                query_name=f"w5_{i}",
            )
        )
    for q in queries:
        q.awaitTermination(120)
    n0 = spark.read.parquet(outs[0]).count()
    n1 = spark.read.parquet(outs[1]).count()
    assert n0 == 20 and n1 == 20
