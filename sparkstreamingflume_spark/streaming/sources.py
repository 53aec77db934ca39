"""Streaming sources + lookup-table loaders (SURVEY.md §2.1).

The reference ingested from Flume polling receivers
(src/StreamingFlumeProcess.scala:95) and raw TCP sockets
(src/StreamingSocketProcess.scala:124). ``spark-streaming-flume`` was
removed in Spark 3.x, so the supported Flume integration is a **file-drop
landing directory** (point a Flume file_roll/HDFS sink at it; S1) — a
replayable, offset-tracked source, strictly more fault-tolerant than the
receiver it replaces. The socket source (S2) is kept for dev/tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_drop(spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """S1 — Flume landing-dir source: unbounded text lines from a directory.

    Replaces FlumeUtils.createPollingStream (src/StreamingFlumeProcess.scala:95).
    ``maxFilesPerTrigger`` bounds micro-batch size like the reference's
    ``spark.streaming.maxBatchSize`` (src/StreamingFlumeProcess.scala:57).
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(landing_dir)


def socket(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S2 — TCP line source (src/StreamingSocketProcess.scala:124)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def rate(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Synthetic load source for soak/throughput tests."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


# ---------------------------------------------------------------------------
# Lookup-table loaders (S3/S4/S5) — the broadcast-join dim side
# ---------------------------------------------------------------------------


def _load_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S3 — side-file read (byte-reader readFromHDFS,
    src/StreamingSocketProcess.scala:35-44, becomes a distributed CSV scan)."""
    return spark.read.csv(path, sep="\t", header=False)


def load_lookup_yaxin(spark: SparkSession, path: str) -> DataFrame:
    """S4 — ``readFromHDFS11`` (src/StreamingSocketProcess.scala:46-59):
    keep 3-field lines, key = f0 + ',' + f1, value = f2.

    Returns (map_key, map_value); duplicate keys keep one arbitrary value
    (the reference's HashMap kept the last line read — §2.8; at-scale we
    make the dim unique explicitly so join cardinality is defined).
    """
    df = _load_tsv(spark, path)
    cols = df.columns
    if len(cols) < 3:
        raise ValueError(f"yaxin lookup needs >=3 TSV columns, got {cols}")
    three = df.filter(
        F.col(cols[0]).isNotNull()
        & F.col(cols[1]).isNotNull()
        & F.col(cols[2]).isNotNull()
    )
    return three.select(
        F.concat_ws(",", cols[0], cols[1]).alias("map_key"),
        F.col(cols[2]).alias("map_value"),
    ).dropDuplicates(["map_key"])


def load_lookup_yiyang(spark: SparkSession, path: str) -> DataFrame:
    """S5 — ``readFromHDFS22`` (src/StreamingSocketProcess.scala:61-74):
    key = f1 + ',' + f2, value = f5 (7-field guard as in
    src/ProcessSums.scala:68)."""
    df = _load_tsv(spark, path)
    cols = df.columns
    if len(cols) < 6:
        raise ValueError(f"yiyang lookup needs >=6 TSV columns, got {cols}")
    return (
        df.filter(F.col(cols[5]).isNotNull())
        .select(
            F.concat_ws(",", cols[1], cols[2]).alias("map_key"),
            F.col(cols[5]).alias("map_value"),
        )
        .dropDuplicates(["map_key"])
    )
