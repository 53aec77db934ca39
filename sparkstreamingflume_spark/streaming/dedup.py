"""Streaming deduplication — the streaming twin of ``q_dedup_exact``.

A training-data ingest stream sees the same document again minutes apart
(re-crawls, retried uploads, at-least-once sources). Exact batch dedup
(``groupBy(md5(text))``) needs the whole corpus; the streaming form keeps
a bounded state store of recently-seen keys instead:

* ``dedup_stream`` — ``dropDuplicatesWithinWatermark``: emits the first
  arrival of each key, drops re-arrivals within the watermark horizon.
  State is one entry per distinct key seen inside the horizon, evicted
  as event time advances — bounded by (arrival rate x horizon), not by
  corpus size, which is what makes it viable on an unbounded 100 TB/day
  stream.

The reference never deduplicated (its sources were assumed exactly-once
file drops); this is a capability extension (SURVEY.md §2 LLM-pipeline
track).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    df: DataFrame,
    key: str = "content_hash",
    text_col: str = "text",
    ts_col: str = "ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """First-arrival-wins dedup on ``md5(text_col)`` within ``horizon``.

    ``df`` must be a streaming DataFrame with an event-time column
    ``ts_col``. The key column is added (so downstream sinks can
    partition or audit on it) and duplicates arriving within the
    watermark horizon are dropped; a duplicate arriving later than the
    horizon is treated as new (by design — horizon == dedup guarantee).
    """
    keyed = df.withColumn(key, F.md5(F.col(text_col)))
    return keyed.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark([key])
