"""Portable log-linear histogram registers (HdrHistogram-style bucketing).

Fourth member of the portable-sketch family (``functions/hll.py`` —
distinct counts; ``functions/text.py`` CMS — frequencies; per-group
MinHash — set overlap): a VALUE-DISTRIBUTION sketch whose registers are
bit-identical across Spark and DuckDB, giving oracle-certifiable
quantile estimates and histogram distances. The engine-internal
alternatives (``percentile_approx`` / ``approx_quantile`` — certified as
tolerance verdicts by ``q_approx_aggs`` / ``q_approx_percentile``) keep
their sketch bytes (KLL/t-digest) private and ORDER-DEPENDENT, so two
engines — or two partitionings of the same engine — can disagree.
These registers cannot: the bucket of a value is a pure integer
function of the value, and the register is a COUNT, so the sketch is
sum-mergeable across partitions, days, engines and micro-batches
(streaming twin: ``streaming/quantile.py``), and a replayed
deterministic increment collapses exactly like the CMS twin's.

Bucketing (Gil Tene's HdrHistogram recipe, all integer arithmetic —
no log()/pow() whose libm rounding could differ across engines):

* values are non-negative BIGINTs (the caller scales, e.g. cents);
* ``v < 32``: one exact bucket per value — ``idx = v``, ``mid = v``;
* else with ``e = length(bin(v)) - 1`` (the exponent, via the binary
  string both engines render identically — no float log2) and
  ``s = e - 5``: the range ``[2^e, 2^(e+1))`` is covered by 32 linear
  sub-buckets of width ``2^s``; ``sub = v >> s`` in ``[32, 64)``,
  ``idx = 32*s + sub`` (monotone in v), ``mid = (sub << s) + 2^(s-1)``.

Relative quantile error is bounded by half a bucket width:
``2^(s-1) / 2^e = 1/64`` (~1.6%), independent of scale or
distribution. Register count is 32 + 32 per octave — <= ~2k live
registers for the full BIGINT range, so per-group state is tiny and
the groupBy(group, idx) build is map-side combinable: the 100 TB
percentile shape (partial registers per partition/day are data; any
rollup is a count-add; history is never re-sorted, unlike exact
percentiles whose global sort cannot pre-aggregate).

Rank rule shared by every consumer: the q-quantile of n values is the
``k = ceil(n * q_ppm / 1e6)``-th smallest, computed in exact integers
as ``(n * q_ppm + 999999) DIV 1000000``.

Reference parity: the reference never computed percentiles (per-batch
counters only); capability extension (SURVEY.md §2 LLM-pipeline track).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HDR_SUB_BITS = 5
HDR_LIN = 1 << HDR_SUB_BITS  # 32: values below this get exact buckets
# headline quantiles emitted by the batch query and the streaming twin
HDR_QUANTILES_PPM = (500_000, 950_000, 990_000)
HDR_Q_NAMES = {500_000: "p50", 950_000: "p95", 990_000: "p99"}


def _spark_sql(v: str) -> tuple[str, str]:
    """(idx, mid) Spark-SQL fragments over a BIGINT column name."""
    s = f"(length(bin({v})) - {HDR_SUB_BITS + 1})"
    idx = (
        f"CASE WHEN {v} < {HDR_LIN} THEN {v} "
        f"ELSE {HDR_LIN} * {s} + shiftright({v}, {s}) END"
    )
    mid = (
        f"CASE WHEN {v} < {HDR_LIN} THEN {v} "
        f"ELSE shiftleft(shiftright({v}, {s}), {s}) + "
        f"CASE WHEN {s} > 0 "
        f"THEN shiftleft(CAST(1 AS BIGINT), {s} - 1) ELSE 0 END END"
    )
    return idx, mid


def hdr_idx_mid(v: str) -> tuple[Column, Column]:
    """(idx, mid) bucket Columns over a non-negative BIGINT column name
    (Spark side)."""
    idx, mid = _spark_sql(v)
    return (
        F.expr(idx).cast("long").alias("idx"),
        F.expr(mid).cast("long").alias("mid"),
    )


def hdr_idx_mid_sql(v: str) -> tuple[str, str]:
    """DuckDB twins of :func:`hdr_idx_mid` (idx_sql, mid_sql)."""
    s = f"(length(bin({v})) - {HDR_SUB_BITS + 1})"
    idx = (
        f"CASE WHEN {v} < {HDR_LIN} THEN {v} "
        f"ELSE {HDR_LIN} * {s} + ({v} >> {s}) END"
    )
    mid = (
        f"CASE WHEN {v} < {HDR_LIN} THEN {v} "
        f"ELSE (({v} >> {s}) << {s}) + "
        f"CASE WHEN {s} > 0 THEN (1::BIGINT << ({s} - 1)) ELSE 0 END END"
    )
    return f"CAST({idx} AS BIGINT)", f"CAST({mid} AS BIGINT)"


def hdr_idx_mid_py(v: int) -> tuple[int, int]:
    """Pure-Python reference of the same bucketing (test pin — a
    mirrored bug in the two SQL dialects cannot also appear here)."""
    if v < HDR_LIN:
        return v, v
    s = v.bit_length() - 1 - HDR_SUB_BITS
    sub = v >> s
    return HDR_LIN * s + sub, (sub << s) + ((1 << s) >> 1)


# rank of the q-quantile among n values (1-based, ceil) — ONE formula
# shared by the Spark query, the DuckDB oracle, the streaming twin and
# the pure-Python pin, so the engines cannot round it differently.


def rank_expr(n: str, q_ppm: int) -> str:
    """Spark-SQL fragment: 1-based rank of the q-quantile among n."""
    return f"(({n}) * {q_ppm} + 999999) DIV 1000000"


def rank_sql(n: str, q_ppm: int) -> str:
    """DuckDB twin of :func:`rank_expr`."""
    return f"((({n}) * {q_ppm} + 999999) // 1000000)"


def rank_py(n: int, q_ppm: int) -> int:
    return (n * q_ppm + 999999) // 1000000


def hdr_registers(
    df: DataFrame,
    group_col: str,
    cents_col: str,
    extra_group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group, idx, mid, [extras...], cnt) register frame of a value
    frame — the ONE builder shared by the batch query
    (``q_quantile_hdr``) and the streaming twin's per-batch increment,
    so the certified batch plan and the stream maintain the same
    registers by construction.

    ``extra_group_cols`` adds low-cardinality register dimensions
    (e.g. the streaming index's ``dated`` flag, which lets ONE
    register stream serve both the quantile reader — sums over every
    dimension value — and the drift reader, which must mirror
    ``q_dist_drift``'s ``ts IS NOT NULL`` contract). The default keeps
    the certified batch layout bit-identical.

    One combinable groupBy: per group the register population is
    bounded by the bucket count (~2k for full BIGINT range) times the
    extra-dimension cardinality, not the row count.
    """
    idx, mid = hdr_idx_mid(cents_col)
    keys = ["g", "idx", "mid", *extra_group_cols]
    return (
        df.select(
            F.col(group_col).alias("g"), idx, mid, *extra_group_cols
        )
        .groupBy(*keys)
        .agg(F.count("*").alias("cnt"))
    )
