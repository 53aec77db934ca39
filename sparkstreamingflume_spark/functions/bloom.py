"""Portable Bloom-filter builders (Bloom 1970) for join pruning.

Spark's own runtime row-level filters (``spark.sql.optimizer.
runtimeFilter.bloomFilter.enabled``) inject exactly this shape — build a
small bitmap over the selective side's join keys, evaluate membership as
a pure expression on the fact side before the shuffle — but the sketch
bytes are engine-internal, so a driver row could only certify "the join
result is right", not the filter itself. This module is the portable
twin: bit positions derive from the cross-engine ``h32`` primitive, the
bitmap is an agg of BIGINT words, and membership is integer bit math,
so Spark and DuckDB materialize bit-identical filters and identical
pass/false-positive counts — the filter's error rate becomes a
CERTIFIED value, the same discipline as the HLL / HDR register families.

Layout: ``BF_BITS`` bits packed 63 per BIGINT word (bit 63 never set —
avoids relying on cross-engine two's-complement shift overflow
semantics). ``BF_K`` positions per key, each an independently salted
``h32('bf<i>:' || key) % BF_BITS``. Build = groupBy(word) BIT_OR — one
combinable agg onto <= ceil(BF_BITS/63) rows regardless of key count,
then pivoted to a SINGLE dense row and broadcast: the probe side
evaluates all K bits as expressions against one array column — zero
shuffle, zero per-row join. No false negatives by construction (the
queries emit the ``n_missed`` invariant column to certify it); the
false-positive rate is ``(1 - e^(-K n / BF_BITS))^K``.

BF_BITS is deliberately small (2048) so fixture-scale runs EXHIBIT a
nonzero certified false-positive rate; at 100 TB you size BF_BITS to
the dim cardinality (the build stays one combinable agg; the broadcast
grows linearly in BF_BITS only).

Reference parity: the reference's only join is a broadcast hash join of
a small lookup (src/ProcessSums.scala); pre-join pruning of the fact
side is a capability extension (SURVEY.md §2 LLM-pipeline track).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from sparkstreamingflume_spark.functions.text import h32, h32_sql

BF_BITS = 2048
BF_K = 4
BF_WORD_BITS = 63
BF_WORDS = -(-BF_BITS // BF_WORD_BITS)  # ceil: 33


def bloom_positions(key: Column) -> list[Column]:
    """The BF_K bit positions of one key (Spark side; key cast to
    string by the caller so both dialects hash identical bytes)."""
    return [
        (h32(F.concat(F.lit(f"bf{i}:"), key)) % BF_BITS).alias(f"pos{i}")
        for i in range(BF_K)
    ]


def bloom_positions_sql(key_expr: str) -> list[str]:
    """DuckDB twins of :func:`bloom_positions`."""
    out = []
    for i in range(BF_K):
        salted = h32_sql(f"'bf{i}:' || {key_expr}")
        out.append(f"({salted} % {BF_BITS})")
    return out


def bloom_member(bf_expr: str, pos_expr: str) -> Column:
    """Membership test of one position against the dense word array
    (Spark side; ``bf_expr`` names the broadcast array<long> column of
    BF_WORDS words). Emitted via ``F.expr`` because a variable shift
    amount is SQL-only surface (``F.shiftleft`` takes a literal)."""
    mask = f"shiftleft(CAST(1 AS BIGINT), {pos_expr} % {BF_WORD_BITS})"
    word = (
        f"element_at({bf_expr}, "
        f"CAST({pos_expr} DIV {BF_WORD_BITS} AS INT) + 1)"
    )
    return F.expr(f"(({word} & {mask}) = {mask})")


def bloom_member_sql(bf_expr: str, pos_expr: str) -> str:
    """DuckDB twin of :func:`bloom_member` (1-based list indexing)."""
    mask = f"(1::BIGINT << ({pos_expr} % {BF_WORD_BITS}))"
    word = f"{bf_expr}[CAST({pos_expr} // {BF_WORD_BITS} AS INT) + 1]"
    return f"(({word} & {mask}) = {mask})"


def bloom_py(keys: list[str]) -> list[int]:
    """Pure-Python reference filter (test pin): the dense BF_WORDS word
    list a correct build must produce for these (string) keys."""
    import hashlib

    words = [0] * BF_WORDS
    for k in keys:
        for i in range(BF_K):
            h = int(
                hashlib.md5(f"bf{i}:{k}".encode()).hexdigest()[:8], 16
            )
            pos = h % BF_BITS
            words[pos // BF_WORD_BITS] |= 1 << (pos % BF_WORD_BITS)
    return words
