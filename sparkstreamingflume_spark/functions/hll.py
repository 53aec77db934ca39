"""Portable HyperLogLog register builders (Flajolet et al. 2007).

The repo already certifies TWO distinct-sketch forms whose sketch bytes
stay engine-internal (``q_approx_count_distinct`` — Spark HLL++;
``q_sketch_rollup`` — DataSketches HLL union), so their driver rows can
only certify a *tolerance verdict*. This module is the third form: a
register construction built from the cross-engine ``h32`` primitive so
Spark and DuckDB materialize **bit-identical registers** and therefore
bit-identical estimates — the sketch itself is oracle-certifiable, and
any engine that can md5 a string can consume or extend the registers
(the federated / multi-engine handoff the engine-internal forms cannot
do). The streaming twin (``streaming/hll.py``) maintains the same
registers across micro-batches by MAX-merge.

Construction (one shared recipe, every consumer imports it):

* ``h = h32('hll:' || key)`` — 32 uniform bits, salted so HLL buckets
  are independent of the MinHash / CMS / sampling uses of ``h32``.
* ``bucket = h % M`` (M = 256 registers), ``w = h >> 8`` — the
  remaining W_BITS = 24 bits.
* ``rho(w) = trailing_zeros(w) + 1`` (the PCSA/FM-85 geometric
  observable: P(rho >= k) = 2^-k for uniform w), computed as
  ``bit_count((w & -w) - 1) + 1`` — pure integer ops that exist in both
  engines, unlike leading-zero counts which would need log2/floats.
  ``w = 0`` (probability 2^-24) maps to the ceiling W_BITS + 1.
* register ``r_j = max(rho)`` over the bucket's keys — max is
  associative/commutative/idempotent, so registers are map-side
  combinable, mergeable across partitions, engines, and micro-batches,
  and replay-safe (a duplicate contribution is a no-op).
* estimate: the raw HLL harmonic mean alpha_M * M^2 / sum_j 2^-r_j,
  computed EXACTLY in integers by scaling each term by 2^(W_BITS+1):
  ``Z = sum_observed 2^(SHIFT - r_j) + n_zero_registers * 2^SHIFT`` is
  an exact BIGINT (no float summation-order drift), and the estimate is
  two integer divisions of literal constants — bit-identical across
  engines by construction, not by tolerance.

The raw estimator's valid regime is n >> 2.5*M (no linear-counting
small-range correction: that needs ln(), whose libm rounding differs
across engines — the certified fixtures sit safely in the raw regime,
and the batch query also emits the exact count so the error is
visible in the certified rows).

Scale posture: per group the state is at most M = 256 registers
regardless of key cardinality; the groupBy(group, bucket) shuffle is
map-side combinable onto <= |groups| * M keys per task. This is the
100 TB distinct-count shape: partial registers per partition/day are
data, any coarser rollup is a max-merge, history is never re-scanned.

Reference parity: the reference never maintained distinct-count
sketches (per-batch exact counters only); capability extension
(SURVEY.md §2 LLM-pipeline track).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from sparkstreamingflume_spark.functions.text import h32, h32_sql

HLL_M = 256  # registers (2^8 buckets): ~1.04/sqrt(M) = 6.5% std error
HLL_BUCKET_BITS = 8
HLL_W_BITS = 32 - HLL_BUCKET_BITS  # bits feeding rho
HLL_RHO_CEIL = HLL_W_BITS + 1  # rho of w == 0
HLL_SHIFT = HLL_W_BITS + 1  # term scale: 2^(SHIFT - r) is integral
# alpha_256 = 0.7213 / (1 + 1.079/256), in ppm — ONE literal shared by
# both dialects, so the engines cannot round it differently.
HLL_ALPHA_PPM = 718_273
# full numerator alpha_ppm * M^2 * 2^SHIFT of the scaled harmonic mean
HLL_ALPHA_NUM = HLL_ALPHA_PPM * HLL_M * HLL_M * (1 << HLL_SHIFT)


def hll_bucket_rho(key: Column) -> tuple[Column, Column]:
    """(bucket, rho) register coordinates of one key (Spark side)."""
    h = h32(F.concat(F.lit("hll:"), key))
    w = F.shiftright(h, HLL_BUCKET_BITS)
    rho = F.when(w == 0, F.lit(HLL_RHO_CEIL)).otherwise(
        F.bit_count((w.bitwiseAND(-w)) - 1) + 1
    )
    return (h % HLL_M).alias("bucket"), rho.cast("int").alias("rho")


def hll_bucket_rho_sql(key_expr: str) -> tuple[str, str]:
    """DuckDB twins of :func:`hll_bucket_rho` (bucket_sql, rho_sql)."""
    h = h32_sql(f"'hll:' || {key_expr}")
    w = f"({h} >> {HLL_BUCKET_BITS})"
    rho = (
        f"CASE WHEN {w} = 0 THEN {HLL_RHO_CEIL} "
        f"ELSE bit_count(({w} & (-{w})) - 1) + 1 END"
    )
    return f"({h} % {HLL_M})", rho


# The estimate from a folded register frame. Both emitters take a frame
# of (group..., bucket, r) MAX-folded registers and produce the exact
# integer Z and estimate; zero-valued (never-touched) registers enter as
# (M - count(*)) * 2^SHIFT without being materialized.

EST_SQL = f"CAST(({HLL_ALPHA_NUM} // z) // 1000000 AS BIGINT)"

Z_SQL = (
    f"CAST(sum(1::BIGINT << ({HLL_SHIFT} - r)) AS BIGINT)"
    f" + ({HLL_M} - count(*)) * (1::BIGINT << {HLL_SHIFT})"
)


def hll_z() -> Column:
    """Aggregate Column: exact scaled harmonic-mean denominator Z over a
    grouped register frame with column ``r`` (Spark side)."""
    return (
        F.expr(f"sum(shiftleft(CAST(1 AS BIGINT), {HLL_SHIFT} - r))")
        + (HLL_M - F.count("*")) * F.lit(1 << HLL_SHIFT).cast("long")
    ).alias("z")


def hll_estimate(z: Column) -> Column:
    """Exact integer estimate from Z (Spark side)."""
    return F.expr(f"CAST(({HLL_ALPHA_NUM} DIV z) DIV 1000000 AS BIGINT)")
