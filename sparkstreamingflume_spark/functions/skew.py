"""Skew-handling primitives: salted two-phase aggregation.

AQE's skew-join splitting handles joins; skewed AGGREGATION keys (one
routing prefix carrying most of the traffic — exactly the reference's
workload, where type-61 dwarfs the others) still funnel one reducer.
The fix is the classic salt → partial agg → de-salt final agg: the hot
key's rows spread over ``n_salts`` reducers in phase 1, and phase 2
combines ``n_salts`` partial rows per key — negligible.

Works for any algebraic aggregate (count/sum/min/max); result is
IDENTICAL to the direct groupBy (certified by q_count_by_type_salted
against the plain-groupBy oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a synthetic salt key.

    ``aggs`` maps output column -> (input expr, fn) with fn in
    {count, sum, min, max}; count is re-combined with sum in phase 2.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(expr) if fn == "count" else getattr(F, fn)(expr)).alias(out)
            for out, (expr, fn) in aggs.items()
        ]
    )
    combine = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    phase2 = phase1.groupBy(*keys).agg(
        *[
            getattr(F, combine[fn])(out).alias(out)
            for out, (expr, fn) in aggs.items()
        ]
    )
    return phase2
