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
    # count means count(*): F.count(F.lit(1)) counts rows. F.count(expr)
    # would skip NULLs in expr and silently diverge from the plain
    # groupBy().count() the salted form must be row-identical to.
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(expr)).alias(out)
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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: replicate the dim side across ``n_salts``
    salt values and give every fact row a deterministic salt, so one hot
    join key spreads over ``n_salts`` reducers instead of funneling one.

    The classic alternative to AQE skew splitting when the skew is known
    up front (the reference's type-61 hot prefix) or when AQE's
    per-partition heuristics miss (one key inside one partition).
    Replication factor is n_salts x |dim| rows — only viable for dim
    sides far smaller than the fact (the same regime as a broadcast,
    but without needing the dim to fit in executor memory once
    replicated across the cluster). Result is row-identical to the
    direct join (certified by q_enrich_join_salted against the plain
    join oracle).
    """
    if how not in ("inner", "left"):
        # right/full would emit one row per unmatched dim REPLICA (n_salts
        # phantom rows per unmatched dim key) — not a real join result.
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    dim_rep = dim.withColumn("_salt", F.explode(salts))
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    joined = fact_s.join(dim_rep, on=[key, "_salt"], how=how)
    return joined.drop("_salt")
