"""Approximate aggregates: estimates must track the exact answers.

The approx queries have no DuckDB oracle (sketches are engine-specific),
so their accuracy contract lives here instead: HLL++ within 5% of exact
distinct counts, approx_percentile within 1% of exact percentiles.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_tracks_exact(spark):
    from sparkstreamingflume_spark.plans import REGISTRY

    approx = {
        r["event_type"]: r["n_users_approx"]
        for r in REGISTRY["q_approx_count_distinct"].build(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in REGISTRY["q_count_distinct"].build(spark, SF).collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), (k, est, exact[k])


def test_approx_percentile_tracks_exact(spark):
    from sparkstreamingflume_spark.plans import REGISTRY

    approx = {
        r["l_returnflag"]: r["p_approx"]
        for r in REGISTRY["q_approx_percentile"].build(spark, SF).collect()
    }
    exact = {
        r["l_returnflag"]: (r["p50_cents"] / 100.0, r["p95_cents"] / 100.0)
        for r in REGISTRY["q_percentile"].build(spark, SF).collect()
    }
    assert set(approx) == set(exact)
    for k, (a50, a95) in approx.items():
        e50, e95 = exact[k]
        assert abs(a50 - e50) <= 0.01 * e50, (k, a50, e50)
        assert abs(a95 - e95) <= 0.01 * e95, (k, a95, e95)


def test_ivf_cosine_pairs_recall_vs_bruteforce(spark):
    """The IVF-cell-gated pair query trades recall for a K-fold cost cut;
    this pins the trade: its pairs are a strict subset of the exact
    all-pairs result, with recall bounded below. (The synthetic
    embeddings are near-random — max cosine ~0.49 — so the fixture bound
    is loose; real near-dup pairs at cos>=0.9 share a nearest centroid
    almost surely.)"""
    from sparkstreamingflume_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    ivf = {
        (r.vec_a, r.vec_b)
        for r in REGISTRY["q_dedup_embed_cosine"].build(spark, sf).collect()
    }
    bf = {
        (r.vec_a, r.vec_b)
        for r in REGISTRY["q_dedup_embed_cosine_bruteforce"].build(spark, sf).collect()
    }
    assert ivf <= bf
    assert len(bf) > 0
    assert len(ivf) / len(bf) >= 0.2, (len(ivf), len(bf))


def test_asof_join_plan_is_single_window_no_join(spark):
    """The as-of must be the union-merge form: no join operator at all,
    one window over one hash exchange on user_id."""
    from sparkstreamingflume_spark.plans import REGISTRY

    plan = (
        REGISTRY["q_asof_join"].build(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_plan_is_equi_join(spark):
    """The banded range join must hit an equi-join strategy, never a
    nested-loop/cartesian fallback."""
    from sparkstreamingflume_spark.plans import REGISTRY

    plan = (
        REGISTRY["q_range_join"].build(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_sketch_rollup_merge_tracks_exact(spark):
    """Two-level HLL (per-day partial sketches -> union) must track the
    exact distinct count within 5% AND equal the single-level sketch
    estimate exactly (union of partials loses nothing vs one pass —
    the property that makes stored partial sketches safe to re-merge)."""
    from pyspark.sql import functions as F

    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.session import load_table

    merged = {
        r["event_type"]: r["n_users_est"]
        for r in REGISTRY["q_sketch_rollup"].build(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in REGISTRY["q_count_distinct"].build(spark, SF).collect()
    }
    one_level = {
        r["event_type"]: r["est"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.expr(
                "CAST(hll_sketch_estimate(hll_sketch_agg(user_id)) AS BIGINT)"
            ).alias("est")
        )
        .collect()
    }
    assert set(merged) == set(exact)
    for k, est in merged.items():
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), (k, est, exact[k])
        assert est == one_level[k], (k, est, one_level[k])
