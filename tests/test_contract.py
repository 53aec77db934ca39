"""Driver-contract sanity: registry integrity + flagship smoke at sf0.001."""

from __future__ import annotations

import pytest


def test_registry_names_and_oracles():
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    assert 40 <= len(q) <= 50  # the driver certifies at most 50 entries
    assert set(o) <= set(q)
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in o.values())


def test_all_oracles_parse_in_duckdb():
    import duckdb

    import __spark_entry__ as E

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for name, sql in E.oracle_sql().items():
        con.execute("EXPLAIN " + sql)


def test_entry_flagship(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["dt", "nation", "n_events", "n_users", "sum_value_cents"]


def test_broadcast_join_plan_is_broadcast(spark):
    """J1's physical plan must be BroadcastHashJoin, not SortMergeJoin
    (reference broadcasts the dim map, src/StreamingSocketProcess.scala:112-120)."""
    from sparkstreamingflume_spark.plans import REGISTRY

    df = REGISTRY["q_broadcast_join"].build(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bench_queries_marked():
    from sparkstreamingflume_spark.plans import REGISTRY

    assert sum(1 for q in REGISTRY.values() if q.bench) >= 5


def test_scan_pruning_and_pushdown(spark):
    """Scale guardrails: Q1's scan must read only needed columns and push
    the shipdate filter; top-k must be TakeOrderedAndProject (no full
    sort); no Python eval nodes in any certified plan."""
    from sparkstreamingflume_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    plan = (
        REGISTRY["q_tpch_q1"].build(spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    scan = next(ln for ln in plan.split("\n") if "FileScan" in ln)
    assert "l_shipdate" in scan and "l_orderkey" not in scan  # pruned
    assert "DataFilters" in scan  # pushed

    topk = (
        REGISTRY["q_topk"].build(spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in topk

    for name in ("q_md5_mask", "q_dedup_minhash", "q_embed_topk"):
        p = (
            REGISTRY[name].build(spark, sf)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in p, f"{name} has a Python row path"


def test_dedup_candidates_verified_is_candidate_gated(spark):
    """The Jaccard verify stage must be gated by the LSH candidate set:
    the shingle postings are semi-joined to candidate doc_ids before the
    pair-generation self-join (VERDICT r2: the previous composition ran
    the inverted-index join corpus-wide)."""
    from sparkstreamingflume_spark.plans import REGISTRY

    plan = (
        REGISTRY["q_dedup_candidates_verified"]
        .build(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan, "postings are not candidate-gated"
    # The LSH candidate subtree is referenced 3x (doc gate x2, pair
    # intersect) — it must be MATERIALIZED once (persist), so every
    # reference reads the InMemoryRelation and the explode+minhash+band
    # subtree appears zero times outside the cache build.
    assert plan.count("InMemoryTableScan") >= 3, (
        "candidate frame is not materialized once and read 3x:\n" + plan
    )


def test_embed_cosine_pairs_have_no_allpairs_join(spark):
    """q_dedup_embed_cosine must generate pairs via the IVF-cell hash
    join, never the O(n²) all-pairs inequality join. The only
    nested-loop allowed is the Cross broadcast of the K centroids
    (linear in corpus); an Inner BNLJ means a vec_id<vec_id pair scan."""
    from sparkstreamingflume_spark.plans import REGISTRY

    plan = (
        REGISTRY["q_dedup_embed_cosine"]
        .build(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    for ln in plan.split("\n"):
        if "BroadcastNestedLoopJoin" in ln:
            assert "Cross" in ln and "Inner" not in ln, f"all-pairs join: {ln.strip()}"
    assert "CartesianProduct" not in plan


def test_salted_join_rejects_right_outer():
    import pytest as _pytest

    from sparkstreamingflume_spark.functions.skew import salted_join

    with _pytest.raises(ValueError):
        salted_join(None, None, "k", how="right")  # guard fires pre-join


def test_salted_agg_count_star_semantics_with_nulls(spark):
    """salted_agg's 'count' must be count(*): NULLs in the counted
    column (and even a NULL group key) still count as rows, exactly like
    the direct groupBy().count() it claims row-identity with."""
    from sparkstreamingflume_spark.functions.skew import salted_agg

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", None), (None, 5), ("b", None)],
        "k string, v int",
    )
    got = {
        r["k"]: (r["n"], r["sum_v"])
        for r in salted_agg(
            df, ["k"], {"n": ("v", "count"), "sum_v": ("v", "sum")}
        ).collect()
    }
    assert got == {"a": (3, 1), None: (1, 5), "b": (1, None)}


def test_connected_components_path_graph_convergence(spark):
    """Min-label propagation needs ~diameter rounds: a 12-node path
    converges to one cluster with enough rounds and RAISES (never
    returns wrong labels) when capped below the diameter."""
    import pytest as _pytest

    from sparkstreamingflume_spark.extensions.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    labels = {
        r.node: r.cluster_id
        for r in connected_components(edges, max_iter=15).collect()
    }
    assert labels == {i: 0 for i in range(12)}

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=3)


def test_gprs_pipeline_plan_stays_staged(spark):
    """Pin the stage_columns barrier's effect (functions/barrier.py):
    the 44-way split is computed once and md5 exactly 4 times per row —
    a Spark upgrade that lets CollapseProject/PushPredicateThroughNonJoin
    cross the barrier would re-expand to 44 md5s / per-field splits and
    must fail here."""
    from sparkstreamingflume_spark.plans import REGISTRY

    plan = (
        REGISTRY["q_gprs_pipeline"]
        .build(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("md5(") == 4, plan.count("md5(")
    assert plan.count("split(") == 1, plan.count("split(")


def test_line_family_splits_once_and_filter_stays_staged(spark):
    """Round-13 pin: the staged *_arr line ops evaluate the 44-way
    split exactly once per row (the line-based forms re-split per
    field reference — CSE skips subexpressions under CASE WHEN), and
    q_dirty_filter's anchored width predicate stays ABOVE the widen
    exchange (the bare filter was pushed below it onto the single
    narrow scan task, serializing synthesis+split: 5.3 -> 0.8 s med
    at sf0.1, functions/lines.py)."""
    from sparkstreamingflume_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    for name in (
        "q_project_44to10",
        "q_dirty_filter",
        "q_md5_mask",
        "q_md5_mask_multi",
        "q_field_drop",
        "q_field_extract",
    ):
        plan = (
            REGISTRY[name].build(spark, sf)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("split(") == 1, f"{name}: split re-expanded:\n{plan}"
        if name == "q_dirty_filter":
            # ADVICE r13 #2: reuse the loop's plan (not a second build)
            # and anchor on the FilterExec operator line ("Filter (" /
            # "*(n) Filter"), not a bare "Filter" that could match
            # PushedFilters in the scan description.
            filt = plan.find("Filter (")
            if filt < 0:
                filt = plan.find(") Filter")
            assert "Exchange" in plan and 0 <= filt < plan.index(
                "Exchange"
            ), (
                "q_dirty_filter's width filter was pushed below the "
                "widen exchange:\n" + plan
            )


def test_no_python_row_path_or_cartesian_anywhere(spark):
    """Global scale invariants over EVERY registered query (primaries and
    extras): no Python ROW path (BatchEvalPython = row-at-a-time pickled
    UDF) and no CartesianProduct in any physical plan. Arrow-vectorized
    Python nodes (ArrowEvalPython / FlatMapCoGroupsInPandas / MapInPandas
    — the guide-§4.2 batch path, used by the SRP signature arm, the
    diversity selection pass, and the multimodal featurizer) are
    explicitly allowed: the banned thing is per-row pickling, not Python.
    Broadcast nested loops are vetted per-query (see
    test_embed_cosine_pairs_have_no_allpairs_join); these two node types
    are never acceptable."""
    from sparkstreamingflume_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    for name, q in sorted(REGISTRY.items()):
        plan = (
            q.build(spark, sf)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan, f"{name} has a Python row path"
        assert "CartesianProduct" not in plan, f"{name} has a cartesian product"


def test_connected_components_fast_pointer_doubling(spark):
    """The pointer-doubling variant must converge in ~log2(diameter)
    rounds (max_iter=6 for an 11-edge path — the plain propagator needs
    12+) and agree with the plain variant on a mixed graph."""
    from sparkstreamingflume_spark.extensions.graph import (
        connected_components,
        connected_components_fast,
    )

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    labels = {
        r.node: r.cluster_id
        for r in connected_components_fast(path, max_iter=6).collect()
    }
    assert labels == {i: 0 for i in range(12)}

    # mixed graph: a path, a triangle, an isolated edge
    edges = [(i, i + 1) for i in range(20, 26)] + [
        (1, 2), (2, 3), (3, 1), (40, 41),
    ]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {
        r.node: r.cluster_id
        for r in connected_components_fast(df, max_iter=8).collect()
    }
    slow = {
        r.node: r.cluster_id for r in connected_components(df, max_iter=30).collect()
    }
    assert fast == slow


def test_cluster_sort_bucketed_reconstructs_global_order(spark):
    """The range-bucketed O3 variant must (a) reconstruct q_cluster_sort's
    exact per-type global order via (bucket ASC, rn ASC), and (b) hash
    the window exchange on BOTH (rec_type, bucket) so sort parallelism
    exceeds |rec_types|."""
    from sparkstreamingflume_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    bucketed = REGISTRY["q_cluster_sort_bucketed"].build(spark, sf)

    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(rec_type" in plan and "bucket" in plan.split(
        "hashpartitioning(rec_type", 1
    )[1].split(")")[0], plan

    rows = bucketed.collect()
    n_buckets = len({r.bucket for r in rows})
    assert n_buckets > 1  # parallelism genuinely exceeds |rec_types|

    # concatenating buckets in order == the single-window global order
    by_type_bucketed: dict = {}
    for r in sorted(rows, key=lambda r: (r.rec_type, r.bucket, r.rn)):
        by_type_bucketed.setdefault(r.rec_type, []).append(r.line)
    glob = REGISTRY["q_cluster_sort"].build(spark, sf).collect()
    by_type_global: dict = {}
    for r in sorted(glob, key=lambda r: (r.rec_type, r.rn)):
        by_type_global.setdefault(r.rec_type, []).append(r.line)
    assert by_type_bucketed == by_type_global


def test_widen_if_narrow_is_noop_when_already_wide(spark):
    """widen_if_narrow must add an exchange ONLY for pathologically
    narrow scans (single-row-group fixture files); a frame already at
    least half the cluster width passes through IDENTICAL — at 100 TB
    (row group per ~128 MB) the widen must never add a shuffle."""
    from sparkstreamingflume_spark.session import widen_if_narrow

    narrow = spark.range(1000).coalesce(1)
    widened = widen_if_narrow(narrow)
    assert widened.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert widened.count() == 1000

    wide = spark.range(1000).repartition(spark.sparkContext.defaultParallelism)
    assert widen_if_narrow(wide) is wide  # no-op: same object, no new plan node


@pytest.mark.parametrize(
    "name", ["q_dedup_ngram_jaccard", "q_dedup_containment"]
)
def test_inverted_index_self_join_reuses_exchange(spark, name):
    """The window-based df>1 prune leaves the posting frame
    hash-partitioned by shingle, and the merge-hinted self-join must then
    REUSE that one exchange for both sides — the explode+md5 subtree runs
    once, not per join side (the agg+join-back form re-ran it 6x;
    commit history measured 2x end-to-end). AQE only materializes
    ReusedExchange in the FINAL adaptive plan, so execute first."""
    from sparkstreamingflume_spark.plans import REGISTRY

    df = REGISTRY[name].build(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 1, (
        f"{name}: self-join sides no longer share the shingle exchange:\n" + plan
    )


def test_sample_per_group_is_partition_bounded_topk(spark):
    """q_sample_per_group must be the per-partition top-K + merge form,
    not one row_number window over source: with few huge sources at
    100 TB the single-window form sorts each source in ONE task. The
    plan must show TWO Window nodes, the first partitioned by
    (spark_partition_id, source) — its sort is bounded by an input
    split — and the result must equal the naive single-window form
    (hash-rank is placement-invariant, so the two are semantically
    identical on any partitioning)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.plans.extension_queries import (
        SAMPLE_K_PER_GROUP,
        _docs,
    )

    df = REGISTRY["q_sample_per_group"].build(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2, "missing two-stage window plan:\n" + plan
    assert "SPARK_PARTITION_ID" in plan.upper(), (
        "stage-1 window no longer bounded per input partition:\n" + plan
    )

    from sparkstreamingflume_spark.functions.text import h32

    naive_w = Window.partitionBy("source").orderBy(
        h32(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    naive = (
        _docs(spark, "/root/testdata/sf0.001")
        .select("doc_id", "source", "lang")
        .withColumn("rn", F.row_number().over(naive_w).cast("long"))
        .filter(F.col("rn") <= SAMPLE_K_PER_GROUP)
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, naive.collect()))


def test_runtime_bloom_filter_prunes_when_broadcast_impossible(spark):
    """100 TB posture: a selective dim-side filter must reach the fact
    scan even when the dim side exceeds every broadcast threshold — at
    cluster scale that is Spark's runtime bloom-filter join pruning
    (spark.sql.optimizer.runtime.bloomFilter.enabled, on in the engine
    session). At fixture scale broadcast handles it (and wins), so this
    test disables broadcast at RUNTIME to simulate the too-big dim and
    asserts the optimizer injects a BloomFilter aggregate + might_contain
    probe instead of shipping the full fact table through the join."""
    from pyspark.sql import functions as F

    from sparkstreamingflume_spark.session import load_table

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        sf = "/root/testdata/sf0.001"
        li = load_table(spark, sf, "lineitem")
        o = load_table(spark, sf, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString().lower()
        assert "bloomfilter" in plan or "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_merge_upsert_is_broadcast_merge_decomposition(spark):
    """q_merge_upsert must stay the broadcast-merge form: Spark rejects
    broadcast for FULL OUTER (the naive MERGE join), so the plan must
    contain NO full-outer SortMergeJoin — the update path broadcasts the
    change feed (snapshot never moves) and the insert path anti-joins
    against the key column only."""
    from sparkstreamingflume_spark.plans import REGISTRY

    df = REGISTRY["q_merge_upsert"].build(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan
    ops = {r["op"] for r in df.collect()}
    assert ops == {"keep", "update", "insert"}  # delete rows filtered out


def test_merge_upsert_broadcast_is_size_guarded(spark, monkeypatch):
    """The feed broadcast hint must DEGRADE, not force: when the events
    source behind the change feed exceeds the byte cap (simulated by a
    zeroed cap), the update join is built unhinted — AQE may still pick
    broadcast at runtime from the feed's actual size, but a driver-side
    build is no longer mandated — and results are identical either way."""
    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.plans import relational_queries as rq

    sf = "/root/testdata/sf0.001"

    def hint_count(df):
        return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")

    hinted_df = REGISTRY["q_merge_upsert"].build(spark, sf)
    n_hints_fixture = hint_count(hinted_df)
    hinted = {tuple(r) for r in hinted_df.collect()}

    monkeypatch.setattr(rq, "FEED_BROADCAST_MAX_SRC_BYTES", 0)
    df = REGISTRY["q_merge_upsert"].build(spark, sf)
    # exactly the feed hint on the LEFT (update) join must be gone; the
    # remaining hints are the scalar shift crossJoins, single-row by
    # construction and always safe
    assert hint_count(df) == n_hints_fixture - 1, (
        df._jdf.queryExecution().analyzed().toString()
    )
    unhinted = {tuple(r) for r in df.collect()}
    assert unhinted == hinted  # guard changes strategy, never semantics


def test_scd2_history_runs_on_one_exchange(spark):
    """q_scd2_history's scale contract: the lag window, the cumulative
    change-flag sum, the per-regime aggregate AND the interval-close
    lead window must all run on the ONE user_id hash partitioning —
    exactly one Exchange in the whole plan. A second exchange here
    means a Catalyst regression re-shuffling the aggregated regimes
    frame (or worse, the raw events) and the 100 TB claim in the
    docstring is void."""
    from sparkstreamingflume_spark.plans import REGISTRY

    df = REGISTRY["q_scd2_history"].build(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected exactly one exchange:\n{plan}"
    assert plan.count("Window") >= 3  # lag, cumsum, interval-close lead


def test_analytics_ops_plan_shapes(spark):
    """Plan pins for the round-7 analytics family. q_funnel must stay
    the single-shuffle Catalyst fold (one exchange, a higher-order
    `aggregate(` over the collected array, NO Window over raw events);
    q_event_transitions is one window exchange + one agg exchange;
    q_retention must broadcast the one-row-per-user cohort frame at
    fixture scale on top of its three agg exchanges (user_id min,
    partial-distinct, final rollup)."""
    from sparkstreamingflume_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"

    plan = (
        REGISTRY["q_funnel"].build(spark, sf)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "aggregate(" in plan and "Window" not in plan

    plan = (
        REGISTRY["q_event_transitions"].build(spark, sf)._jdf
        .queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan

    plan = (
        REGISTRY["q_retention"].build(spark, sf)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 3, plan
