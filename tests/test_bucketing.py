"""Bucketed co-located join: the 100 TB answer to the repeated big x big
orderkey join (q_join_bigbig re-shuffles both sides every run; bucketing
pays the shuffle once at write time, then every join on the bucket key is
exchange-free)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    sf = "/root/testdata/sf0.001"
    from sparkstreamingflume_spark.session import load_table

    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            load_table(spark, sf, name)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", str(wh / name))
            .saveAsTable(f"b_{name}")
        )
    yield
    for name in ("orders", "lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS b_{name}")


def test_bucketed_join_is_shuffle_free(spark, warehouse):
    # at fixture scale Catalyst would broadcast; disable so the test
    # exercises the co-located path a 100TB join would take
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("b_orders")
        li = spark.table("b_lineitem")
        joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: the join itself needs no Exchange on either scan side
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        n_exchanges = join_section.count("Exchange")
        assert n_exchanges == 0, f"bucketed join still shuffles:\n{plan}"
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_results_match_unbucketed(spark, warehouse):
    from sparkstreamingflume_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    o, li = spark.table("b_orders"), spark.table("b_lineitem")
    bucketed = dict(
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    uo, uli = load_table(spark, sf, "orders"), load_table(spark, sf, "lineitem")
    plain = dict(
        uo.join(uli, uo.o_orderkey == uli.l_orderkey)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    assert bucketed == plain


def test_centroid_bucketed_cell_join_is_shuffle_free(spark, tmp_path_factory):
    """q_dedup_embed_cosine's docstring claims the 100 TB layout buckets
    the corpus by centroid_id so each cell's pair join is
    partition-local — demonstrate it: with the (vector, centroid)
    frame written bucketed on centroid_id, the within-cell self-join
    (the query's own shape) plans with ZERO exchanges feeding the join,
    and produces exactly the rows the registry query produces."""
    from sparkstreamingflume_spark.plans import REGISTRY
    from sparkstreamingflume_spark.plans.extension_queries import (
        _cos_ppm,
        _emb_norm,
        q_embed_ivf,
    )

    sf = "/root/testdata/sf0.001"
    wh = tmp_path_factory.mktemp("cells_wh")
    e = _emb_norm(spark, sf)
    assign = q_embed_ivf(spark, sf).select("vec_id", "centroid_id")
    (
        e.join(assign, "vec_id")
        .write.mode("overwrite")
        .bucketBy(8, "centroid_id")
        .sortBy("centroid_id")
        .option("path", str(wh / "cells"))
        .saveAsTable("b_cells")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cells = spark.table("b_cells")
        a, b = cells.alias("a"), cells.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.centroid_id") == F.col("b.centroid_id"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                _cos_ppm().cast("long").alias("cos_ppm"),
            )
            .filter(F.col("cos_ppm") >= 350_000)
        )
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert plan.count("Exchange") == 0, f"cell join still shuffles:\n{plan}"
        assert "Bucketed: true" in plan

        got = sorted(tuple(r) for r in pairs.collect())
        want = sorted(
            tuple(r)
            for r in REGISTRY["q_dedup_embed_cosine"].build(spark, sf).collect()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_cells")


def test_partitioned_write_prunes_partitions_on_read(spark, tmp_path):
    """Date-partitioned layout (the K7/P13 sink shape) must turn a date
    filter into PARTITION pruning on read: the scan lists only matching
    dt= directories — at 100 TB this is the difference between reading
    one day and reading the lake."""
    from sparkstreamingflume_spark.session import load_table

    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.select(
        "event_id", "user_id", "value", F.date_format("ts", "yyyyMMdd").alias("dt")
    ).write.partitionBy("dt").parquet(out)

    back = spark.read.parquet(out)
    one_day = back.filter(F.col("dt") == "20240101")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.split("\n") if "FileScan" in ln)
    part_filters = scan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "dt" in part_filters and "20240101" in part_filters, scan
    # and the pruned read returns exactly that day's rows
    n_day = one_day.count()
    n_all = back.count()
    assert 0 < n_day < n_all
