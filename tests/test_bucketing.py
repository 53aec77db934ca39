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
