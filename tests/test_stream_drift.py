"""Streaming drift monitor (streaming/drift.py).

Certification is STREAM == BATCH: feed the fixture's first date-half
through the shared HDR register callback, snapshot the reference, feed
the second half, and require drift_since to reproduce the certified
q_dist_drift output bit-for-bit (whose own correctness the DuckDB
oracle gate and tests/test_hdr_bloom_pins.py carry) — register
subtraction must isolate the second period exactly, under any batch
granularity and across compaction.
"""

from __future__ import annotations

from pyspark.sql import functions as F
import pytest

# Driver-budget profile (pytest.ini): stream-twin/soak/sweep file —
# excluded from the default selection, always run by tools/run_shards.sh.
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"


def _halves(spark):
    """The fixture rows of each date half, under exactly the batch
    query's filters and split rule (global date bounds of the filtered
    frame; first half = datediff(lo, d) * 2 <= datediff(lo, hi))."""
    from sparkstreamingflume_spark.session import load_table

    vals = (
        load_table(spark, SF, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .filter(F.floor(F.col("value") * 100).cast("long") >= 1)
        .withColumn("d", F.to_date("ts"))
    )
    bounds = vals.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    tagged = vals.crossJoin(F.broadcast(bounds)).withColumn(
        "first_half",
        F.datediff("d", "lo") * 2 <= F.datediff("hi", "lo"),
    )
    a = tagged.filter("first_half").drop("d", "lo", "hi", "first_half")
    b = tagged.filter("NOT first_half").drop("d", "lo", "hi", "first_half")
    return a, b


def _batch_output(spark):
    from sparkstreamingflume_spark.plans import REGISTRY

    return {
        r["event_type"]: (r["n_a"], r["n_b"], r["tv_ppm"])
        for r in REGISTRY["q_dist_drift"].build(spark, SF).collect()
    }


def _drift_output(spark, ix, ref):
    from sparkstreamingflume_spark.streaming.drift import drift_since

    return {
        r["g"]: (r["n_a"], r["n_b"], r["tv_ppm"])
        for r in drift_since(spark, str(ix), str(ref)).collect()
    }


def test_drift_since_reference_equals_batch(spark, tmp_path):
    from sparkstreamingflume_spark.streaming.drift import (
        snapshot_reference,
    )
    from sparkstreamingflume_spark.streaming.quantile import (
        hdr_update_batch,
    )

    a, b = _halves(spark)
    ix, ref = tmp_path / "ix", tmp_path / "ref"
    hdr_update_batch(a, 0, str(ix))
    n_ref = snapshot_reference(spark, str(ix), str(ref))
    assert n_ref > 0
    hdr_update_batch(b, 1, str(ix))
    assert _drift_output(spark, ix, ref) == _batch_output(spark)


def test_drift_exact_under_batch_splits_and_compaction(spark, tmp_path):
    """Second period arrives in three batches with a compaction in the
    middle; register subtraction still isolates it exactly. Identical
    periods (reference snapshotted, nothing since) yield no row (n_b =
    0, the batch HAVING)."""
    from sparkstreamingflume_spark.streaming.drift import (
        snapshot_reference,
    )
    from sparkstreamingflume_spark.streaming.quantile import (
        compact_registers,
        hdr_update_batch,
    )

    a, b = _halves(spark)
    ix, ref = tmp_path / "ix", tmp_path / "ref"
    hdr_update_batch(a, 0, str(ix))
    snapshot_reference(spark, str(ix), str(ref))
    # nothing ingested since the snapshot => every group dropped
    assert _drift_output(spark, ix, ref) == {}
    bb = b.withColumn(
        "slice", F.col("event_id") % 3
    )
    hdr_update_batch(bb.filter("slice = 0").drop("slice"), 1, str(ix))
    stats = compact_registers(spark, str(ix))
    assert stats and stats["wm"] == 1
    hdr_update_batch(bb.filter("slice = 1").drop("slice"), 2, str(ix))
    hdr_update_batch(bb.filter("slice = 2").drop("slice"), 3, str(ix))
    assert _drift_output(spark, ix, ref) == _batch_output(spark)


def test_null_ts_events_split_the_consumers(spark, tmp_path):
    """Round-8 ADVICE pin: undated-but-valued events must count toward
    the QUANTILE reader (q_quantile_hdr admits ts IS NULL) but belong
    to NO drift period (q_dist_drift filters ts IS NOT NULL). Feed the
    second half with extra NULL-ts rows: drift_since must still equal
    the batch query bit-for-bit, while the live quantile registers
    carry exactly the extra rows."""
    from sparkstreamingflume_spark.streaming.drift import (
        snapshot_reference,
    )
    from sparkstreamingflume_spark.streaming.quantile import (
        hdr_update_batch,
        read_registers,
    )

    a, b = _halves(spark)
    ix, ref = tmp_path / "ix", tmp_path / "ref"
    hdr_update_batch(a, 0, str(ix))
    snapshot_reference(spark, str(ix), str(ref))
    # 7 valued-but-undated events: invisible to drift, visible to quantiles
    undated = (
        b.limit(7)
        .withColumn("ts", F.lit(None).cast("timestamp"))
        .withColumn("value", F.col("value") + 1.0)
    )
    hdr_update_batch(b.unionByName(undated), 1, str(ix))
    assert _drift_output(spark, ix, ref) == _batch_output(spark)
    total = (
        read_registers(spark, str(ix))
        .agg(F.sum("cnt"))
        .first()[0]
    )
    dated = (
        read_registers(spark, str(ix), dated_only=True)
        .agg(F.sum("cnt"))
        .first()[0]
    )
    assert total == dated + 7


def test_zero_drift_on_identical_distribution(spark, tmp_path):
    """Feeding the SAME rows again after the snapshot gives tv_ppm <=
    |buckets| (pure flooring residue, one ppm per bucket at most) for
    every group — the 'no drift' reading."""
    from sparkstreamingflume_spark.streaming.drift import (
        snapshot_reference,
    )
    from sparkstreamingflume_spark.streaming.quantile import (
        hdr_update_batch,
    )

    a, _ = _halves(spark)
    ix, ref = tmp_path / "ix", tmp_path / "ref"
    hdr_update_batch(a, 0, str(ix))
    snapshot_reference(spark, str(ix), str(ref))
    hdr_update_batch(a, 1, str(ix))  # identical second period
    got = _drift_output(spark, ix, ref)
    assert got
    for g, (n_a, n_b, tv) in got.items():
        assert n_a == n_b, g
        assert tv == 0, (g, tv)  # identical counts => identical ppm floors


def test_reader_falls_back_to_old_snapshot_mid_swap(spark, tmp_path):
    """round-9 ADVICE: a drift_since landing in snapshot_reference's
    one-rename-pair window (live ref dir absent, previous snapshot at
    <ref>.old) reads the .old snapshot — the previous blessed
    reference — instead of an empty frame; with NEITHER dir present it
    raises instead of silently returning no rows."""
    import os

    import pytest

    from sparkstreamingflume_spark.streaming.drift import (
        snapshot_reference,
    )
    from sparkstreamingflume_spark.streaming.quantile import (
        hdr_update_batch,
    )

    a, b = _halves(spark)
    ix, ref = tmp_path / "ix", tmp_path / "ref"
    hdr_update_batch(a, 0, str(ix))
    snapshot_reference(spark, str(ix), str(ref))
    hdr_update_batch(b, 1, str(ix))
    want = _drift_output(spark, ix, ref)
    # simulate the mid-swap window: live dir renamed aside, tmp not yet in
    os.rename(str(ref), str(ref) + ".old")
    assert _drift_output(spark, ix, ref) == want
    # neither dir: loud failure, not a silently empty monitoring result
    os.rename(str(ref) + ".old", str(tmp_path / "gone"))
    with pytest.raises(FileNotFoundError, match="drift reference missing"):
        _drift_output(spark, ix, ref)


def test_pre_upgrade_index_without_dated_column_stays_visible(
    spark, tmp_path
):
    """round-9 ADVICE migration pin: delta files written BEFORE the
    `dated` register dimension existed read as NULL dated and are
    coalesced to TRUE — quantile totals unchanged, drift keeps the
    pre-upgrade registers visible (conservative for a gate) instead of
    silently emptying; one compaction persists the migrated flag."""
    from sparkstreamingflume_spark.streaming.quantile import (
        compact_registers,
        hdr_update_batch,
        read_registers,
    )

    a, _ = _halves(spark)
    ix = tmp_path / "ix"
    hdr_update_batch(a, 0, str(ix))
    total = read_registers(spark, str(ix)).agg(F.sum("cnt")).first()[0]
    # rewrite the delta WITHOUT the dated column — a pre-upgrade index
    legacy = spark.read.parquet(str(ix / "delta")).drop("dated")
    legacy.coalesce(1).write.mode("overwrite").parquet(str(ix / "legacy"))
    import shutil

    shutil.rmtree(str(ix / "delta"))
    shutil.move(str(ix / "legacy"), str(ix / "delta"))
    assert (
        read_registers(spark, str(ix)).agg(F.sum("cnt")).first()[0] == total
    )
    dated = (
        read_registers(spark, str(ix), dated_only=True)
        .agg(F.sum("cnt"))
        .first()[0]
    )
    assert dated == total  # visible to drift, not silently dropped
    assert compact_registers(spark, str(ix))["rows_after"] > 0
    base = spark.read.parquet(str(ix / "base"))
    assert base.filter(F.col("dated").isNull()).count() == 0
    assert (
        read_registers(spark, str(ix), dated_only=True)
        .agg(F.sum("cnt"))
        .first()[0]
        == total
    )
