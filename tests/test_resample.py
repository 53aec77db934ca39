"""Hand-computed semantic pin for the resample family.

The oracle certifies cross-engine agreement; this pins the SEMANTICS on
a corpus small enough to verify by hand: one user with two observations
three hours apart (plus an exactly-on-boundary observation for the
tie rule), checking the grid span, the LOCF step values and staleness,
the interpolated weighted means, and the no-extrapolation NULLs.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sparkstreamingflume_spark.plans import REGISTRY

HOUR_US = 3_600_000_000
T0 = dt.datetime(2024, 3, 1, 10, 0, 0)  # exactly on an hour boundary


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("resample")
    rows = [
        # (event_id, minutes after T0, value)
        (1, 0, 2.00),  # on-boundary observation at slot 10:00
        (2, 90, 8.00),  # 11:30
        (3, 180, 5.00),  # 13:00
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [T0 + dt.timedelta(minutes=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(out / "events.parquet"),
    )
    return str(out)


def test_locf_step_values_and_staleness(spark, corpus):
    rows = {
        r.slot_us: r
        for r in REGISTRY["q_resample_locf"].build(spark, corpus).collect()
    }
    base = int(T0.timestamp()) * 1_000_000
    # grid spans 10:00..13:00 inclusive -> 4 slots
    assert sorted(rows) == [base + i * HOUR_US for i in range(4)]
    # 10:00 carries the on-boundary observation itself (tie: us <= slot)
    assert (rows[base].value_cents, rows[base].staleness_us) == (200, 0)
    # 11:00 still carries obs#1 (obs#2 is at 11:30)
    assert (rows[base + HOUR_US].value_cents,
            rows[base + HOUR_US].staleness_us) == (200, HOUR_US)
    # 12:00 carries obs#2 from 11:30
    assert (rows[base + 2 * HOUR_US].value_cents,
            rows[base + 2 * HOUR_US].staleness_us) == (800, HOUR_US // 2)
    # 13:00 carries obs#3 exactly
    assert (rows[base + 3 * HOUR_US].value_cents,
            rows[base + 3 * HOUR_US].staleness_us) == (500, 0)


def test_interp_weighted_means(spark, corpus):
    rows = {
        r.slot_us: r
        for r in REGISTRY["q_resample_interp"].build(spark, corpus).collect()
    }
    base = int(T0.timestamp()) * 1_000_000
    # 10:00: exact observation -> its own value, span 0
    assert (rows[base].value_cents, rows[base].span_us) == (200, 0)
    # 11:00 sits 2/3 of the way from 10:00 (200c) to 11:30 (800c):
    # 200 + (800-200) * 60/90 = 600
    assert rows[base + HOUR_US].value_cents == 600
    assert rows[base + HOUR_US].span_us == 90 * 60 * 1_000_000
    # 12:00 sits 30/90 min between 11:30 (800c) and 13:00 (500c):
    # (800*60 + 500*30)/90 = 700
    assert rows[base + 2 * HOUR_US].value_cents == 700
    # 13:00: exact observation
    assert (rows[base + 3 * HOUR_US].value_cents,
            rows[base + 3 * HOUR_US].span_us) == (500, 0)


def test_no_extrapolation_outside_observed_range(spark, corpus, tmp_path):
    """A second user observed only late in the day: their grid starts at
    their own first observation (bounds are per-user), and a user whose
    observations all carry NULL value vanishes entirely."""
    ev = pq.read_table(f"{corpus}/events.parquet")
    extra = pa.table(
        {
            "event_id": pa.array([10, 11], pa.int64()),
            "ts": pa.array(
                [T0 + dt.timedelta(hours=5), T0 + dt.timedelta(hours=6)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([2, 3], pa.int64()),
            "event_type": pa.array(["view", "view"], pa.string()),
            "value": pa.array([1.0, None], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(
        pa.concat_tables([ev, extra]), str(tmp_path / "events.parquet")
    )
    got = REGISTRY["q_resample_locf"].build(spark, str(tmp_path)).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[2]) == 1  # single-observation span: one slot
    assert by_user[2][0].value_cents == 100
    assert 3 not in by_user  # NULL-value-only user: no observations
