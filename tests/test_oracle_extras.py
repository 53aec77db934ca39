"""Oracle gate for registry queries outside the driver window.

The driver certifies at most 50 ``queries()`` entries per round, and the
window ROTATES (plans/registry.py CERT_WINDOW), so in any given round
most registry queries are outside it. This test keeps every one of them
cross-engine-certified anyway: same comparison as the driver (row count
+ sorted schema + type-tagged order-insensitive value hash, oracle
fetched through Arrow) at sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest

from sparkstreamingflume_spark.oracle import compare, duck_fetch, register_views
from sparkstreamingflume_spark.plans import CERT_WINDOW, REGISTRY

# Driver-budget profile (pytest.ini): stream-twin/soak/sweep file —
# excluded from the default selection, always run by tools/run_shards.sh.
pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"

OUTSIDE_WINDOW = sorted(set(REGISTRY) - set(CERT_WINDOW))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    register_views(con, SF_DIR)
    yield con
    con.close()


def test_window_is_valid_and_covers_registry():
    from sparkstreamingflume_spark.plans import window_queries

    win = window_queries()  # raises on oversize/unknown names
    assert len(win) <= 50
    assert len(OUTSIDE_WINDOW) + len(win) == len(REGISTRY)
    # every window entry this round must be oracle-backed (50/50 green goal)
    assert all(q.oracle is not None for q in win.values())


@pytest.mark.parametrize("name", OUTSIDE_WINDOW)
def test_outside_window_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.build(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        # rows-only queries (engine-specific outputs); value bounds are
        # pinned by tests/test_approx.py
        assert len(srows) > 0
        return
    ocols, orows = duck_fetch(duck, q.oracle)
    problems = compare(sdf.columns, srows, ocols, orows)
    assert not problems, f"{name}: {problems}"
