"""Oracle gate for registry extras.

The driver certifies at most 50 ``queries()`` entries per round, so the
registry's ``extra=True`` queries (how-variants and strict subsets of
primary queries — see each decorator's doc) are excluded from the driver
window. This test keeps every one of them cross-engine-certified anyway:
same comparison as the driver (row count + sorted schema + type-tagged
order-insensitive value hash, oracle fetched through Arrow) at sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest

from sparkstreamingflume_spark.oracle import compare, duck_fetch, register_views
from sparkstreamingflume_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

EXTRAS = sorted(n for n, q in REGISTRY.items() if q.extra)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    register_views(con, SF_DIR)
    yield con
    con.close()


def test_extras_are_strict_subset_of_registry():
    assert len(EXTRAS) > 0
    assert len(EXTRAS) + sum(1 for q in REGISTRY.values() if not q.extra) == len(
        REGISTRY
    )


@pytest.mark.parametrize("name", EXTRAS)
def test_extra_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.build(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        # rows-only extras (engine-specific sketches); value bounds are
        # pinned by tests/test_approx.py
        assert len(srows) > 0
        return
    ocols, orows = duck_fetch(duck, q.oracle)
    problems = compare(sdf.columns, srows, ocols, orows)
    assert not problems, f"{name}: {problems}"
